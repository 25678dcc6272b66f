package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scan-width adaptivity for CPU-dense map work.
  *
  * A parquet scan's parallelism is capped by its physical layout:
  * Spark assigns one task per file split, and within a file the rows
  * of a row group are read entirely by the task owning its midpoint.
  * The driver's testdata ships each table as ONE file with ONE row
  * group, so every expression evaluated in a scan stage — shingle
  * explodes, md5 hashing, band packing, partial aggregation — runs on
  * a single core no matter how many the session has (measured: the
  * heavy_hitters CMS build spent 1.6 s of its 2.9 s wall on one task;
  * the cooccur_pmi pair generation 1.4 s, likewise single-task).
  *
  * [[spreadScan]] is the guide's input-skew remedy ("one huge
  * unsplittable file → repartition immediately after the read") made
  * scale-adaptive: it round-robin-repartitions to the session width
  * ONLY when the table's on-disk size proves the scan cannot reach
  * that width on its own (`bytes < maxPartitionBytes × width` means
  * even perfectly-split files yield fewer splits than cores). At
  * production scale the guard is false and the call is an exact
  * no-op — no added exchange, no corpus-sized shuffle. When it does
  * fire, the shuffled bytes are bounded by the guard itself:
  * width × maxPartitionBytes (a few GB on a big session), paid once,
  * against map CPU that is otherwise serialized onto one core.
  *
  * The repartition is deterministic under retry (round-robin sorts its
  * input first — `spark.sql.execution.sortBeforeRepartition`, default
  * on) and every consumer in this engine is value-identical under any
  * partitioning (the oracle gate re-checks that on every run).
  */
object Adaptive {

  /** On-disk bytes of `dir/name.parquet` (file or directory of parts);
    * -1 when the path cannot be stat'ed (the caller then leaves the
    * frame alone — never fail a query over a missing stat).
    */
  private def tableBytes(spark: SparkSession, dir: String, name: String): Long =
    try {
      val p = new Path(s"$dir/$name.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    } catch { case scala.util.control.NonFatal(_) => -1L }

  /** Spread a just-scanned `table` frame to session width iff its
    * physical layout cannot reach that width (see object doc). `df`
    * must be the frame as read from `dir` — the stat and the scan must
    * describe the same bytes (a caller-side name/path mismatch silently
    * stats the wrong file: the spread then either stays off or fires
    * bounded by the guard — never incorrect, only mistuned).
    *
    * Width proxy note: `numShufflePartitions` stands in for "session
    * width". On a cluster with the default 200 partitions and a small
    * table the spread fires at 200-way — bounded by the guard
    * (≤ maxPartitionBytes × 200 shuffled bytes, each partition under
    * one split) and still the right call: the table was too small to
    * occupy the cluster any other way.
    */
  def spreadScan(spark: SparkSession, df: DataFrame, dir: String,
      table: String): DataFrame = {
    val np = spark.sessionState.conf.numShufflePartitions
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val bytes = tableBytes(spark, dir, table)
    if (bytes < 0 || bytes >= maxSplit * np.toLong) df
    else df.repartition(np)
  }

  /** The one measured-broadcast row cap, shared by [[broadcastIfSmall]]
    * and the model-side gates that run their own count
    * (Relevance.lmScoreFrom) — tuning one site must move the other.
    * 2M narrow key→count rows is tens of MB framed: comfortably inside
    * executor broadcast budgets, far under the 8 GB/512M-row hard cap.
    * Callers must pass NARROW key-value frames (the row cap is a byte
    * cap only under that contract).
    */
  val BroadcastCapRows: Long = 2000000L

  /** Measured-size broadcast choice (the pagerank/Components idiom made
    * reusable): pin the frame, count it, and mark it for broadcast when
    * it fits — else return the pin for the planner's usual shuffle
    * join. For frames that are BOUNDED by construction (vocabulary
    * tables, duplicated-gram sets, model tables) the count is a cheap
    * job over the pinned blocks; callers whose frame is corpus-sized
    * must not use this.
    */
  def broadcastIfSmall(df: DataFrame, capRows: Long = BroadcastCapRows): DataFrame = {
    import Materialize.MatOps
    val pinned = df.materializeOnce(eager = true)
    if (pinned.count() <= capRows)
      org.apache.spark.sql.functions.broadcast(pinned)
    else pinned
  }
}
