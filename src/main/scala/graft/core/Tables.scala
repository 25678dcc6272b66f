package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pruned loaders for the driver testdata tables.
  *
  * Every operator reads through these so that column pruning and filter
  * pushdown reach the parquet scan. Loaders take the scale-factor
  * directory so the same plan runs at sf0.001 → 100 TB unchanged.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = read(s, d, "lineitem")
  /** `events.ts` normalized to epoch-nanos LongType regardless of the
    * parquet physical type the generator chose for it. Observed variants:
    * nanosecond INT64 (rounds ≤7 testdata — read via `nanosAsLong`, passes
    * through), and `timestamp[us]` (round-8 regeneration — arrives as
    * TIMESTAMP/TIMESTAMP_NTZ and is converted with `unix_micros * 1000`,
    * exact because the session timezone is pinned to UTC). Downstream
    * operators always see epoch-ns Long, and the DuckDB oracles'
    * `epoch_ns(ts)` is type-agnostic, so both physical layouts hash-match.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(read(s, d, "events"))
  }

  /** Normalize a `ts` column to epoch-nanos Long (see [[events]]). Exposed
    * for specs that pin both physical-type paths.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType => df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case TimestampNTZType =>
        // UTC session tz (set by every Graft entry point) makes this cast
        // an exact naive-as-UTC reinterpretation, matching DuckDB epoch_ns.
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported physical type $other (expected INT64 ns, timestamp, or timestamp_ntz)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Register every table as a temp view so the whole surface is
    * reachable from plain `spark.sql` — the reference's API layer
    * speaks SQL against its store, and a Graft session (with
    * `GraftSparkExtensions`) resolves the native functions there too.
    */
  def registerViews(s: SparkSession, d: String): Unit = {
    region(s, d).createOrReplaceTempView("region")
    nation(s, d).createOrReplaceTempView("nation")
    customer(s, d).createOrReplaceTempView("customer")
    supplier(s, d).createOrReplaceTempView("supplier")
    part(s, d).createOrReplaceTempView("part")
    orders(s, d).createOrReplaceTempView("orders")
    lineitem(s, d).createOrReplaceTempView("lineitem")
    events(s, d).createOrReplaceTempView("events")
    documents(s, d).createOrReplaceTempView("documents")
    embeddings(s, d).createOrReplaceTempView("embeddings")
  }
}
