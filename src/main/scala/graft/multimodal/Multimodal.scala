package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal column handling: opaque binary payloads + typed metadata.
  *
  * The corpus has no true media columns, so the binary payload is the
  * UTF-8 encoding of the text column — the Spark-side plumbing (binary
  * schema, partition-batched decode, typed output) is real; only the
  * codec is a stub.
  */
object Multimodal {

  /** Byte-level stats over the opaque binary column, rolled up per
    * source: payload sizes and content digests (sha2-256), the shape a
    * media-ingest QA pass computes before any decode.
    */
  def mmBinaryStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("source"),
        encode(col("text"), "UTF-8").as("payload"))
      .select(col("source"),
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("sha")).as("n_distinct_sha"),
        min(col("sha")).as("min_sha")
      )
      .orderBy("source")
  }

  /** Bytes per chunk for `mmChunk` — the fixed batch granularity a
    * frame-sampler / block decoder reads at.
    */
  private val ChunkBytes = 256

  /** Fixed-size chunking of the opaque payload with per-chunk digests —
    * the layout step before partition-batched decode: every payload
    * becomes ceil(bytes/256) chunk rows (id, offset, length, md5), so a
    * downstream decoder processes uniform work units regardless of
    * source-asset size.
    *
    * Scale shape: pure projection + generate (no shuffle, no state);
    * the explode fans out ROWS but each carries only its own 256-byte
    * slice, so a 100 TB media corpus streams through map tasks with
    * bounded memory. Skew-proof by construction — a 4 GB video and a
    * 4 KB image differ only in chunk-row count, and AQE-sized map
    * partitions split on row count.
    */
  /** Shared chunk generator for `mmChunk`/`mmFrameSample`: every
    * `stride`-th chunk index of each payload with its sample position,
    * offset, byte count, and digest — ONE definition of the chunk
    * geometry so the two oracle-checked queries can never desynchronize.
    * The `n_bytes > 0` guard makes the generate total: on an empty
    * payload the two-arg sequence(0, -1) silently generates a DESCENDING
    * [0, -1] (two bogus rows) and the three-arg stride form throws under
    * Spark's boundary check, where the oracle's range(0, 0) correctly
    * yields nothing — latent on the driver corpus (no empty documents),
    * found by review.
    */
  private def chunked(spark: SparkSession, dir: String, stride: Int): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n_bytes"))
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("text"), col("n_bytes"),
        posexplode(expr(
          s"""sequence(0, CAST((n_bytes + ${ChunkBytes - 1}) DIV $ChunkBytes AS INT) - 1,
             |  $stride)""".stripMargin))
          .as(Seq("pos", "chunk_id")))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("pos"),
        col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * ChunkBytes).cast("long").as("off"),
        least(lit(ChunkBytes.toLong), col("n_bytes") - col("chunk_id") * ChunkBytes)
          .as("chunk_bytes"),
        md5(expr(s"substring(text, chunk_id * $ChunkBytes + 1, $ChunkBytes)"))
          .as("chunk_md5"))

  def mmChunk(spark: SparkSession, dir: String): DataFrame =
    chunked(spark, dir, stride = 1)
      .select(col("doc_id"), col("chunk_id"), col("off"),
        col("chunk_bytes"), col("chunk_md5"))
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive (see Indexing.searchDoc)

  /** Every k-th chunk is a sampled "frame" for `mmFrameSample`. */
  private val FrameStride = 5

  /** Deterministic frame sampling over the chunked payload stream —
    * the "process every k-th frame" step a video/audio pipeline runs
    * before expensive per-frame decode (uniform temporal subsampling;
    * the real decoder then sees stride-spaced work units). Built on the
    * same shuffle-free generate as `mmChunk`: the stride filter is
    * applied to the generated chunk index BEFORE the payload slice is
    * computed, so skipped frames cost nothing — no digesting, no slice
    * materialization. Emits per sampled frame its index within the
    * sample (`frame_seq`) so a downstream batch decoder can reassemble
    * temporal order without a sort.
    */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    chunked(spark, dir, stride = FrameStride)
      .select(
        col("doc_id"),
        col("pos").as("frame_seq"),
        col("chunk_id"),
        col("off"),
        col("chunk_bytes").as("frame_bytes"),
        col("chunk_md5").as("frame_md5"))
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive
}

/** Typed record for a decoded media asset. */
case class MediaFeature(docId: Long, nBytes: Int, width: Int, height: Int,
                        checksum: Long)

/** Partition-batched decode pipeline.
  *
  * Real media decode (image resize, audio frame-sample) would run here
  * per-partition with a native library; the container has none, so
  * `decodeBatch` is a deterministic stand-in with the same signature
  * and batch shape a JNI/FFI codec would use. The Spark side — binary
  * column in, `Dataset[MediaFeature]` out, one codec instance per
  * partition, no driver collection — is the production plumbing.
  */
object DecodePipeline {

  /** Stub codec: one instance per partition (mirrors an expensive
    * native-codec init), deterministic pseudo-features from the bytes.
    */
  private[multimodal] final class StubCodec {
    def decode(id: Long, payload: Array[Byte]): MediaFeature = {
      // xor-fold checksum stands in for "decoded and inspected the bytes"
      var cs = 0L
      var i = 0
      while (i < payload.length) { cs = cs * 31 + (payload(i) & 0xff); i += 1 }
      MediaFeature(id, payload.length,
        width = 16 + (math.abs(cs) % 1024).toInt,
        height = 16 + (math.abs(cs / 1024) % 1024).toInt,
        checksum = cs)
    }
  }

  def run(spark: SparkSession, dir: String): Dataset[MediaFeature] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new StubCodec // init once per partition, as a real codec would
        it.map { case (id, payload) => codec.decode(id, payload) }
      }
  }
}
