package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal column handling: opaque binary payloads + typed metadata.
  *
  * The corpus has no true media columns, so payloads are synthesized as
  * a deterministic media CONTAINER — a 10-byte binary header (magic
  * `GRFT`, version, big-endian width/height, channels) over the UTF-8
  * body — and everything downstream treats them as opaque bytes, the
  * way a real ingest treats image/audio blobs. The decode paths
  * (`mmMeta` in-plan, `DecodePipeline` partition-batched) parse REAL
  * byte structure back out of that column; the only stand-in left is
  * the container format itself, since no media codec library ships in
  * this environment.
  */
object Multimodal {

  /** Header geometry of the GRFT container: magic(4) + version(1) +
    * width(2, big-endian) + height(2, big-endian) + channels(1).
    */
  private[multimodal] val HeaderBytes = 10

  /** Attach the synthesized container payload to a `(doc_id, text)`
    * frame: header fields derive from doc_id (so an independent oracle
    * can predict them without touching bytes), body is the UTF-8 text.
    * Built as one codegen'd projection — hex-assembled header unhexed
    * and concatenated with the body; binary `concat` is zero-copy per
    * row, no shuffle.
    */
  private[graft] def withContainer(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(
        unhex(concat(
          lit("47524654"), // "GRFT"
          lit("01"),
          lpad(hex(lit(16) + pmod(col("doc_id"), lit(1024))), 4, "0"),
          lpad(hex(lit(16) + pmod(expr("doc_id DIV 1024"), lit(1024))), 4, "0"),
          lpad(hex(lit(1) + pmod(col("doc_id"), lit(4))), 2, "0"))),
        encode(col("text"), "UTF-8")).as("payload"))

  /** Container-header decode as ONE declarative projection — the
    * metadata-extraction pass a media pipeline runs over every blob
    * before any expensive body decode: verify the magic, parse the
    * big-endian header fields, and digest the body slice. All native
    * codegen'd expressions (substring on binary + hex/conv), no UDF, no
    * shuffle — scan-bound at 100 TB. Total over malformed payloads: a
    * blob shorter than the header parses to zeroed fields with the
    * empty-body digest instead of throwing mid-scan (one poison blob
    * must not kill a corpus-wide pass); `magic_ok` = 0 flags it.
    *
    * The DuckDB oracle computes every field INDEPENDENTLY from the
    * source columns (doc_id arithmetic, md5 of the raw text) — it never
    * sees the container — so a byte-offset bug in this decode cannot
    * self-cancel against the encode side: the digest of a mis-sliced
    * body hashes differently.
    */
  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    mmMetaOf(withContainer(
      Tables.documents(spark, dir).select("doc_id", "text")))

  /** `mmMeta` over an arbitrary `(doc_id, payload binary)` frame. */
  def mmMetaOf(blobs: DataFrame): DataFrame = {
    def be(pos: Int, len: Int) =
      conv(hex(expr(s"substring(payload, $pos, $len)")), 16, 10).cast("long")
    val wellFormed = length(col("payload")) >= HeaderBytes
    blobs.select(
      col("doc_id"),
      (wellFormed &&
        decode(expr("substring(payload, 1, 4)"), "UTF-8") === "GRFT")
        .cast("int").as("magic_ok"),
      when(wellFormed, be(5, 1)).otherwise(0L).as("version"),
      when(wellFormed, be(6, 2)).otherwise(0L).as("width"),
      when(wellFormed, be(8, 2)).otherwise(0L).as("height"),
      when(wellFormed, be(10, 1)).otherwise(0L).as("channels"),
      when(wellFormed, (length(col("payload")) - HeaderBytes).cast("long"))
        .otherwise(0L).as("n_body_bytes"),
      when(wellFormed, md5(expr(s"substring(payload, ${HeaderBytes + 1}, 2147483647)")))
        .otherwise(md5(lit(Array.empty[Byte]))).as("body_md5"))
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive
  }

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
    chunkedDocs(Tables.documents(spark, dir), stride)

  /** `chunked` over an arbitrary `(doc_id, text)` frame — the form the
    * shift-resistance specs feed synthetic corpora through. */
  private[graft] def chunkedDocs(docs: DataFrame, stride: Int): DataFrame =
    docs
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

  /** Chunk-level STORAGE DEDUP per source — the blob-store estimate a
    * media ingest computes before committing bytes: payloads chunk at
    * the fixed [[ChunkBytes]] granularity (same generator as
    * `mmChunk`, so the geometry cannot desynchronize), identical
    * chunks — repeated assets, shared headers/trailers, stock frames —
    * are stored once, and the per-source `unique_ppm` is the ratio a
    * capacity planner reads. Content-addressed chunking is how real
    * blob stores dedup media at scale: the digest is the address, so
    * the dedup is a distinct over (digest, bytes) — one partial-agg
    * distinct + two source-keyed aggs, no pairwise comparison anywhere.
    */
  def mmChunkDedup(spark: SparkSession, dir: String): DataFrame =
    mmChunkDedupDocs(Tables.documents(spark, dir))

  /** The per-source content-addressed rollup shared by the fixed-grid
    * ([[mmChunkDedup]]) and content-defined ([[mmChunkCdcDedup]])
    * storage-dedup entries — one definition of the accounting so the
    * two chunkers' numbers are directly comparable.
    */
  private def chunkDedupRollup(chunks: DataFrame, docs: DataFrame): DataFrame = {
    val j = chunks.join(docs.select("doc_id", "source"), "doc_id")
    val totals = j.groupBy("source").agg(
      count(lit(1)).as("n_chunks"),
      sum(col("chunk_bytes")).as("total_bytes"))
    // chunk_md5 determines content and therefore chunk_bytes, so the
    // distinct over (source, md5, bytes) is one row per stored chunk
    val uniques = j.select("source", "chunk_md5", "chunk_bytes").distinct()
      .groupBy("source").agg(
        count(lit(1)).as("n_unique_chunks"),
        sum(col("chunk_bytes")).as("unique_bytes"))
    totals.join(uniques, "source")
      .select(col("source"), col("n_chunks"), col("n_unique_chunks"),
        col("total_bytes"), col("unique_bytes"),
        expr("CAST((1000000 * unique_bytes) DIV total_bytes AS BIGINT)")
          .as("unique_ppm"))
      .orderBy("source") // source-table-sized output: bounded sort
  }

  /** Chunk-level storage dedup over CONTENT-DEFINED chunks — the
    * measurement that justifies [[mmChunkCdc]] over the fixed grid:
    * under the fixed [[ChunkBytes]] offsets, a one-byte insertion
    * shifts every downstream chunk of the edited copy (all digests
    * change — `unique_ppm` reads as if the copy were brand-new bytes),
    * while content-defined boundaries realign after the edit, so the
    * shared tail dedups again (MultimodalSpec pins CDC's `unique_ppm`
    * strictly below the fixed grid's on a shifted-duplicate corpus).
    * Same rollup, same scale shape as [[mmChunkDedup]]: a map-side
    * generate of narrow digest rows, one partial-agg distinct, two
    * source-keyed aggs — no pairwise comparison anywhere.
    */
  def mmChunkCdcDedup(spark: SparkSession, dir: String): DataFrame =
    mmChunkCdcDedupDocs(Tables.documents(spark, dir))

  /** [[mmChunkCdcDedup]] over an arbitrary `(doc_id, text, source)`
    * frame. */
  private[graft] def mmChunkCdcDedupDocs(docs: DataFrame): DataFrame =
    chunkDedupRollup(
      cdcChunksOf(docs.sparkSession, docs)
        .select("doc_id", "chunk_bytes", "chunk_md5"),
      docs)

  /** [[mmChunkDedup]] over an arbitrary `(doc_id, text, source)`
    * frame. */
  private[graft] def mmChunkDedupDocs(docs: DataFrame): DataFrame =
    chunkDedupRollup(
      chunkedDocs(docs, stride = 1)
        .select("doc_id", "chunk_bytes", "chunk_md5"),
      docs)

  /** CDC rolling-window length (codepoints) and boundary mask bits —
    * expected chunk ≈ 2^[[CdcMaskBits]] = 64 codepoints — fine-grained
    * enough that the synthetic corpus (≤ ~560-char payloads) splits
    * into several chunks per document.
    */
  private val CdcWindow = 16
  private val CdcMaskBits = 6

  /** CONTENT-DEFINED chunking over the opaque payload column — the
    * dedup-grade chunker real blob stores use where [[mmChunk]]'s
    * fixed-offset grid fails: inserting one byte into a payload shifts
    * every downstream fixed chunk (all their digests change, storage
    * dedup sees a brand-new blob), while a content-defined boundary is
    * a pure function of its local `CdcWindow`-codepoint window (the
    * FastCDC gear test on the `rolling_fp` polynomial hash, sans
    * min/max clamps so the boundary set stays position-local and
    * SQL-recomputable), so an edit disturbs only the chunk(s) touching
    * it — MultimodalSpec pins exactly that shift-resistance. One
    * codegen'd expression emits each payload's boundary list; chunk
    * rows fan out from it with offsets, byte counts, and digests, the
    * same shuffle-free generate shape as [[mmChunk]].
    */
  def mmChunkCdc(spark: SparkSession, dir: String): DataFrame =
    cdcChunksOf(spark, Tables.documents(spark, dir))

  /** [[mmChunkCdc]] over an arbitrary `(doc_id, text)` frame — the form
    * the shift-resistance spec feeds edited payloads through.
    */
  private[graft] def cdcChunksOf(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    docs
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n_bytes"))
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("text"), col("n_bytes"),
        call_function("cdc_boundaries", col("text"),
          lit(CdcWindow), lit(CdcMaskBits)).as("cuts"))
      .select(col("doc_id"), col("text"),
        explode(expr(
          """zip_with(
            |  concat(array(CAST(0 AS BIGINT)), cuts),
            |  concat(cuts, array(n_bytes)),
            |  (s, e) -> struct(s AS s, e AS e))""".stripMargin)).as("seg"))
      .filter(col("seg.e") > col("seg.s")) // a cut at the very end leaves no tail
      .select(col("doc_id"),
        col("seg.s").as("off"),
        (col("seg.e") - col("seg.s")).as("chunk_bytes"),
        md5(expr("substring(text, CAST(seg.s + 1 AS INT), CAST(seg.e - seg.s AS INT))"))
          .as("chunk_md5"))
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive
  }

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

/** Typed record for a decoded media asset — one header parse + body
  * digest per blob, the fields `Multimodal.mmMetaOf` emits.
  */
case class MediaMeta(docId: Long, magicOk: Int, version: Long, width: Long,
                     height: Long, channels: Long, nBodyBytes: Long,
                     bodyMd5: String)

/** Partition-batched decode pipeline over the GRFT container column.
  *
  * This is the imperative-codec shape a real media pipeline uses when
  * the decoder is a native library (JNI/FFI image/audio codecs): binary
  * column in, typed `Dataset[MediaMeta]` out, ONE codec instance per
  * partition (expensive init amortized across the batch), no driver
  * collection. The codec here is a REAL byte-level parser — magic
  * check, big-endian header fields, body digest — spec-pinned
  * field-for-field against the declarative `Multimodal.mmMetaOf` twin,
  * which is in turn hash-checked against the DuckDB oracle. Only the
  * container FORMAT is synthetic (no media libraries ship in this
  * environment); the parsing is not.
  */
object DecodePipeline {

  /** GRFT container parser: one instance per partition — the MD5 digest
    * instance plays the expensive per-codec state (a real codec holds
    * decode buffers/contexts the same way). Total over malformed
    * payloads, with semantics identical to `mmMetaOf`'s expression
    * fallback: short blobs parse to zeroed fields + empty-body digest,
    * never an exception mid-partition.
    */
  private[multimodal] final class GrftCodec {
    private val md = java.security.MessageDigest.getInstance("MD5")
    private def hex(b: Array[Byte]): String =
      b.map("%02x".format(_)).mkString

    def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      if (payload.length < Multimodal.HeaderBytes) {
        MediaMeta(id, 0, 0L, 0L, 0L, 0L, 0L, hex(md.digest()))
      } else {
        val magicOk = payload(0) == 'G' && payload(1) == 'R' &&
          payload(2) == 'F' && payload(3) == 'T'
        def u8(i: Int): Long = payload(i) & 0xffL
        md.reset()
        md.update(payload, Multimodal.HeaderBytes,
          payload.length - Multimodal.HeaderBytes)
        MediaMeta(id,
          magicOk = if (magicOk) 1 else 0,
          version = u8(4),
          width = (u8(5) << 8) | u8(6),
          height = (u8(7) << 8) | u8(8),
          channels = u8(9),
          nBodyBytes = (payload.length - Multimodal.HeaderBytes).toLong,
          bodyMd5 = hex(md.digest()))
      }
    }
  }

  def run(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    Multimodal.withContainer(
      graft.core.Tables.documents(spark, dir).select("doc_id", "text"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new GrftCodec // init once per partition, as a real codec would
        it.map { case (id, payload) => codec.decode(id, payload) }
      }
  }
}
