package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("mm_binary_stats: payload bytes account for every document") {
    val rows = Multimodal.mmBinaryStats(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
    assert(rows.forall(r => r.getAs[Long]("n_distinct_sha") <= r.getAs[Long]("n_docs")))
    assert(rows.forall(_.getAs[String]("min_sha").matches("[0-9a-f]{64}")))
  }

  test("DecodePipeline (imperative codec) equals mm_meta (declarative decode) field-for-field") {
    val codec = DecodePipeline.run(spark, sf).collect()
      .map(m => m.docId ->
        ((m.magicOk, m.version, m.width, m.height, m.channels,
          m.nBodyBytes, m.bodyMd5))).toMap
    val plan = Multimodal.mmMeta(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("magic_ok"), r.getAs[Long]("version"),
          r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("channels"), r.getAs[Long]("n_body_bytes"),
          r.getAs[String]("body_md5")))).toMap
    assert(codec.size == 500 && codec == plan)
    // and the fields are real header parses, not constants
    assert(codec.values.map(_._3).toSet.size > 100) // widths vary with doc_id
    assert(codec.values.forall(_._1 == 1)) // well-formed magic everywhere
  }

  test("DecodePipeline body digest matches a local recompute of the raw text") {
    val f = DecodePipeline.run(spark, sf).collect().minBy(_.docId)
    val text = graft.core.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === f.docId)
      .collect().head.getAs[String]("text")
    val mdHex = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(f.bodyMd5 == mdHex)
    assert(f.nBodyBytes == text.getBytes("UTF-8").length.toLong)
    assert(f.width == 16 + f.docId % 1024)
    assert(f.height == 16 + (f.docId / 1024) % 1024)
    assert(f.channels == 1 + f.docId % 4)
  }

  test("both decode paths are total and identical on malformed payloads") {
    import org.apache.spark.sql.functions._
    val sql = spark.sqlContext
    import sql.implicits._
    // bad magic (full-length), truncated header, empty blob
    val blobs = Seq(
      (1L, "ZZZZ".getBytes("ISO-8859-1") ++
        Array[Byte](1, 0, 32, 0, 48, 2) ++ "body".getBytes("ISO-8859-1")),
      (2L, Array[Byte]('G', 'R', 'F')),
      (3L, Array.empty[Byte])
    ).toDF("doc_id", "payload")
    val plan = Multimodal.mmMetaOf(blobs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("magic_ok"), r.getAs[Long]("version"),
          r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("channels"), r.getAs[Long]("n_body_bytes"),
          r.getAs[String]("body_md5")))).toMap
    val codec = new DecodePipeline.GrftCodec
    val imp = blobs.collect().map { r =>
      val m = codec.decode(r.getAs[Long]("doc_id"), r.getAs[Array[Byte]]("payload"))
      m.docId -> ((m.magicOk, m.version, m.width, m.height, m.channels,
        m.nBodyBytes, m.bodyMd5))
    }.toMap
    assert(plan == imp)
    // the full-length bad-magic blob still parses its fields: version 1,
    // width 32, height 48, channels 2, body "body" (4 bytes)
    assert(plan(1L) == ((0, 1L, 32L, 48L, 2L, 4L,
      "841a2d689ad86bd1611447453c22c6fc")))
    // short blobs zero out with the empty digest
    assert(plan(2L) == ((0, 0L, 0L, 0L, 0L, 0L,
      "d41d8cd98f00b204e9800998ecf8427e")))
    assert(plan(3L) == plan(2L))
  }

  test("mm_chunk partitions every payload exactly, with verifiable digests") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val chunks = Multimodal.mmChunk(spark, sf).collect()
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk_id"))
      // chunk ids are 0..n-1, offsets stride 256, sizes sum to the payload
      assert(sorted.map(_.getAs[Long]("chunk_id")).toSeq ==
        (0L until sorted.length).toSeq)
      assert(sorted.map(_.getAs[Long]("chunk_bytes")).sum == docs(id).length.toLong)
      // digest of a middle chunk matches a local recompute
      val r = sorted(sorted.length / 2)
      val off = r.getAs[Long]("off").toInt
      val slice = docs(id).substring(off,
        math.min(off + 256, docs(id).length))
      val mdHex = java.security.MessageDigest.getInstance("MD5")
        .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("chunk_md5") == mdHex)
    }
  }

  test("mm_frame_sample is exactly every 5th chunk with sequential frame ids") {
    val chunks = Multimodal.mmChunk(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        (r.getAs[Long]("chunk_bytes"), r.getAs[String]("chunk_md5"))).toMap
    val frames = Multimodal.mmFrameSample(spark, sf).collect()
    frames.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk_id"))
      // sampled ids stride by 5 from 0; frame_seq renumbers them densely
      assert(sorted.map(_.getAs[Long]("chunk_id")).toSeq ==
        sorted.indices.map(_ * 5L))
      assert(sorted.map(_.getAs[Long]("frame_seq")).toSeq ==
        sorted.indices.map(_.toLong))
      // each sampled frame is bit-identical to the corresponding chunk
      sorted.foreach { f =>
        val (bytes, md5hex) = chunks((id, f.getAs[Long]("chunk_id")))
        assert(f.getAs[Long]("frame_bytes") == bytes)
        assert(f.getAs[String]("frame_md5") == md5hex)
      }
    }
    // every doc with any chunks contributes at least frame 0
    assert(frames.map(_.getAs[Long]("doc_id")).distinct.length ==
      chunks.keys.map(_._1).toSeq.distinct.length)
  }

  test("mm_chunk_dedup accounting reconciles against a driver recompute over the chunks") {
    val chunks = Multimodal.mmChunk(spark, sf).collect()
    val srcOf = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = chunks.groupBy(r => srcOf(r.getAs[Long]("doc_id")))
    val got = Multimodal.mmChunkDedup(spark, sf).collect()
    assert(got.nonEmpty && got.length == bySrc.size)
    got.foreach { r =>
      val cs = bySrc(r.getAs[String]("source"))
      val uniq = cs.map(c =>
        (c.getAs[String]("chunk_md5"), c.getAs[Long]("chunk_bytes"))).distinct
      assert(r.getAs[Long]("n_chunks") == cs.length.toLong)
      assert(r.getAs[Long]("n_unique_chunks") == uniq.length.toLong)
      assert(r.getAs[Long]("total_bytes") ==
        cs.map(_.getAs[Long]("chunk_bytes")).sum)
      assert(r.getAs[Long]("unique_bytes") == uniq.map(_._2).sum)
      assert(r.getAs[Long]("unique_ppm") ==
        1000000L * r.getAs[Long]("unique_bytes") / r.getAs[Long]("total_bytes"))
      assert(r.getAs[Long]("unique_bytes") <= r.getAs[Long]("total_bytes"))
    }
  }

  test("mm_chunk_cdc: chunks tile each payload; one inserted byte only disturbs chunks near the edit") {
    import org.apache.spark.sql.functions._
    val sqlc = spark.sqlContext
    import sqlc.implicits._
    val docs = graft.core.Tables.documents(spark, sf).select("doc_id", "text")
    // tiling: per doc, offsets + byte counts reconstruct the payload exactly
    val chunks = Multimodal.mmChunkCdc(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val lens = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").length.toLong)
      .toMap
    assert(chunks.keySet == lens.filter(_._2 > 0).keySet)
    chunks.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("off"))
      assert(sorted.head.getAs[Long]("off") == 0L)
      assert(sorted.map(_.getAs[Long]("chunk_bytes")).sum == lens(id))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(
          a.getAs[Long]("off") + a.getAs[Long]("chunk_bytes") == b.getAs[Long]("off"))
        case _ =>
      }
      assert(cs.forall(_.getAs[Long]("chunk_bytes") > 0))
    }
    // shift-resistance (the reason CDC exists): insert ONE character
    // mid-payload; every chunk digest outside the window-sized
    // neighbourhood of the edit must survive byte-for-byte — the fixed
    // grid (mm_chunk) instead rewrites every digest after the edit
    val victim = docs.orderBy(col("doc_id")).filter(length(col("text")) > 400)
      .head()
    val id = victim.getAs[Long]("doc_id")
    val text = victim.getAs[String]("text")
    val pos = text.length / 2
    val edited = text.substring(0, pos) + "!" + text.substring(pos)
    def digests(t: String): Set[String] =
      Multimodal.cdcChunksOf(spark, Seq((id, t)).toDF("doc_id", "text"))
        .collect().map(_.getAs[String]("chunk_md5")).toSet
    val before = digests(text)
    val after = digests(edited)
    val survived = (before intersect after).size
    // the edit can only disturb the chunk containing it (plus a
    // window-split neighbour); with ~1200/256 ≈ 5+ chunks, most survive
    assert(before.size >= 3, s"victim doc produced only ${before.size} chunks")
    assert(before.size - survived <= 2,
      s"CDC not shift-resistant: ${before.size - survived} of ${before.size} digests changed")
    // fixed-grid contrast (driver recompute): the same edit rewrites
    // EVERY fixed-offset digest at or after the insertion point
    def gridDigests(t: String): Set[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      t.grouped(256).map(c =>
        md.digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString).toSet
    }
    val fixedSurvived = (gridDigests(text) intersect gridDigests(edited)).size
    assert(fixedSurvived <= pos / 256 + 1,
      "fixed grid unexpectedly survived a mid-payload insert")
    assert(survived > fixedSurvived,
      "CDC chunking did not beat the fixed grid on shift-resistance")
  }

  test("mm_chunk_cdc_dedup beats the fixed grid on a shifted-duplicate corpus") {
    import org.apache.spark.sql.functions._
    val sqlc = spark.sqlContext
    import sqlc.implicits._
    // a store holding each asset twice: the original and a copy with ONE
    // byte inserted up front — the boilerplate-with-a-prefix shape real
    // media corpora carry. Long payloads so both chunkers emit many
    // chunks per doc.
    val base = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").limit(40).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .filter(_._2.length > 300)
    assert(base.length >= 10, "corpus slice too short for the dedup case")
    val corpus = (base.map { case (id, t) => (id, t, "store") } ++
      base.map { case (id, t) => (id + 100000L, "X" + t, "store") })
      .toSeq.toDF("doc_id", "text", "source")
    def uniquePpm(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("source") === "store").head().getAs[Long]("unique_ppm")
    val cdc = uniquePpm(Multimodal.mmChunkCdcDedupDocs(corpus))
    val fixed = uniquePpm(Multimodal.mmChunkDedupDocs(corpus))
    // the fixed grid sees the shifted copy as brand-new bytes (every
    // chunk digest moved); CDC boundaries realign after the edit, so
    // the shared tail stores once — strictly better dedup
    assert(cdc < fixed,
      s"CDC unique_ppm $cdc not below the fixed grid's $fixed on shifted duplicates")
    assert(fixed > 900000L, s"fixed grid unexpectedly deduped shifted copies: $fixed")
    assert(cdc < 700000L, s"CDC dedup weaker than expected: $cdc")
  }
}
