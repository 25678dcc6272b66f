package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("mm_binary_stats: payload bytes account for every document") {
    val rows = Multimodal.mmBinaryStats(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
    assert(rows.forall(r => r.getAs[Long]("n_distinct_sha") <= r.getAs[Long]("n_docs")))
    assert(rows.forall(_.getAs[String]("min_sha").matches("[0-9a-f]{64}")))
  }

  test("DecodePipeline decodes every payload with deterministic features") {
    val feats = DecodePipeline.run(spark, sf).collect()
    assert(feats.length == 500)
    assert(feats.forall(f => f.width >= 16 && f.height >= 16))
    // deterministic: re-running yields identical features
    val again = DecodePipeline.run(spark, sf).collect()
    assert(feats.sortBy(_.docId).sameElements(again.sortBy(_.docId)))
  }

  test("DecodePipeline checksum matches a local recompute") {
    val f = DecodePipeline.run(spark, sf).collect().minBy(_.docId)
    val text = graft.core.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === f.docId)
      .collect().head.getAs[String]("text")
    var cs = 0L
    text.getBytes("UTF-8").foreach(b => cs = cs * 31 + (b & 0xff))
    assert(f.checksum == cs && f.nBytes == text.getBytes("UTF-8").length)
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
}
