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
}
