package graft.sim

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorIndexStreamSpec extends SparkSpec {

  test("vectorIndexAppend streams batches into the persisted index, replay-safe") {
    val sql = spark.sqlContext
    import sql.implicits._
    val emb = graft.core.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-stream").toString + "/idx"
    val cut = 400L
    VectorIndexStore.buildIvfPq(emb.filter(col("vec_id") < cut), base)
    val newRows = emb.filter(col("vec_id") >= cut).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").toArray)).toSeq
    val stream = MemoryStream[(Long, Array[Float])](spark)
    val query = graft.streaming.Streams.vectorIndexAppend(
      stream.toDS().toDF("vec_id", "embedding"), base)
    try {
      val (b1, b2) = newRows.splitAt(newRows.length / 2)
      stream.addData(b1)
      query.processAllAvailable()
      stream.addData(b2)
      query.processAllAvailable()
      // at-least-once replay of the first batch: appendIvfPq's own
      // per-table anti-join makes it a no-op
      stream.addData(b1)
      query.processAllAvailable()
    } finally query.stop()
    val idx = VectorIndexStore.loadIvfPq(spark, base)
    assert(idx.codes.count() == emb.count(), "every vector coded exactly once")
    // streamed-appended index answers EXACTLY like the frozen-quantizer
    // reference over the full corpus (same contract as batch appendIvfPq)
    val full = emb.withColumn("norm", Vectors.norm64("embedding"))
    val queries = emb.filter(col("vec_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val got = rows(VectorIndexStore.annIvfPqFromIndex(spark, base, emb, queries))
    val expected = rows(Similarity.ivfPqSearch(full, idx.centroids,
      Similarity.ivfMultiIndex(full, idx.centroids, assign = 2), idx.books,
      Similarity.pqEncode(full, idx.books), queries, excludeSelf = true,
      corpusN = idx.n))
    assert(got.nonEmpty && got == expected)
    // and neighbours from the streamed half actually surface
    val nids = VectorIndexStore.annIvfPqFromIndex(spark, base, emb, queries)
      .collect().map(_.getAs[Long]("n_id"))
    assert(nids.exists(_ >= cut))
  }
}
