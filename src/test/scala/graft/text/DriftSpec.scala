package graft.text

import graft.SparkSpec

/** The frozen-model drift gauge must stay quiet on a same-distribution
  * crawl and trip on a drifted one — the retrain-trigger contract.
  */
class DriftSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    val sql = spark.sqlContext
    import sql.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  test("quiet batch keeps drift_flag 0; OOV and new-language batches trip it") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-drift").toString + "/model"
    // build corpus: a stable vocabulary, every word frequent (no rare mass)
    val buildDocs = (1L to 30L).map { i =>
      (i, "en", "the cat sat on the mat with the dog and the bird today")
    }
    Drift.buildDriftModel(docsDf(buildDocs), base)
    // same-distribution crawl: the build distribution itself (the
    // 10%-relative fertility band is deliberately tight — on a
    // 12-word toy vocabulary even reordering word frequencies moves
    // fertility past it, which real corpora don't)
    val quiet = Drift.driftReport(docsDf(Seq(
      (100L, "en", "the cat sat on the mat with the dog and the bird today"))), base)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("oov_ppm"), r.getAs[Int]("drift_flag"))).toMap
    assert(quiet("en")._1 == 0L, s"unexpected OOV in quiet batch: $quiet")
    assert(quiet("en")._2 == 0, s"quiet batch tripped the flag: $quiet")
    // drifted crawl: vocabulary the frozen model has never seen
    val drifted = Drift.driftReport(docsDf(Seq(
      (101L, "en", "zorp quux blarg wibble frob nix gastropod xylem"))), base)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("oov_ppm"), r.getAs[Int]("drift_flag"))).toMap
    assert(drifted("en")._1 > 900000L)
    assert(drifted("en")._2 == 1, "OOV-saturated batch did not trip the flag")
    // a language with no committed baseline is drift by definition
    val newLang = Drift.driftReport(docsDf(Seq(
      (102L, "xx", "the cat sat on the mat"))), base)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("fert_base_ppm"), r.getAs[Int]("drift_flag"))).toMap
    assert(newLang("xx")._1 == -1L && newLang("xx")._2 == 1)
  }

  test("query entry reports every new-batch language once, gated split") {
    val df = Drift.modelDriftStats(spark, sf).collect()
    assert(df.nonEmpty)
    assert(df.map(_.getAs[String]("lang")).distinct.length == df.length)
    // the committed baseline exists for every language in this corpus
    df.foreach(r => assert(r.getAs[Long]("fert_base_ppm") > 0))
  }
}
