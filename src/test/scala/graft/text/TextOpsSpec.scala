package graft.text

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  test("text_stats ratios are consistent integer ppm") {
    val rows = TextOps.textStats(spark, sf).collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val ppm = r.getAs[Long]("stop_ppm")
      ppm >= 0 && ppm <= 1000000 &&
        r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_tokens") &&
        r.getAs[Long]("ttr_ppm") ==
          1000000L * r.getAs[Long]("n_distinct") / r.getAs[Long]("n_tokens")
    })
  }

  test("lang_id picks the alphabetically-first language among ties") {
    val rows = TextOps.langId(spark, sf).collect()
    assert(rows.forall { r =>
      val scores = Map(
        "de" -> r.getAs[Long]("s_de"), "en" -> r.getAs[Long]("s_en"),
        "es" -> r.getAs[Long]("s_es"), "fr" -> r.getAs[Long]("s_fr"),
        "zh" -> r.getAs[Long]("s_zh"))
      val best = scores.values.max
      r.getAs[String]("pred_lang") ==
        scores.toSeq.filter(_._2 == best).map(_._1).min
    })
  }

  test("token_freq is capped at 100 with deterministic ranking") {
    val rows = TextOps.tokenFreq(spark, sf).collect()
    assert(rows.length <= 100)
    val sorted = rows.sortBy(_.getAs[Long]("rk"))
    val counts = sorted.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }
}
