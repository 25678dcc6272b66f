package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelevanceSpec extends SparkSpec {

  test("tfidf_topk keeps at most 3 ranked terms per doc, scores descending") {
    val rows = Relevance.tfidfTopK(spark, sf).collect()
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.nonEmpty)
    perDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.length <= 3)
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length).toSeq)
      // ranked by score desc, token asc on ties
      val keys = sorted.map(r => (-r.getAs[Long]("score"), r.getAs[String]("token")))
      assert(keys.toSeq == keys.sortBy(identity).toSeq)
    }
  }

  test("tfidf_topk score agrees with a direct tf/df recomputation") {
    val docs = graft.core.Tables.documents(spark, sf)
    val n = docs.count()
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val tfMap = tf.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val dfMap = tf.distinct.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    Relevance.tfidfTopK(spark, sf).collect().foreach { r =>
      val (d, t) = (r.getAs[Long]("doc_id"), r.getAs[String]("token"))
      assert(r.getAs[Long]("tf") == tfMap((d, t)))
      assert(r.getAs[Long]("df") == dfMap(t))
      assert(r.getAs[Long]("score") ==
        tfMap((d, t)) * ((1000000L * n) / dfMap(t)))
    }
  }

  test("bm25_rank returns a ranked top-20 with scores in descending order") {
    val rows = Relevance.bm25Rank(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to 20L).toSeq)
    val scores = rows.map(_.getAs[Double]("score6")).toSeq
    assert(scores == scores.sorted.reverse)
    // every score is a finite positive number (query terms exist in corpus)
    assert(scores.forall(s => !s.isNaN && s > 0))
  }

  test("bm25_rank matches a driver-side recomputation on the top doc") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("l")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum.toDouble / n
    val dfs = Relevance.QueryTerms.map(t => t -> docs.count(_._2.contains(t))).toMap
    def score(l: Seq[String]): Double = {
      val dl = l.length.toDouble
      Relevance.QueryTerms.map { t =>
        val tf = l.count(_ == t).toDouble
        val idf = (n - dfs(t) + 0.5) / (dfs(t) + 0.5)
        idf * (tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
      }.sum
    }
    val expectTop = docs.map { case (id, l) => (id, score(l)) }
      .sortBy { case (id, s) => (-s, id) }.head
    val got = Relevance.bm25Rank(spark, sf).collect().head
    assert(got.getAs[Long]("doc_id") == expectTop._1)
    assert(math.abs(got.getAs[Double]("score6") - expectTop._2) < 1e-5)
  }

  test("rarity_score covers every doc and equals a driver-side recount") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("l")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = docs.length.toLong
    val dfMap = docs.flatMap { case (_, l) => l.distinct }.groupBy(identity)
      .map { case (t, v) => t -> v.length.toLong }
    val rows = Relevance.rarityScore(spark, sf).collect()
    assert(rows.length == docs.length)
    val got = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_tokens"), r.getAs[Long]("rarity_ppm"))).toMap
    docs.foreach { case (id, l) =>
      val mass = l.map(t => (1000000L * n) / dfMap(t)).sum
      assert(got(id) == (l.length.toLong, mass / l.length))
    }
  }

  test("cooccur_pmi lift matches independence counting on a spot pair") {
    val rows = Relevance.cooccurPmi(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("l")).collect()
      .map(_.getSeq[String](1).distinct.toSet)
    val n = docs.length.toLong
    rows.take(5).foreach { r =>
      val (a, b) = (r.getAs[String]("token_a"), r.getAs[String]("token_b"))
      assert(a < b)
      val na = docs.count(_.contains(a)).toLong
      val nb = docs.count(_.contains(b)).toLong
      val nab = docs.count(d => d.contains(a) && d.contains(b)).toLong
      assert(r.getAs[Long]("n_a") == na)
      assert(r.getAs[Long]("n_b") == nb)
      assert(r.getAs[Long]("n_ab") == nab)
      assert(r.getAs[Long]("lift_ppm") == (1000000L * nab * n) / (na * nb))
    }
  }

  test("bm25RankFor ranks an arbitrary term query") {
    val rows = Relevance.bm25RankFor(spark, sf, Seq("data", "stream"), topK = 10)
      .collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to 10L))
    val scores = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("score6"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // non-token terms are rejected (they would be spliced into lambdas)
    intercept[IllegalArgumentException] {
      Relevance.bm25RankFor(spark, sf, Seq("bad term; drop"), 5)
    }
  }

  test("lm_score bigram means are consistent and the flag matches the threshold") {
    import org.apache.spark.sql.functions._
    val rows = Relevance.lmScore(spark, sf).collect()
    val expectN = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == expectN(r.getAs[Long]("doc_id")))
      val ppm = r.getAs[Long]("lm_ppm")
      assert(ppm > 0 && ppm < 1000000)
      assert((r.getAs[Int]("flagged") == 1) == (ppm < 32000))
    }
  }
}
