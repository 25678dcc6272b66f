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

  test("bpe_learn merges match an independent driver-side BPE trainer") {
    import org.apache.spark.sql.functions._
    val got = TextOps.bpeLearn(spark, sf, merges = 6).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("merge_left"),
        r.getAs[String]("merge_right"), r.getAs[Long]("pair_count"))).toSeq
    // reference: exact greedy word-frequency BPE on the driver
    var vocab = graft.core.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getAs[String]("w").map(_.toString).toVector -> r.getAs[Long]("c"))
      .toSeq
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (k <- 1 to 6) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + c)
      }
      val ((l, r), n) = pairs.toSeq.minBy { case ((a, b), m) => (-m, a, b) }
      expected += ((k.toLong, l, r, n))
      vocab = vocab.map { case (syms, c) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = l + r
          else out += x
        }
        out.toVector -> c
      }
    }
    assert(got == expected.toSeq)
    // every learned merge was actually observed in the corpus
    assert(got.forall(_._4 > 0))
  }

  test("bpe_apply token counts equal a driver-side re-tokenization under the learned merges") {
    import org.apache.spark.sql.functions._
    val merges = TextOps.bpeLearn(spark, sf, merges = 6).collect()
      .map(r => (r.getAs[String]("merge_left"), r.getAs[String]("merge_right")))
      .toSeq
    def tokenize(w: String): Long = {
      var syms = w.map(_.toString).toVector
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = l + r
          else out += x
        }
        syms = out.toVector
      }
      syms.length.toLong
    }
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val expected = docs.map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      id -> ((ws.length.toLong, ws.map(tokenize).sum))
    }
    val got = TextOps.bpeApply(spark, sf, merges = 6).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ws_tokens"), r.getAs[Long]("n_bpe_tokens")))).toMap
    assert(got == expected)
    // merges actually compress: BPE counts sit between words and chars
    assert(got.values.forall { case (ws, bpe) => bpe >= ws })
    assert(got.values.map(_._2).sum <
      docs.values.map(_.count(_ != ' ').toLong).sum)
  }

  test("bpe model is frozen: one training run per corpus fingerprint") {
    val base = TextOps.ensureBpeModel(spark, sf, merges = 6)
    val marker = java.nio.file.Paths.get(base, "_INDEX_OK")
    val m0 = java.nio.file.Files.getLastModifiedTime(marker)
    TextOps.bpeLearn(spark, sf, merges = 6).collect()
    TextOps.bpeApply(spark, sf, merges = 6).collect()
    // serving did not retrain (the marker would have been restamped)
    assert(java.nio.file.Files.getLastModifiedTime(marker) == m0)
    // the apply plan reads the persisted vocabulary, not a live trainer
    val plan = TextOps.bpeApply(spark, sf, merges = 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("wordlens"), "bpe_apply did not load the frozen model")
  }

  test("length_histogram partitions the corpus exactly") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf)
    val total = docs.count()
    val rows = TextOps.lengthHistogram(spark, sf).collect()
    // buckets are disjoint 16-wide ranges covering every doc exactly once
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    val los = rows.map(_.getAs[Long]("bucket_lo"))
    assert(los.distinct.length == los.length)
    assert(los.forall(_ % 16 == 0))
    // shares are floor-ppm: sum within (total - buckets, total] millionths
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length)
    // spot-check one bucket against a direct count
    val lo = los.head
    val direct = docs
      .filter(size(split(col("text"), " ")) >= lo &&
        size(split(col("text"), " ")) < lo + 16).count()
    assert(rows.find(_.getAs[Long]("bucket_lo") == lo)
      .get.getAs[Long]("n_docs") == direct)
  }

  test("lang_confusion recounts the langId matrix with exact shares") {
    val rows = TextOps.langConfusion(spark, sf).collect()
    val ids = TextOps.langId(spark, sf).select("lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = ids.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val totals = ids.groupBy(_._1).map { case (l, xs) => l -> xs.length.toLong }
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("lang"), r.getAs[String]("pred_lang"))
      assert(r.getAs[Long]("n_docs") == cells(k))
      assert(r.getAs[Long]("share_ppm") ==
        1000000L * cells(k) / totals(k._1))
    }
    // each declared language's shares account for its whole corpus slice
    rows.groupBy(_.getAs[String]("lang")).foreach { case (l, g) =>
      assert(g.map(_.getAs[Long]("n_docs")).sum == totals(l))
    }
  }

  test("quality_percentiles interpolates the per-lang score distribution exactly") {
    val rows = TextOps.qualityPercentiles(spark, sf).collect()
    val lang = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scores = TextOps.qualityScore(spark, sf).select("doc_id", "score")
      .collect().map(r => lang(r.getLong(0)) -> r.getAs[Int]("score"))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2.toDouble).sorted }
    assert(rows.length == scores.size)
    // linear interpolation at rank p*(n-1), the percentile/quantile_cont
    // definition both engines share
    def q(xs: Seq[Double], p: Double): Double = {
      val r = p * (xs.length - 1)
      val lo = r.toInt
      if (lo == xs.length - 1) xs(lo)
      else xs(lo) + (r - lo) * (xs(lo + 1) - xs(lo))
    }
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    rows.foreach { r =>
      val xs = scores(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") == xs.length.toLong)
      assert(r.getAs[Double]("p10") == r6(q(xs, 0.1)))
      assert(r.getAs[Double]("p50") == r6(q(xs, 0.5)))
      assert(r.getAs[Double]("p90") == r6(q(xs, 0.9)))
      // calibration sanity: percentiles are ordered
      assert(r.getAs[Double]("p10") <= r.getAs[Double]("p50") &&
        r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
    }
  }

  test("distinct_sketch two-level bottom-k equals a driver recompute, error bounded") {
    val rows = TextOps.distinctSketch(spark, sf).collect()
    // driver recompute: single-level bottom-k over the same shingle hashes
    val hashes = graft.core.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .flatMap { r =>
        val l = r.getString(1).split(" ", -1).toSeq
        if (l.length < 3) Seq.empty[(String, String)]
        else l.sliding(3).map(g => r.getString(0) -> g.mkString(" ")).toSeq
      }.distinct
      .map { case (lang, g) =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        lang -> java.lang.Long.parseLong(md5.take(8), 16)
      }.distinct
    val byLang = hashes.groupBy(_._1)
    assert(rows.length == byLang.size)
    rows.foreach { r =>
      val hs = byLang(r.getAs[String]("lang")).map(_._2).sorted
      assert(r.getAs[Long]("n_exact") == hs.length.toLong)
      if (hs.length >= 256) {
        val kth = hs(255)
        assert(r.getAs[Long]("kth_hash") == kth)
        assert(r.getAs[Long]("est_distinct") ==
          math.floor(255 * 4294967296.0 / kth).toLong)
      } else {
        assert(r.isNullAt(r.fieldIndex("kth_hash")))
        assert(r.getAs[Long]("est_distinct") == hs.length.toLong)
      }
      // k=256 → sigma ~6%; fail the build past ~3 sigma
      assert(r.getAs[Long]("err_ppm") < 200000L,
        s"${r.getAs[String]("lang")} sketch error ${r.getAs[Long]("err_ppm")} ppm")
    }
  }

  test("kmv_overlap matches a driver recompute of the Beyer estimator; degrades to exact") {
    // driver recompute: per-lang side hash sets under the doc_id % 5 split
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
    val sides = docs.flatMap { r =>
      val l = r.getString(2).split(" ", -1).toSeq
      val isNew = r.getLong(0) % 5 == 0
      if (l.length < 3) Seq.empty[(String, Boolean, Long)]
      else l.sliding(3).map { g =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(g.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (r.getString(1), isNew, java.lang.Long.parseLong(md5.take(8), 16))
      }.toSeq
    }.distinct
    val oldSets = sides.filter(!_._2).groupBy(_._1)
      .map { case (l, xs) => l -> xs.map(_._3).toSet }
    val newSets = sides.filter(_._2).groupBy(_._1)
      .map { case (l, xs) => l -> xs.map(_._3).toSet }
    def est(state: Seq[Long], k: Int): Long =
      if (state.length < k) state.length.toLong
      else math.floor((k - 1) * 4294967296.0 / state.max).toLong

    val k = 256
    val rows = TextOps.kmvOverlap(spark, sf, k).collect()
    assert(rows.map(_.getAs[String]("lang")).toSet ==
      (oldSets.keySet ++ newSets.keySet))
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val o = oldSets.getOrElse(lang, Set.empty)
      val n = newSets.getOrElse(lang, Set.empty)
      val stOld = o.toSeq.sorted.take(k)
      val stNew = n.toSeq.sorted.take(k)
      // mergeability law: bottom-k of the two STATES == bottom-k of the
      // raw union — the property that lets crawls merge without rescans
      val merged = (stOld ++ stNew).distinct.sorted.take(k)
      assert(merged == (o ++ n).toSeq.sorted.take(k))
      val eo = est(stOld, k); val en = est(stNew, k); val eu = est(merged, k)
      val kBoth = merged.count(h => stOld.contains(h) && stNew.contains(h))
      assert(r.getAs[Long]("est_old") == eo)
      assert(r.getAs[Long]("est_new") == en)
      assert(r.getAs[Long]("est_union") == eu)
      assert(r.getAs[Long]("est_inter") == kBoth * eu / merged.length)
      assert(r.getAs[Long]("novelty_ppm") ==
        (if (en > 0) math.min(1000000L, math.max(0L, 1000000L * (eu - eo)) / en)
         else 0L))
      assert(r.getAs[Long]("n_union_exact") == (o ++ n).size.toLong)
      assert(r.getAs[Long]("n_inter_exact") == (o intersect n).size.toLong)
      // k=256 → sigma ~6% on the union; fail the build past ~3 sigma
      assert(r.getAs[Long]("err_union_ppm") < 200000L,
        s"$lang union error ${r.getAs[Long]("err_union_ppm")} ppm")
    }

    // universe smaller than k → every estimate IS the exact count
    val exactRows = TextOps.kmvOverlap(spark, sf, k = 1000000).collect()
    exactRows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val o = oldSets.getOrElse(lang, Set.empty)
      val n = newSets.getOrElse(lang, Set.empty)
      assert(r.getAs[Long]("est_old") == o.size.toLong)
      assert(r.getAs[Long]("est_new") == n.size.toLong)
      assert(r.getAs[Long]("est_union") == (o ++ n).size.toLong)
      assert(r.getAs[Long]("est_inter") == (o intersect n).size.toLong)
      assert(r.getAs[Long]("err_union_ppm") == 0L)
    }
  }

  test("quantile_sketch: deterministic bottom-k sample, real truncation, exact merge law") {
    import org.apache.spark.sql.functions._
    val k = 32
    val scored = TextOps.scoreHashes(spark, sf)
    val full = scored.collect().map(r => (r.getAs[String]("lang"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("h"), r.getAs[Int]("score")))
    val byLang = full.groupBy(_._1)
    val out = TextOps.quantileSketch(spark, sf, k).collect()
    assert(out.length == byLang.size)
    out.foreach { r =>
      val n = byLang(r.getAs[String]("lang")).length.toLong
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_sample") == math.min(k.toLong, n))
      // estimates live inside the exact score range (sanity on the rail)
      assert(r.getAs[Double]("p10_est") <= r.getAs[Double]("p90_est"))
    }
    assert(out.exists(r => r.getAs[Long]("n_sample") < r.getAs[Long]("n_docs")),
      "no truncation — k too large for the test corpus to exercise sampling")
    // the state is exactly the k smallest (h, doc_id) per lang — a pure
    // function of the doc set (driver recompute)
    val state = TextOps.quantileBottomK(scored, k).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSet
    val expected = byLang.toSeq.flatMap { case (lang, rows) =>
      rows.sortBy(t => (t._3, t._2)).take(k).map(t => (lang, t._2)).toSeq
    }.toSet
    assert(state == expected)
    // merge law: id-sliced sub-sketches fold to the full state
    // bit-for-bit, in any association (union's bottom-k IS the merge)
    val parts = (0 until 3).map(i =>
      TextOps.quantileBottomK(scored.filter(col("doc_id") % 3 === i), k))
    val merged = parts.reduce((a, b) => TextOps.quantileSketchMerge(a, b, k))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(merged) == rows(TextOps.quantileBottomK(scored, k)))
    assert(rows(TextOps.quantileSketchEstimate(merged)) ==
      rows(TextOps.quantileSketchEstimate(TextOps.quantileBottomK(scored, k))))
  }

  test("CMS merge law is exact; heavy-hitter estimates dominate exact counts tightly") {
    import org.apache.spark.sql.functions._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val docs = graft.core.Tables.documents(spark, sf)
    val occ = TextOps.shingleOccurrences(docs)
    // merge = addition: per-shard sketches fold to the one-pass sketch
    // bit-for-bit (3-way split so at least one shard pair shares buckets)
    val whole = TextOps.cmsState(occ)
    val parts = (0 until 3).map(i => TextOps.cmsState(
      TextOps.shingleOccurrences(docs.filter(pmod(col("doc_id"), lit(3)) === i))))
    assert(rows(parts.reduce(TextOps.cmsMerge(_, _))) == rows(whole))
    val hh = TextOps.heavyHitters(spark, sf).collect()
    assert(hh.nonEmpty)
    hh.foreach { r =>
      // CMS never underestimates, and w=1024 keeps the slack tiny here
      assert(r.getAs[Long]("est_count") >= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("over_ppm") >= 0L)
    }
    // the rail agrees with an exact driver recompute of the top counts
    val exactTop = occ.groupBy("lang", "g").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    hh.foreach { r =>
      assert(r.getAs[Long]("n_exact") ==
        exactTop((r.getAs[String]("lang"), r.getAs[String]("shingle"))))
    }
    // a candidate the sketch never saw is REPORTED (left join), and one
    // whose lang has no state at all estimates exactly 0 (every bucket
    // absent → min over coalesced zeros; within a live lang an unseen
    // key may still read >0 — that's the CMS overestimate, not a bug)
    val sql = spark.sqlContext
    import sql.implicits._
    val ghosts = Seq(("zz", "no such language"),
      (hh.head.getAs[String]("lang"), "never seen shingle xyzzy"))
      .toDF("lang", "g")
    val est = TextOps.cmsEstimate(whole, ghosts).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("est_count")).toMap
    assert(est.size == 2)
    assert(est("zz") == 0L)
    assert(est(hh.head.getAs[String]("lang")) >= 0L)
  }

  test("fertility_stats is bpeApply rolled up by language off the same frozen model") {
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val langOf = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val perDoc = TextOps.bpeApply(spark, sf).collect()
      .map(r => (langOf(r.getAs[Long]("doc_id")),
        r.getAs[Long]("n_ws_tokens"), r.getAs[Long]("n_bpe_tokens")))
    val types = graft.core.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .flatMap(r => r.getAs[String]("text").split(" ").filter(_.nonEmpty)
        .map(w => r.getAs[String]("lang") -> w))
      .groupBy(_._1).map { case (l, ws) => l -> ws.map(_._2).distinct.length.toLong }
    val got = TextOps.fertilityStats(spark, sf).collect()
    assert(got.map(_.getAs[String]("lang")).toSeq == got.map(_.getAs[String]("lang")).toSeq.sorted)
    got.foreach { r =>
      val l = r.getAs[String]("lang")
      val mine = perDoc.filter(_._1 == l)
      val (nw, nb) = (mine.map(_._2).sum, mine.map(_._3).sum)
      assert(r.getAs[Long]("n_words") == nw)
      assert(r.getAs[Long]("n_bpe_tokens") == nb)
      assert(r.getAs[Long]("n_types") == types(l))
      assert(r.getAs[Double]("fertility6") == r6(nb.toDouble / nw))
    }
    assert(got.map(_.getAs[String]("lang")).toSet == types.keySet)
  }
}
