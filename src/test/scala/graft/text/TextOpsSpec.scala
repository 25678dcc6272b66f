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
}
