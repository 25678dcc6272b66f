package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("profile_stats matches driver-computed column facts") {
    val o = graft.core.Tables.orders(spark, sf)
    val n = o.count()
    val rows = Profile.profileStats(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows.keySet == Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    // lexical min<=max only holds for genuinely string-typed columns
    // (numeric/date strings compare numerically in the engine)
    val lexicalCols = Set("o_orderstatus", "o_orderpriority", "o_orderdate")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_null") == 0L)
      if (lexicalCols(r.getAs[String]("column_name")))
        assert(r.getAs[String]("min_s") <= r.getAs[String]("max_s"))
    }
    val distinctKeys = o.select(count_distinct(col("o_orderkey"))).collect().head.getLong(0)
    assert(rows("o_orderkey").getAs[Long]("n_distinct") == distinctKeys)
    val minKey = o.agg(min(col("o_orderkey"))).collect().head.getLong(0)
    assert(rows("o_orderkey").getAs[String]("min_s") == minKey.toString)
    val minPrice = o.agg(min(col("o_totalprice"))).collect().head.getDouble(0)
    assert(rows("o_totalprice").getAs[String]("min_s") ==
      new java.math.BigDecimal(minPrice).setScale(2, java.math.RoundingMode.HALF_UP).toPlainString)
  }

  test("outlier_stats matches an exact driver recompute and the float 2-sigma rule") {
    val vals = graft.core.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> math.round(r.getDouble(1) * 100))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    val got = Profile.outlierStats(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("mean_cents"),
          r.getAs[Long]("n_outliers")))).toMap
    vals.foreach { case (t, xs) =>
      val n = BigInt(xs.length)
      val s = BigInt(xs.sum)
      val q = xs.map(x => BigInt(x) * BigInt(x)).sum
      // exact integer recompute of the product's rule — validates the
      // distributed stats/flag plumbing without float round-off
      val expect = xs.count { x =>
        val dev = n * BigInt(x) - s
        dev * dev > 4 * (n * q - s * s)
      }
      val (gn, gMean, gOut) = got(t)
      assert(gn == n.toLong)
      assert(gMean == xs.sum / xs.length) // truncating mean (both engines' // / DIV)
      assert(gOut == expect.toLong)
      // and the rule agrees with the float 2σ form wherever the float
      // margin is comfortable (boundary-sitting values are exempt —
      // that disagreement is float round-off, not a product bug)
      val mean = xs.sum.toDouble / xs.length
      val varPop = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      val floatOut = xs.count { x =>
        val d2 = (x - mean) * (x - mean)
        d2 > 4 * varPop && (d2 - 4 * varPop) / (4 * varPop + 1) > 1e-9
      }
      assert(floatOut <= expect && expect <= xs.count { x =>
        val d2 = (x - mean) * (x - mean)
        d2 > 4 * varPop * (1 - 1e-9) - 1e-9
      })
    }
  }

  test("outlier_stats truncates the mean on negative sums like the oracle's //") {
    val sql = spark.sqlContext
    import sql.implicits._
    // refunds: sum = -5 cents over 2 rows → trunc(-2.5) = -2, which is
    // exactly DuckDB's -5 // 2 (verified: // truncates toward zero, it
    // does NOT floor) — both engines agree bit-for-bit on refunds
    val frame = Seq(("refund", -0.03), ("refund", -0.02)).toDF("k", "v")
    val r = Profile.outlierStatsOf(frame, "k", "v").collect().head
    assert(r.getAs[Long]("mean_cents") == -2L)
  }

  test("profile scans stay column-pruned (one column per union leg)") {
    val plan = Profile.profileStats(spark, sf).queryExecution.executedPlan.toString
    // every parquet scan in the union must read a single column
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq
    assert(reads.nonEmpty)
    assert(reads.forall(s => s.count(_ == ':') == 1), s"multi-column scan: $reads")
  }
}
