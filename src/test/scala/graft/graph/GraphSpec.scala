package graft.graph

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  test("pagerank_ppm is deterministic and covers every graph node") {
    val a = Graph.pagerankPpm(spark, sf).collect()
    val b = Graph.pagerankPpm(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    // bipartite: both customer (< 1e9) and supplier (>= 1e9) nodes ranked
    assert(a.exists(_.getAs[Long]("node") < 1000000000L))
    assert(a.exists(_.getAs[Long]("node") >= 1000000000L))
    // ranks are positive and mass is approximately conserved (floor
    // division only ever loses micro-units)
    assert(a.forall(_.getAs[Long]("rank_u") > 0))
    val mass = a.map(_.getAs[Long]("rank_u")).sum
    assert(mass <= 1000000000000L && mass > 900000000000L)
  }

  test("pagerank_ppm matches a driver-side integer reference on sf0.001") {
    import org.apache.spark.sql.functions._
    val ord = graft.core.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val li = graft.core.Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
    val trade = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1) + 1000000000L))
    val edges = (trade ++ trade.map(_.swap)).groupBy(_._1)
    val nodes = edges.keySet
    val n = nodes.size
    val init = 1000000000000L / n
    val base = (15L * init) / 100L
    var rank = nodes.map(_ -> init).toMap
    for (_ <- 1 to 5) {
      val contrib = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (src, es) =>
        val c = rank(src) / es.length
        es.foreach { case (_, dst) => contrib(dst) += c }
      }
      rank = nodes.map(v => v -> (base + (85L * contrib(v)) / 100L)).toMap
    }
    val got = Graph.pagerankPpm(spark, sf).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_u")).toMap
    assert(got == rank)
  }
}
