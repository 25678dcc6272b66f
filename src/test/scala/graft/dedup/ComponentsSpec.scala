package graft.dedup

import graft.SparkSpec

/** Seeded random-graph property check: the distributed labelling must
  * equal a driver-side union-find on arbitrary topologies (chains,
  * cliques, stars, isolated pairs all arise at these densities).
  */
class ComponentsSpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(v => v -> find(v)).toMap
  }

  test("minLabels equals a driver union-find on seeded random graphs") {
    val sql = spark.sqlContext
    import sql.implicits._
    val rnd = new scala.util.Random(1234)
    (1 to 4).foreach { trial =>
      val nNodes = 20 + rnd.nextInt(60)
      val nEdges = 5 + rnd.nextInt(3 * nNodes)
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(nNodes).toLong
        var b = rnd.nextInt(nNodes).toLong
        while (b == a) b = rnd.nextInt(nNodes).toLong
        (a, b)
      }
      val expected = unionFind(edges)
      val got = Components
        .minLabels(edges.toDF("src", "dst").repartition(5))
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lbl"))
        .toMap
      assert(got == expected, s"trial $trial: component labels diverge")
    }
  }
}
