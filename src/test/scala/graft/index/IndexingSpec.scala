package graft.index

import graft.SparkSpec

class IndexingSpec extends SparkSpec {

  test("search_doc part_keys are sorted and n_lines matches") {
    val rows = Indexing.searchDoc(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val keys = r.getAs[scala.collection.Seq[Long]]("part_keys")
      keys.length == r.getAs[Long]("n_lines") && keys == keys.sorted
    })
  }

  test("dim_enrich resolves every supplier to a region") {
    val rows = Indexing.dimEnrich(spark, sf).collect()
    val suppliers = graft.core.Tables.supplier(spark, sf).count()
    assert(rows.length == suppliers)
    assert(rows.forall(r => r.getAs[String]("r_name") != null))
  }

  test("search_doc plan broadcasts the dimension side") {
    val plan = Indexing.searchDoc(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
