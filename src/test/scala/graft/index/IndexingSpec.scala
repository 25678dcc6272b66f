package graft.index

import graft.SparkSpec

class IndexingSpec extends SparkSpec {

  test("search_doc part_keys are sorted and n_lines matches") {
    val rows = Indexing.searchDoc(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val keys = r.getAs[String]("part_keys").split(",").map(_.toLong).toSeq
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

  test("template_assemble keeps token order and counts resolutions") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = Indexing.templateAssemble(spark, sf).collect()
    assert(rows.length == docs.size)
    assert(rows.forall { r =>
      val orig = docs(r.getAs[Long]("doc_id")).split(" ")
      val out = r.getAs[String]("assembled").split(" ")
      out.length == orig.length &&
        out.zip(orig).forall { case (o, t) => o == t || (o.startsWith(s"[$t:") && o.endsWith("]")) } &&
        out.count(_.startsWith("[")) == r.getAs[Long]("n_resolved")
    })
  }

  test("link_table edges cover every lineitem exactly once") {
    val rows = Indexing.linkTable(spark, sf).collect()
    val lines = graft.core.Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_refs")).sum == lines)
    val keys = rows.map(r => (r.getAs[Long]("article_id"), r.getAs[Long]("bib_id")))
    assert(keys.distinct.length == keys.length)
  }

  test("inverted_index stats agree with a direct token recount") {
    import org.apache.spark.sql.functions._
    val toks = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byTok = toks.groupBy(_._2)
    val rows = Indexing.invertedIndex(spark, sf).collect()
    assert(rows.length == byTok.size)
    rows.foreach { r =>
      val t = r.getAs[String]("token")
      val perDoc = byTok(t).groupBy(_._1).map { case (d, v) => d -> v.length.toLong }
      assert(r.getAs[Long]("df") == perDoc.size.toLong)
      assert(r.getAs[Long]("total_tf") == perDoc.values.sum)
      assert(r.getAs[Long]("max_tf") == perDoc.values.max)
      // top doc = highest tf, lowest doc_id on ties
      val expectTop = perDoc.toSeq.sortBy { case (d, tf) => (-tf, d) }.head._1
      assert(r.getAs[Long]("top_doc") == expectTop)
    }
  }

  test("facet_count totals per facet equal the filtered document count") {
    import org.apache.spark.sql.functions._
    val rows = Indexing.facetCount(spark, sf).collect()
    val filtered = graft.core.Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F").count()
    val byFacet = rows.groupBy(_.getAs[String]("facet"))
    assert(byFacet.keySet == Set("priority", "segment", "nation"))
    // each facet is a partition of the SAME filtered document set
    byFacet.values.foreach { fr =>
      assert(fr.map(_.getAs[Long]("n_docs")).sum == filtered)
    }
  }

  test("facetCountOver counts an arbitrary facet map over a filtered frame") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf).filter(col("n_chars") > 200)
    val got = Indexing.facetCountOver(docs, Map(
      "lang" -> col("lang"), "source" -> col("source")))
      .collect()
    val n = docs.count()
    val byFacet = got.groupBy(_.getAs[String]("facet"))
    assert(byFacet.keySet == Set("lang", "source"))
    byFacet.values.foreach { fr =>
      assert(fr.map(_.getAs[Long]("n_docs")).sum == n)
    }
  }
}
