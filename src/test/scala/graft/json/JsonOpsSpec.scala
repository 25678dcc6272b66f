package graft.json

import graft.SparkSpec

class JsonOpsSpec extends SparkSpec {

  test("json_props_extract parses k for every event type") {
    val rows = JsonOps.jsonPropsExtract(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Long]("n") > 0))
    assert(rows.forall(r => r.getAs[Long]("min_k") <= r.getAs[Long]("max_k")))
  }

  test("inline_refs only yields codes from the vocabulary") {
    val rows = JsonOps.inlineRefs(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("scan", "join", "sort")(r.getAs[String]("code"))))
  }

  test("explode_dedup preserves first-occurrence order") {
    val rows = JsonOps.explodeDedup(spark, sf).collect()
    assert(rows.forall { r =>
      val toks = r.getAs[String]("dedup_text").split(" ")
      toks.distinct.sameElements(toks) &&
        toks.length == r.getAs[Long]("n_distinct") &&
        r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_tokens")
    })
  }

  test("doc_fingerprint is 32 hex chars and unique per distinct text") {
    val rows = JsonOps.docFingerprint(spark, sf).collect()
    assert(rows.forall(_.getAs[String]("fingerprint").matches("[0-9a-f]{32}")))
  }

  test("ref_resolve marks resolved refs with an id and unresolved with null") {
    val rows = JsonOps.refResolve(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val hasId = !r.isNullAt(r.fieldIndex("resolved_id"))
      r.getAs[Int]("resolved") == (if (hasId) 1 else 0)
    })
    // the sum over (code, spec) counts must equal the plain mined count
    val mined = JsonOps.inlineRefs(spark, sf).collect()
      .map(_.getAs[Long]("n_refs")).sum
    assert(rows.map(_.getAs[Long]("n_refs")).sum == mined)
  }

  test("json_nested walk collects every event and ordered distinct ids") {
    val rows = JsonOps.jsonNested(spark, sf).collect()
    val total = graft.core.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    assert(rows.forall { r =>
      val ids = r.getAs[String]("k_ids").split(",")
      ids.distinct.sameElements(ids) && ids.length == r.getAs[Long]("n_distinct_k")
    })
  }
}
