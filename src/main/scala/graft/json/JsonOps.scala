package graft.json

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** JSON and text mining operators.
  *
  * The reference walks article JSON imperatively (extraction.rs:28-43
  * nested-array iteration, 456-471 recursive id collection, 567-602 regex
  * inline-reference mining, 200-241 order-preserving IndexSet dedup).
  * Here each walk is a codegen'd expression over a column: JSON pointers
  * become `get_json_object`, the regex scan becomes
  * `regexp_extract_all` + explode, and IndexSet semantics are
  * `array_distinct` (first-occurrence order preserved).
  */
object JsonOps {

  /** Typed JSON field extraction + aggregation (extraction.rs:28-43):
    * pull `$.k` out of the event props document and aggregate per type.
    * The JSON parse is a per-row codegen'd expression — no UDF, stays
    * inside WholeStageCodegen, scan-bound at 100 TB.
    */
  def jsonPropsExtract(spark: SparkSession, dir: String): DataFrame = {
    // guarded spread: the JSON parse + distinct partial agg otherwise
    // run at the scan's split count (see Adaptive) — no-op at scale
    val ev = graft.core.Adaptive.spreadScan(spark,
      Tables.events(spark, dir), dir, "events").select("event_type", "props")
    ev.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("n_distinct_k")
      )
      .orderBy("event_type")
  }

  /** Inline-reference mining (extraction.rs:567-602): scan free text for
    * `<code> <spec>` reference patterns (code from a known vocabulary),
    * split code/spec, count occurrences. Non-overlapping left-to-right
    * regex matches, identical in Spark (Java regex) and DuckDB (RE2) for
    * this pattern class.
    */
  def inlineRefs(spark: SparkSession, dir: String): DataFrame = {
    // guarded spread: regex extraction over full text, scan-bound —
    // see Adaptive; no-op at production layouts
    val docs = graft.core.Adaptive.spreadScan(spark,
      Tables.documents(spark, dir), dir, "documents").select("doc_id", "text")
    docs
      .select(explode(
        expr("""regexp_extract_all(text, '\\b(scan|join|sort) (\\w+)', 0)"""
        )).as("ref"))
      .select(
        split(col("ref"), " ").getItem(0).as("code"),
        split(col("ref"), " ").getItem(1).as("spec")
      )
      .groupBy(col("code"), col("spec"))
      .agg(count(lit(1)).as("n_refs"))
      .orderBy("code", "spec")
  }

  /** Tokenize → order-preserving dedup per document (extraction.rs:200-241
    * IndexSet semantics): `array_distinct` keeps first-occurrence order,
    * all inside one codegen'd projection — no explode, no shuffle.
    */
  def explodeDedup(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        array_join(array_distinct(split(col("text"), " ")), " ").as("dedup_text"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct")
      )
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive (see Indexing.searchDoc)
  }

  /** Inline-reference RESOLUTION (storage.rs:443-495, extraction.rs:607-710):
    * the reference doesn't just mine `(code, spec)` refs — it resolves each
    * spec against the bibliography lookup and records unresolved codes.
    * Here the bibliography dim derives from `part` (first word of p_name →
    * smallest part key); resolution is a broadcast left join, so the mined
    * ref stream never shuffles for the lookup. Unresolved specs survive
    * with a null id and resolved=0, exactly like the reference's
    * unresolved-code bookkeeping.
    */
  def refResolve(spark: SparkSession, dir: String): DataFrame = {
    val refs = Tables.documents(spark, dir)
      .select(explode(
        expr("""regexp_extract_all(text, '\\b(scan|join|sort) (\\w+)', 0)""")).as("ref"))
      .select(
        split(col("ref"), " ").getItem(0).as("code"),
        split(col("ref"), " ").getItem(1).as("spec"))
      .groupBy(col("code"), col("spec"))
      .agg(count(lit(1)).as("n_refs"))
    val bib = Tables.part(spark, dir)
      .groupBy(split(col("p_name"), " ").getItem(0).as("word"))
      .agg(min(col("p_partkey")).as("resolved_id"))
    refs
      .join(broadcast(bib), col("spec") === col("word"), "left")
      .select(
        col("code"), col("spec"), col("n_refs"), col("resolved_id"),
        col("resolved_id").isNotNull.cast("int").as("resolved"))
      .orderBy("code", "spec")
  }

  /** Nested-JSON extraction with recursive id collection
    * (extraction.rs:456-534 `collect_ids`, 46 `walk_json_objects`): a
    * nested per-user document — user header + ordered array of event
    * objects, each with its own JSON props payload — is assembled with
    * `to_json`, parsed back through `from_json` with the full nested
    * schema, and the ids are collected by walking the parsed tree with
    * higher-order functions: `transform` descends into the array,
    * `array_distinct` keeps first-occurrence order (IndexSet semantics).
    * One shuffle (the per-user assembly); the walk itself is a projection.
    */
  def jsonNested(spark: SparkSession, dir: String): DataFrame = {
    val nestedSchema =
      "user_id BIGINT, events ARRAY<STRUCT<event_id: BIGINT, event_type: STRING, k: BIGINT>>"
    // pre-partition by the group key (explicit count): the collect_list
    // partial state is the data, so the exchange replaces the
    // aggregation's own shuffle byte-for-byte while the JSON parse and
    // list building leave the (locally one-task) scan stage
    val np = spark.sessionState.conf.numShufflePartitions
    val docs = Tables.events(spark, dir)
      .repartition(np, col("user_id"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("user_id"))
      .agg(to_json(struct(
        col("user_id"),
        // array_sort on structs orders by leading field → event_id order
        array_sort(collect_list(struct(col("event_id"), col("event_type"), col("k"))))
          .as("events"))).as("doc"))
    docs
      .select(col("user_id"),
        from_json(col("doc"), nestedSchema, Map.empty[String, String]).as("parsed"))
      .select(
        col("user_id"),
        size(col("parsed.events")).cast("long").as("n_events"),
        expr("aggregate(parsed.events, cast(0 as bigint), (a, e) -> a + e.k)").as("sum_k"),
        size(array_distinct(col("parsed.events.k"))).cast("long").as("n_distinct_k"),
        concat_ws(",", array_distinct(col("parsed.events.k"))).as("k_ids"))
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive (see Indexing.searchDoc)
  }

  /** Content fingerprint for dedup-by-content (storage.rs upsert identity):
    * md5 over the normalized text. Portable across engines, codegen'd.
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(trim(col("text"))).as("fingerprint")
      )
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive (see Indexing.searchDoc)
  }
}
