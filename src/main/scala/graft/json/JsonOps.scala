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
    val ev = Tables.events(spark, dir).select("event_type", "props")
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
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
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
      .orderBy("doc_id")
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
      .orderBy("doc_id")
  }
}
