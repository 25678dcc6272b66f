package graft.curate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** PII detection and redaction — the scrubbing gate every published
  * training-data pipeline runs before text leaves curation (emails,
  * phone numbers, IP addresses; the reference's ingest handles personal
  * data behind its API surface, uib_client.rs, and a corpus engine must
  * scrub it at scale).
  *
  * The driver's synthetic tables carry no organic PII (word-salad
  * documents, numeric facts), so the query entries scan a CONTACT CARD
  * derived deterministically from the `customer` dimension — both
  * engines synthesize the identical string from the same columns (the
  * same move `decontaminate` makes deriving its eval set from doc_id),
  * so the regex machinery is exercised on nonzero, hash-checked
  * matches. `piiStatsOver`/`piiRedactOver` take any text frame — the
  * production path for real corpora.
  *
  * Patterns are written in the RE2-compatible subset (no lookaround, no
  * backreferences) so Java regex (Spark) and RE2 (DuckDB oracle) agree
  * byte-for-byte — the same constraint `token_bpe`'s pre-tokenizer
  * honors.
  *
  * Scale shape: scan-bound projections (regexp_count / regexp_replace
  * inside whole-stage codegen), zero shuffles, zero joins. At 100 TB
  * this is embarrassingly parallel and I/O-bound.
  */
object Pii {

  /** RE2-safe email/phone/IPv4 patterns. `\b` anchors exist in both
    * Java regex and RE2; character classes avoid Unicode shorthands so
    * the engines' defaults cannot diverge.
    */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\b555-[0-9]{4}\\b"
  private[graft] val Ipv4Re = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  /** The deterministic contact card (Spark side). Modular gates vary
    * which PII kinds each row carries so counts span 0..3, not a
    * constant — the SQL oracle builds the identical string.
    */
  private def contactCard: Column = concat(
    col("c_name"), lit(" says: "),
    when(pmod(col("c_custkey"), lit(3)) =!= 0,
      concat(lit("mail user"), col("c_custkey"), lit("@"),
        lower(col("c_mktsegment")), lit(".example.com "))).otherwise(lit("")),
    when(pmod(col("c_custkey"), lit(5)) =!= 2,
      concat(lit("tel 555-"),
        lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"),
        lit(" "))).otherwise(lit("")),
    when(pmod(col("c_custkey"), lit(7)) =!= 3,
      concat(lit("ip 10."), pmod(col("c_custkey"), lit(200)), lit("."),
        pmod(expr("c_custkey DIV 7"), lit(200)), lit("."),
        pmod(col("c_custkey"), lit(250)), lit(" "))).otherwise(lit("")),
    lit("zone "), col("c_nationkey"))

  /** The identical contact card in DuckDB SQL (kept beside the Column
    * so drift is a one-file diff).
    */
  private[graft] val ContactCardSql: String =
    // no continuation line may START with "||": this fragment embeds in
    // oracle strings that run their own stripMargin, which would eat the
    // first pipe of a leading "||"
    """c_name || ' says: ' ||
      |CASE WHEN c_custkey % 3 != 0
      |     THEN 'mail user' || c_custkey || '@' || lower(c_mktsegment) || '.example.com '
      |     ELSE '' END ||
      |CASE WHEN c_custkey % 5 != 2
      |     THEN 'tel 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || ' '
      |     ELSE '' END ||
      |CASE WHEN c_custkey % 7 != 3
      |     THEN 'ip 10.' || (c_custkey % 200) || '.' || ((c_custkey // 7) % 200) ||
      |          '.' || (c_custkey % 250) || ' '
      |     ELSE '' END ||
      |'zone ' || c_nationkey""".stripMargin

  /** Per-row PII counts + flag over an arbitrary `(id, text)` frame. */
  def piiStatsOver(frame: DataFrame, idCol: String, textCol: String): DataFrame =
    frame.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phone"),
      regexp_count(col(textCol), lit(Ipv4Re)).cast("long").as("n_ipv4"))
      .withColumn("has_pii",
        ((col("n_email") + col("n_phone") + col("n_ipv4")) > 0).cast("int"))

  /** Redaction over an arbitrary `(id, text)` frame: typed placeholders,
    * email → phone → IP order (the email pattern consumes its dotted
    * domain before the IP pattern could see digit runs inside it — order
    * is part of the contract and the oracle applies the same order).
    */
  def piiRedactOver(frame: DataFrame, idCol: String, textCol: String): DataFrame =
    frame.select(col(idCol),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        Ipv4Re, "<IP>").as("clean_text"),
      (regexp_count(col(textCol), lit(EmailRe)) +
        regexp_count(col(textCol), lit(PhoneRe)) +
        regexp_count(col(textCol), lit(Ipv4Re))).cast("long").as("n_redacted"))

  /** Query entry: PII counts over the derived contact card. */
  def piiStats(spark: SparkSession, dir: String): DataFrame =
    piiStatsOver(
      Tables.customer(spark, dir).select(col("c_custkey"), contactCard.as("card")),
      "c_custkey", "card")
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive

  /** Query entry: redacted contact card + redaction count.
    *
    * Guarded spread on the scan: the three `regexp_replace` + three
    * `regexp_count` evaluations are the most regex-dense projection in
    * the suite (profiled 2.1 CPU-s on ONE task at sf0.1 — the scan's
    * single row group caps the stage at one core), so this is the M1
    * input-skew shape; exact no-op at production scan layouts.
    * `piiStats` (half the regex work, sub-0.3 s) deliberately keeps the
    * plain zero-exchange scan.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    piiRedactOver(
      graft.core.Adaptive.spreadScan(spark, Tables.customer(spark, dir),
          dir, "customer")
        .select(col("c_custkey"), contactCard.as("card")),
      "c_custkey", "card")
}
