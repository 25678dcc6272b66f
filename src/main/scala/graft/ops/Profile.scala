package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-profiling summary — the per-column health report an ingest
  * pipeline publishes next to its sync stats (the reference surfaces
  * corpus-level stats through web.rs's status endpoints; a column
  * profile is the table-shaped generalization every warehouse attaches
  * to a dataset): row count, null count, exact distinct count, and
  * min/max rendered as strings per column.
  *
  * Scale shape: one aggregation per column, UNION'd — each scans ONE
  * column of the columnar file (ReadSchema prunes to it), so the whole
  * profile costs k pruned scans, not one k-wide expand (Spark plans
  * multi-distinct aggregates by replicating every row per distinct
  * column — k× the corpus through the shuffle; the union shape keeps
  * each pass narrow and independently parallel). Exact distinct is a
  * partial-agg shuffle of the column's values; past ~1e9 distincts per
  * column `approx_count_distinct` is the documented fallback (same
  * contract as `percentile_stats`).
  */
object Profile {

  /** One column's profile row: typed min/max are rendered through
    * `render` so both engines print identical strings (doubles go
    * through DECIMAL(18,2), timestamps through a fixed format —
    * raw casts of either would drift between engines).
    */
  private def profileOne(t: DataFrame, cname: String,
      render: Column => Column): DataFrame =
    t.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(cname).isNull, 1L).otherwise(0L)).as("n_null"),
      count_distinct(col(cname)).as("n_distinct"),
      render(min(col(cname))).as("min_s"),
      render(max(col(cname))).as("max_s"))
      .select(lit(cname).as("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))

  private def str(c: Column): Column = c.cast("string")
  private def dec2(c: Column): Column = c.cast("decimal(18,2)").cast("string")
  private def tsFmt(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Integer-exact 2σ outlier screen over event values — the anomaly
    * gauge a data-quality monitor runs per metric stream. No float math
    * anywhere: values are exact cents (2-decimal inputs through a
    * DECIMAL cast), and `|x − μ| > 2σ` is decided by the equivalent
    * integer comparison `(n·x − Σx)² > 4·(n·Σx² − (Σx)²)` (both sides ×
    * n², so mean and variance never materialize as floats — the same
    * log-free trick the ppm family uses for ratios). Per event type:
    * count, integer mean cents, outlier count + ppm.
    *
    * Scale shape: one partial-agg pass builds the per-type (n, Σx, Σx²)
    * stats (one row per metric stream — KB), which broadcast back onto
    * the scan for the flag projection; one more partial agg rolls up.
    * The corpus is scanned twice and shuffled never. The Σx²
    * accumulator and the variance/dev² comparison run in DECIMAL(38,0):
    * the BIGINT envelope saturated at ~1e6 events of ~$100 values
    * (sf1-measured ANSI overflow), while 38 digits cover any physical
    * event volume for ~2× cost confined to this projection; n, Σx and
    * all output columns stay BIGINT.
    */
  def outlierStats(spark: SparkSession, dir: String): DataFrame =
    // spread once; the stats and flag branches reference the SAME frame,
    // so ReuseExchange keeps it one physical shuffle (no-op at
    // production scan layouts — see Adaptive)
    outlierStatsOf(Tables.events(spark, dir), "event_type", "value")

  /** `outlierStats` over an arbitrary frame: per `keyCol` stream, flag
    * `valueCol` rows beyond 2σ (2-decimal values assumed; see the query
    * entry's doc for the integer formulation).
    */
  def outlierStatsOf(frame: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val e = frame
      .select(col(keyCol).as("event_type"),
        expr(s"CAST(CAST($valueCol AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    // Σx² and the comparison run in DECIMAL(38,0): the BIGINT envelope
    // saturates at the q accumulator and the ×4 variance term around 1e6
    // events of ~$100 values (measured: sf1 replicas raise
    // SparkArithmeticException under ANSI), while DECIMAL(38,0) is exact
    // to 38 digits — beyond any physical event volume — for ~2× cost on
    // this one projection. n, s, and every OUTPUT column stay BIGINT, so
    // oracle hashes are unchanged.
    val st = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(col("cents").cast("decimal(38,0)") * col("cents")).as("q"))
    e.join(broadcast(st), "event_type")
      .withColumn("flag", expr(
        """CAST((CAST(n AS DECIMAL(38,0)) * cents - s) * (CAST(n AS DECIMAL(38,0)) * cents - s)
          |     > 4 * (CAST(n AS DECIMAL(38,0)) * q - CAST(s AS DECIMAL(38,0)) * s) AS INT)""".stripMargin))
      .groupBy("event_type")
      // DIV truncates toward zero exactly like the oracle's // (DuckDB
      // -5 // 2 = -2, verified) — negative refund sums agree bit-for-bit
      .agg(first(col("n")).as("n"),
        expr("CAST(first(s) DIV first(n) AS BIGINT)").as("mean_cents"),
        sum(col("flag")).cast("long").as("n_outliers"))
      .withColumn("outlier_ppm",
        expr("CAST((1000000 * n_outliers) DIV n AS BIGINT)"))
      .orderBy("event_type")
  }

  /** Query entry: full column profile of the orders table. */
  def profileStats(spark: SparkSession, dir: String): DataFrame = {
    // one spread shared by all six per-column aggregations: the six
    // subtrees reference the same frame, so ReuseExchange keeps it one
    // physical shuffle and the partial distincts run at session width
    // even on a one-row-group local file (no-op at production layouts)
    val o = Tables.orders(spark, dir)
    Seq(
      profileOne(o, "o_orderkey", str),
      profileOne(o, "o_custkey", str),
      profileOne(o, "o_orderstatus", str),
      profileOne(o, "o_totalprice", dec2),
      profileOne(o, "o_orderdate", tsFmt),
      profileOne(o, "o_orderpriority", str))
      .reduce(_.unionAll(_))
      .orderBy("column_name") // bounded output: one row per column
  }
}
