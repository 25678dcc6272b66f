package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.Analytics

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q5Join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"        -> (Analytics.q1Agg _),
    "q3_topk"       -> (Analytics.q3TopK _),
    "q5_join"       -> (Analytics.q5Join _),
    "topk_per_group" -> (Analytics.topKPerGroup _),
    "asof_join"     -> (Analytics.asofJoin _),
    "sessionize"    -> (Analytics.sessionize _),
    "window_hourly" -> (Analytics.windowHourly _)
  )

  /** DuckDB oracle SQL, one per `queries` key (column names must match). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(20,4)) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3 AND o_custkey < 100
        |ORDER BY o_custkey, rk""".stripMargin,
    "asof_join" ->
      """WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       epoch_us(p.ts) AS purchase_ts_us,
        |       c.event_id AS click_event_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts > c.ts
        |ORDER BY purchase_id""".stripMargin,
    "sessionize" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS tsu, user_id, value FROM events
        |), s AS (
        |  SELECT *, CASE WHEN tsu - LAG(tsu) OVER w > 1800000000
        |                   OR LAG(tsu) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
        |), t AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS session_nr FROM s
        |)
        |SELECT user_id, CAST(session_nr AS BIGINT) AS session_nr,
        |  COUNT(*) AS n_events,
        |  MIN(tsu) AS session_start_us, MAX(tsu) AS session_end_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM t GROUP BY user_id, session_nr
        |ORDER BY user_id, session_nr""".stripMargin,
    "window_hourly" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600000000000 AS hour_ns, event_type,
        |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
