package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Search-document construction and dimension enrichment.
  *
  * The reference assembles one wide document per article for the search
  * index — lemma arrays, concatenated definition text, bibliography and
  * place names resolved through lookup maps (indexing.rs:61-115,
  * meili.rs:187+, extraction.rs:607-710). Here that is a fact-side
  * aggregation plus broadcast joins against the dimension tables: the
  * fact table shuffles once (on its own key, for the agg) and never for
  * the lookups.
  */
object Indexing {

  /** Wide per-order search document: array field (sorted part keys),
    * concatenated text field (distinct return flags), measures, plus
    * customer/nation names resolved via broadcast.
    */
  def searchDoc(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_returnflag",
        "l_extendedprice", "l_discount")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey")
    val nation = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val revenue = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1) - col("l_discount").cast("decimal(8,6)"))
    li.groupBy(col("l_orderkey"))
      .agg(
        sort_array(collect_list(col("l_partkey"))).as("part_keys"),
        array_join(sort_array(collect_set(col("l_returnflag"))), "").as("flags"),
        count(lit(1)).as("n_lines"),
        sum(revenue).cast("double").as("revenue")
      )
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("l_orderkey").as("key"),
        col("c_name"), col("n_name"),
        col("part_keys"), col("flags"), col("n_lines"), col("revenue")
      )
      .orderBy("key")
  }

  /** Multi-hop dimension enrichment (bib_map/place_map resolution,
    * extraction.rs:607-710): supplier → nation → region, every hop a
    * broadcast hash join — zero shuffles on the enriched side.
    */
  def dimEnrich(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    supp
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("s_suppkey"), col("s_name"),
        col("n_name"), col("r_name"), col("s_acctbal")
      )
      .orderBy("s_suppkey")
  }
}
