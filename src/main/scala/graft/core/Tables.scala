package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pruned loaders for the driver testdata tables.
  *
  * Every operator reads through these so that column pruning and filter
  * pushdown reach the parquet scan. Loaders take the scale-factor
  * directory so the same plan runs at sf0.001 → 100 TB unchanged.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = read(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision parquet, which Spark's vectorized
    * reader rejects by default; read it as epoch-nanos LongType (exact — and
    * it hash-matches DuckDB's `epoch_ns(ts)` in oracles).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Register every table as a temp view so the whole surface is
    * reachable from plain `spark.sql` — the reference's API layer
    * speaks SQL against its store, and a Graft session (with
    * `GraftSparkExtensions`) resolves the native functions there too.
    */
  def registerViews(s: SparkSession, d: String): Unit = {
    region(s, d).createOrReplaceTempView("region")
    nation(s, d).createOrReplaceTempView("nation")
    customer(s, d).createOrReplaceTempView("customer")
    supplier(s, d).createOrReplaceTempView("supplier")
    part(s, d).createOrReplaceTempView("part")
    orders(s, d).createOrReplaceTempView("orders")
    lineitem(s, d).createOrReplaceTempView("lineitem")
    events(s, d).createOrReplaceTempView("events")
    documents(s, d).createOrReplaceTempView("documents")
    embeddings(s, d).createOrReplaceTempView("embeddings")
  }
}
