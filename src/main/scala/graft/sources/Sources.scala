package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest sources beyond local parquet (reference: uib_client.rs:189-272
  * paged list + per-entity fetch; BASELINE "DataFrame JDBC read").
  *
  * Every reader funnels through a declarative `spark.read` so pushdown /
  * pruning / partitioned parallelism come from the source connector:
  * - `csv`/`jsonl` with an explicit schema (never inferSchema at scale —
  *   inference is a full extra pass over 100 TB);
  * - `jdbc` with mandatory partitioning bounds, because an unpartitioned
  *   JDBC read is a single-task scan: the reference's paged fetch loop
  *   (uib_client.rs:189) becomes `numPartitions` concurrent range scans
  *   pushed down to the database as WHERE bounds.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-explicit CSV read (header expected, no inference pass). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Schema-explicit JSON-lines read (no inference pass; corrupt rows
    * land in `_corrupt_record` instead of failing the 1000-executor job).
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Partitioned JDBC range read — the scale-correct form of the
    * reference's paged list fetch (uib_client.rs:189-272).
    * `partitionColumn` must be indexed and roughly uniform; each of the
    * `numPartitions` tasks issues its own bounded WHERE scan.
    * Exercised end-to-end against an embedded Derby database in
    * SourcesSinksSpec (partition count, contents, predicate pushdown).
    */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int,
           props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)
}
