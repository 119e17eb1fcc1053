package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pruned readers for the driver-generated parquet tables
  * (see TESTDATA.md). Column pruning + predicate pushdown happen at the
  * parquet scan because every reader is a plain declarative
  * `spark.read.parquet` — Catalyst prunes through it.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) with genuine sub-microsecond
    * precision, which Spark's TimestampType (micros) cannot hold. We read
    * it via spark.sql.legacy.parquet.nanosAsLong (set in Verify/Bench/
    * specs) and expose it as `ts_ns` (epoch nanos, BIGINT — exact, and
    * matches DuckDB's epoch_ns(ts)) plus a micros-truncated `ts`
    * timestamp for Structured Streaming event-time use.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    table(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
