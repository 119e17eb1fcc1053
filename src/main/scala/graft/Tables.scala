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
  /** The generator has shipped events.ts under two encodings, so this
    * reader adapts to whatever the parquet file actually holds and always
    * exposes the same two columns:
    *   - `ts_ns`  epoch nanoseconds, BIGINT — exact, matches DuckDB's
    *     `epoch_ns(ts)` under both encodings;
    *   - `ts`     TimestampType (micros) for event-time / window /
    *     Structured Streaming use.
    * Encodings seen: TIMESTAMP(NANOS) (read as BIGINT via
    * spark.sql.legacy.parquet.nanosAsLong, set in Verify/Bench/specs) and
    * plain timestamp[us] (read as TIMESTAMP_NTZ; cast to TimestampType is
    * exact with the session timezone pinned to UTC).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        val tsMicros = col("ts").cast(TimestampType)
        raw.select(raw.columns.map {
          case "ts" => (unix_micros(tsMicros) * lit(1000L)).as("ts_ns")
          case c    => col(c)
        }.toIndexedSeq :+ tsMicros.as("ts"): _*)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
