package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic star schema (see TESTDATA.md).
  *
  * Plain parquet scans: Catalyst handles column pruning and predicate
  * pushdown, so callers should select/filter as early as possible and let
  * the optimizer reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet`'s `ts` physical type has varied across driver
    * testdata generations — TIMESTAMP(NANOS) (which the vectorized
    * reader only surfaces as long under the legacy conf) and plain
    * TIMESTAMP(MICROS) without timezone (surfaced as TIMESTAMP_NTZ).
    * Normalize either to one contract every downstream operator and
    * oracle shares: a session-timezone TimestampType column whose
    * instant is the stored value read as UTC (sessions run UTC, so
    * the NTZ→LTZ cast is instant-preserving and matches the DuckDB
    * oracle's naive-as-UTC `epoch_ms`). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      // nanos-as-long: integer `div`, not `/` — nano epochs exceed
      // double's 2^53 mantissa
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = load(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
