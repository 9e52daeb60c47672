package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the driver corpus (`TESTDATA.md`): one parquet per table under
 * `sfDir`. `events.parquet` has carried two physical encodings of `ts`
 * across driver generations: nanosecond int64 (rounds 1-6), which Spark's
 * TimestampType (µs) refuses by default — read as raw nanos (`nanosAsLong`)
 * and truncated to µs (`ts div 1000`), matching DuckDB's ns→µs truncation
 * bit-for-bit — and plain `timestamp[us]` (round 7+), which arrives as
 * TIMESTAMP_NTZ and is cast to TimestampType (identity under the pinned UTC
 * session zone) so every downstream query and oracle sees the same µs
 * TimestampType either way.
 */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
