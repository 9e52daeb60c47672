package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the driver corpus (`TESTDATA.md`): one parquet per table under
 * `sfDir`. `events.parquet` carries nanosecond-precision timestamps, which
 * Spark's TimestampType (µs) refuses by default — we read them as raw nanos
 * (`nanosAsLong`) and truncate to µs (`ts div 1000`), matching DuckDB's
 * ns→µs truncation bit-for-bit (verified in round 1).
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
    t(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
