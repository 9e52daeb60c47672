package graft

import org.apache.spark.sql.SparkSession

/**
 * Session factory with the engine's recommended configuration, in two
 * profiles:
 *
 *  - [[local]] — the test/driver profile (local[N], shuffle partitions = N).
 *  - [[clusterConf]] — the settings a 1000-executor deployment would ship in
 *    `spark-defaults.conf`; applied here so local runs exercise the same
 *    code paths (AQE coalescing/skew-join) that carry the 100 TB plan.
 *
 * Scale notes (why these values):
 *  - AQE on: runtime partition coalescing + skew-join splitting replace
 *    hand-tuned shuffle partition counts at every scale.
 *  - `maxPartitionBytes` 128m: bounds per-task scan memory so a 100 TB scan
 *    fans out to ~800k tasks rather than OOMing a few.
 *  - `autoBroadcastJoinThreshold` stays default (10m): dimension tables are
 *    broadcast *explicitly* where we know shapes; implicit broadcasts are
 *    left to AQE's runtime sizing.
 */
object GraftSession {

  def clusterConf(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "134217728")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.filterPushdown", "true")
    // ns-timestamp parquet (events tables) read as long + explicit truncation
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = clusterConf(SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
