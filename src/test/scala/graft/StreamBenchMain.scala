package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run ONLY the bench's CDC stream section (fast iteration on
  * sync-path throughput without the 65-query sweep).
  * SPARK_GRAFT_STREAM_MODE=pipeline  → no JDBC apply (count only), isolating
  * the parse/flatten/route/shuffle cost from the sink cost. */
object StreamBenchMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = sys.env.getOrElse("SPARK_GRAFT_STREAM_MODE", "full")
    val rpe = sys.env.getOrElse("SPARK_GRAFT_ROWS_PER_EVENT", "250").toInt
    val (n, secs) =
      if (mode == "pipeline") Bench.streamPipelineOnly(spark, rowsPerEvent = rpe)
      else Bench.streamThroughput(spark, rowsPerEvent = rpe)
    println(f"mode=$mode rows=$n secs=$secs%.2f rows_per_sec=${n / secs}%.0f")
    spark.stop()
  }
}
