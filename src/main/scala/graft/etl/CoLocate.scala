package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed co-location for repeated large joins: write both sides bucketed
 * by the join key into the warehouse, and subsequent equi-joins on that key
 * plan with **zero Exchange** (both sides pre-partitioned and pre-sorted) —
 * the Spark-native answer to "this join is the recurring bottleneck at
 * 100 TB". Bucket count should be sized so a bucket of the larger table fits
 * an executor core's working set (e.g. 4096 buckets for a 10 TB fact).
 *
 * Trade-off: bucketing pays one shuffle at write time and zero at every
 * subsequent join/aggregation on the bucket key; worthwhile for tables
 * joined repeatedly (facts joined to facts), not for one-shot queries —
 * there AQE + broadcast is the right default.
 */
object CoLocate {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on the bucket key (plans shuffle-free). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
