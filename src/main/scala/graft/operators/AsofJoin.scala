package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Backward as-of join — for each left row, attach the payload of the single
 * right row with the greatest `rightTime ≤ leftTime` for the same key
 * (kdb `aj` / DuckDB `ASOF JOIN` semantics, ties included).
 *
 * Spark has no native as-of join; the classic workaround is a range
 * self-join + aggregation (quadratic in dense keys). This is the
 * union-and-sweep form instead: tag both sides, union, ONE hash shuffle on
 * the key, one per-partition sort by `(time, side)` (right sorts before
 * left at equal times, so ties match), and a running
 * `last(payload, ignoreNulls)` window carries the most recent right payload
 * into each left row. O(n log n) per partition, no self-join, no nested
 * loop — at 100 TB this is a single exchange of both inputs, and AQE can
 * split skewed keys because the window frame is row-bounded.
 *
 * `right` must be unique per `(keys, rightTime)` (pre-dedup with a
 * deterministic tie-break, e.g. max event id) — otherwise which equal-time
 * payload wins is not defined.
 */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftStructType = StructType(left.schema.fields)
    val rightStructType = StructType(payload.map(c => right.schema(c)))
    val rightTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        struct(payload.map(col): _*).as("__rpay"),
        lit(null).cast(leftStructType).as("__lpay")): _*)
    val leftTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(rightStructType).as("__rpay"),
        struct(leftCols.map(col): _*).as("__lpay")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightTagged.unionByName(leftTagged)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(c => col("__lpay").getField(c).as(c)) ++
        payload.map(c => col("__match").getField(c).as(c)): _*)
  }
}
