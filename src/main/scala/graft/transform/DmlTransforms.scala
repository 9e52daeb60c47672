package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * T1 — Dml → SingleDml flatten (reference `support/SingleDml.java:67-92`).
 *
 * A `Dml` carries N row post-images in `data` and, for UPDATEs, N aligned
 * pre-images in `old`. Flattening must keep `data[i]` paired with `old[i]`
 * (`SingleDml.java:77-80`) — a naive double-explode would cross-join them, so
 * we `posexplode` `data` and look up `old[pos]` positionally. TRUNCATE events
 * have null `data` and must survive as a single marker row
 * (`SingleDml.java:83-90`), hence `posexplode_outer`.
 *
 * Scale: pure per-row generator expression — no shuffle, stays inside
 * whole-stage codegen.
 */
object DmlTransforms {

  /** Header columns preserved through the flatten. */
  val headerCols: Seq[String] =
    Seq("destination", "groupId", "database", "table", "type", "es", "ts")

  /**
   * Flatten a Dml-shaped DataFrame (schema ⊇ [[graft.model.CanalEvent.dmlSchema]],
   * plus an optional pre-assigned `seq` ordering column) into SingleDml rows
   * with `data: Map[String,String]`, `old: Map[String,String]`.
   */
  def flatten(dmls: DataFrame): DataFrame = {
    val keep = dmls.columns.filter(c => c != "data" && c != "old").map(col)
    dmls
      .select(keep ++ Seq(col("old"), posexplode_outer(col("data")).as(Seq("pos", "row"))): _*)
      .withColumn("old_row",
        when(col("old").isNotNull && size(col("old")) > col("pos"),
          element_at(col("old"), col("pos") + 1)))
      .drop("old")
      .withColumnRenamed("row", "data")
      .withColumnRenamed("old_row", "old")
  }

  /**
   * Assign a total per-stream order to flattened rows: events are ordered by
   * (es, ts, eventSeq, pos). The reference inherits order from queue
   * insertion (`PhoenixSyncService.java:96-101`); across a Spark shuffle we
   * must carry it explicitly (SURVEY §7.4 risk 1).
   */
  def withOrderKey(flattened: DataFrame, eventSeqCol: String = "seq"): DataFrame =
    flattened.withColumn("order_key",
      struct(col("es"), col("ts"), col(eventSeqCol), coalesce(col("pos"), lit(0))))
}
