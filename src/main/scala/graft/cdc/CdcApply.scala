package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * CDC materialization — the Spark-native re-expression of the reference's
 * sink semantics K1–K4 (`service/PhoenixSyncService.java:370-513`):
 *
 *  - K1  INSERT/UPDATE → upsert of the full post-image (last-write-wins by
 *        PK; UPDATE routes to the same upsert, `PhoenixSyncService.java:240-241`)
 *  - K2  UPDATE whose `old` pre-image contains a PK column → delete old key
 *        + upsert new key (`:425-456`)
 *  - K3  DELETE → remove by PK (`:473-498`)
 *  - K4  TRUNCATE → drop all prior state (`:505-513`)
 *
 * Where the reference replays events row-by-row over JDBC, a Spark engine can
 * *fold* the event log into final table state declaratively. The fold is a
 * single hash aggregation — `max_by(post_image, order_key)` per key — which
 * at 100 TB is one shuffle with map-side partial aggregation and **no sort**
 * (a `row_number()` window would sort every partition; `max_by` keeps only
 * one row of state per key per task). AQE handles skewed keys.
 *
 * Correctness trap (SURVEY §2.2 "per-key ordering"): all events for one key
 * must fold in binlog order — `orderKey` must be a total order (es, seq, …);
 * `max_by` on that struct is order-insensitive to shuffle nondeterminism.
 */
object CdcApply {

  /**
   * Fold an event log into final state: for every key, keep the payload of
   * the greatest `orderKey` event; if that event is a DELETE the key is
   * absent from the result.
   *
   * @param events   one row per row-change
   * @param keyCols  PK columns (targetPk, `MappingConfig.java:102`)
   * @param orderKey total-order column/struct (binlog position)
   * @param opCol    op column: INSERT|UPDATE|DELETE
   * @param payload  columns to carry into the final state (full post-image)
   */
  def latestState(events: DataFrame, keyCols: Seq[String], orderKey: Column,
                  opCol: Column, payload: Seq[String], deleteOp: String = "DELETE"): DataFrame = {
    val packed = struct(opCol.as("__op") +: payload.map(c => col(c).as(c)): _*)
    val agg = events
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(packed, orderKey).as("__last"))
    agg
      .where(col("__last.__op") =!= deleteOp)
      .select(keyCols.map(col) ++ payload.map(c => col(s"__last.`$c`").as(c)): _*)
  }

  /**
   * K4 — truncate barrier: drop every event at-or-before the last TRUNCATE of
   * its (database, table). Implemented as a broadcast join against the tiny
   * per-table max-truncate aggregate — at scale this is a map-side filter,
   * not a shuffle of the event log.
   */
  def afterLastTruncate(events: DataFrame, tableCols: Seq[String], orderKey: Column,
                        opCol: Column, truncateOp: String = "TRUNCATE"): DataFrame = {
    val barriers = events.where(opCol === truncateOp)
      .groupBy(tableCols.map(col): _*)
      .agg(max(orderKey).as("__trunc_at"))
    events
      .join(broadcast(barriers), tableCols, "left")
      .where(col("__trunc_at").isNull || orderKey > col("__trunc_at"))
      .drop("__trunc_at")
      .where(opCol =!= truncateOp)
  }

  /**
   * K2 — PK-change handling. The reference detects a key change when a PK
   * column appears in the UPDATE's `old` pre-image (`:442-447`): the *old*
   * key's row is deleted and the post-image lands under the *new* key. In a
   * declarative fold this means each PK-changing UPDATE contributes two
   * events: a DELETE at the old key and an upsert at the new key — emitted
   * here, then folded by [[latestState]]. Pure per-row flatMap (no shuffle).
   *
   * Expects SingleDml-shaped rows (`data`/`old` map columns); emits the same
   * shape with PK-change UPDATEs rewritten.
   */
  def expandPkChanges(singles: DataFrame, pkCols: Seq[String],
                      opCol: String = "type"): DataFrame = {
    val isPkChange = pkCols
      .map(pk => col("old").isNotNull && map_contains_key(col("old"), pk))
      .reduce(_ || _) && col(opCol) === "UPDATE"
    // old key = old[pk] where present else data[pk] (reference :444-447)
    val oldKeyData = map_from_arrays(
      typedLit(pkCols),
      array(pkCols.map(pk =>
        coalesce(element_at(col("old"), pk), element_at(col("data"), pk))): _*))
    val deleteRow = struct(
      lit("DELETE").as(opCol), oldKeyData.as("data"),
      lit(0).as("__sub"))
    val upsertRow = struct(
      col(opCol).as(opCol), col("data").as("data"), lit(1).as("__sub"))
    val passRow = struct(col(opCol).as(opCol), col("data").as("data"), lit(0).as("__sub"))
    val emitted = when(isPkChange, array(deleteRow, upsertRow)).otherwise(array(passRow))
    val keep = singles.columns.filterNot(c => c == opCol || c == "data").map(col)
    singles
      .select(keep :+ explode(emitted).as("__e"): _*)
      .select(keep ++ Seq(col(s"__e.$opCol").as(opCol), col("__e.data").as("data"),
        col("__e.__sub").as("sub_seq")): _*)
  }
}
