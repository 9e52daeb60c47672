package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/**
 * Stateful streaming CDC materialization: maintain the latest row per key
 * *across* micro-batches with `mapGroupsWithState` — the Structured
 * Streaming state-store counterpart of [[graft.cdc.CdcApply.latestState]]
 * (which folds a bounded log). Emits one change record per key per batch
 * (upsert post-image or tombstone), i.e. a changelog the JDBC sink can apply
 * idempotently.
 *
 * Scale: state lives in the executor state store (RocksDB-backed on a real
 * cluster), partitioned by key — no driver state, no full-table rescan per
 * batch. Event-time ordering inside a batch is resolved by `orderKey`;
 * across batches by arrival (source offsets), matching the reference's
 * at-least-once replay model.
 */
object StatefulLatest {

  final case class KeyedOp(key: String, orderKey: Long, op: String, payload: String)
  final case class KeyState(orderKey: Long, op: String, payload: String)
  final case class Change(key: String, op: String, payload: String)

  implicit val keyedOpEnc: Encoder[KeyedOp] = Encoders.product[KeyedOp]
  implicit val stateEnc: Encoder[KeyState] = Encoders.product[KeyState]
  implicit val changeEnc: Encoder[Change] = Encoders.product[Change]
  implicit val stringEnc: Encoder[String] = Encoders.STRING

  /** Per-key state update: keep the greatest-orderKey op seen so far. */
  def updateKey(key: String, rows: Iterator[KeyedOp],
                state: GroupState[KeyState]): Iterator[Change] = {
    val incoming = rows.toSeq
    if (incoming.isEmpty) Iterator.empty
    else {
      val last = incoming.maxBy(r => (r.orderKey, r.op)) // total order within batch
      val current = state.getOption
      if (current.forall(_.orderKey <= last.orderKey)) {
        state.update(KeyState(last.orderKey, last.op, last.payload))
        if (last.op == "DELETE") Iterator.single(Change(key, "DELETE", null))
        else Iterator.single(Change(key, "UPSERT", last.payload))
      } else Iterator.empty // stale replay — state already newer (idempotent)
    }
  }

  /** Wire the stateful operator over a stream of keyed ops. */
  def changes(ops: Dataset[KeyedOp]): Dataset[Change] =
    ops.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(updateKey _)
}
