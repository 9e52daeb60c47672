package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/**
 * Streaming exact dedup: the FIRST occurrence of each content hash across
 * the life of the stream is the keeper; every later arrival is judged a
 * duplicate of it. The streaming counterpart of
 * [[graft.llm.Dedup.dedupIncremental]] — a continuous document feed is
 * deduped batch-over-batch without ever re-scanning the corpus, because
 * the corpus IS the state: one (hash → keeper id) marker per distinct
 * document in the executor state store (RocksDB-backed on a real
 * cluster), partitioned by hash, no text retained, no driver state.
 *
 * Unlike Spark's built-in `dropDuplicates` (which keeps equivalent state)
 * this emits an audit row for EVERY arrival — keeper id and verdict —
 * so downstream can count/route duplicates, and an at-least-once replay
 * of the keeper re-emits `keep = true` (judgment is a pure function of
 * state), keeping the output idempotent under source replay.
 */
object StreamingDedup {

  final case class Doc(docId: Long, contentHash: String)
  final case class Seen(keeperId: Long)
  final case class Judged(docId: Long, keeperId: Long, keep: Boolean)

  implicit val docEnc: Encoder[Doc] = Encoders.product[Doc]
  implicit val seenEnc: Encoder[Seen] = Encoders.product[Seen]
  implicit val judgedEnc: Encoder[Judged] = Encoders.product[Judged]
  implicit val stringEnc: Encoder[String] = Encoders.STRING

  /** Per-hash judgment: min-id within the first batch elects the keeper;
    * afterwards the stored keeper wins forever. */
  def judge(hash: String, rows: Iterator[Doc],
            state: GroupState[Seen]): Iterator[Judged] = {
    val batch = rows.toSeq.sortBy(_.docId)
    if (batch.isEmpty) Iterator.empty
    else state.getOption match {
      case Some(s) =>
        batch.iterator.map(d => Judged(d.docId, s.keeperId, d.docId == s.keeperId))
      case None =>
        val keeper = batch.head.docId
        state.update(Seen(keeper))
        batch.iterator.map(d => Judged(d.docId, keeper, d.docId == keeper))
    }
  }

  /** Wire the stateful dedup over a stream of pre-hashed docs. */
  def judged(docs: Dataset[Doc]): Dataset[Judged] =
    docs.groupByKey(_.contentHash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(judge _)
}
