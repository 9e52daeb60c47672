package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * P2/P3 — PK-hash partition routing (reference
 * `service/PhoenixSyncService.java:609-628` `pkHash` +`:206-220` routing):
 * `concurrent: true` routes each row-change to one of N worker queues by
 * `abs(sum(pk.hashCode)) % N`, guaranteeing per-key serial order while
 * parallelizing across keys; `concurrent: false` sends everything to
 * partition 0 (global serial order, `:213-220`).
 *
 * Spark-native: same-key→same-partition is exactly `HashPartitioning`, so
 * `repartition(n, keys…)` is the whole operator. The *invariant* (key
 * affinity) is what matters, not the reference's specific Java
 * `String.hashCode` mix — Spark's Murmur3 gives better spread at 1000
 * executors. Within a partition, apply order is restored by sorting on the
 * carried order key ([[graft.transform.DmlTransforms.withOrderKey]]) —
 * `sortWithinPartitions` is a local sort, no extra shuffle.
 */
object PkHash {

  /** Deterministic partition id for a row, exposed as a column (useful for
    * audits/tests of the affinity invariant). */
  def partitionId(keys: Seq[Column], numPartitions: Int): Column =
    pmod(hash(keys: _*), lit(numPartitions))

  /** Route for concurrent apply: hash-partition by PK, restore order inside
    * each partition. */
  def routeConcurrent(df: DataFrame, pkCols: Seq[String], numPartitions: Int,
                      orderCols: Seq[String]): DataFrame =
    df.repartition(numPartitions, pkCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)

  /** P3 — global serial order (`concurrent: false`). */
  def routeSerial(df: DataFrame, orderCols: Seq[String]): DataFrame =
    df.repartition(1).sortWithinPartitions(orderCols.map(col): _*)
}
