package graft.queries

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.concurrent.TrieMap

/**
 * Session-scoped materialized intermediates. The minhash pipeline runs ONCE
 * per (session, input dir); `dedup_minhash`, `dedup_clusters` and
 * `pipeline_training_set` all consume the verified near-dup pair set as an
 * *input stage* — in a production pipeline that table is written once and
 * read by every consumer, so the in-session equivalent is a cached
 * DataFrame. The computation itself stays independently gated: LlmSpec
 * re-derives the pairs from scratch and compares against both the exact
 * inverted-index join and this cache.
 */
object Materialized {
  private val pairCache = TrieMap.empty[(String, String), DataFrame]

  def minhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    pairCache.getOrElseUpdate((spark.sparkContext.applicationId, sfDir), {
      // materialize=true: eagerly populate the (tiny) pair cache, then free
      // the signature-table intermediates — they must not accumulate across
      // a 56-query bench run
      Dedup.minhashLsh(Tables.documents(spark, sfDir), "doc_id", "text",
        shingleN = 3, bands = 32, rowsPerBand = 4, threshold = 0.8,
        materialize = true)
    })

  private val embCache = TrieMap.empty[(String, String), DataFrame]

  /** Banded-LSH embedding pair table at the lowest consumed threshold
    * (cosine ≥ 0.3, recall 1 at 0.3 per the banding analysis in
    * [[Dedup.embeddingNearDupLsh]]): `dedup_embedding` filters it at 0.45,
    * `sim_ann_lsh` summarizes it at 0.3 — one banded join per session. */
  def embeddingPairs(spark: SparkSession, sfDir: String): DataFrame =
    embCache.getOrElseUpdate((spark.sparkContext.applicationId, sfDir), {
      val r = Dedup.embeddingNearDupLsh(Tables.embeddings(spark, sfDir),
        "vec_id", "embedding", dims = 64, threshold = 0.3).persist()
      r.count() // eager (tiny verified-pair table; intermediates are unpersisted-free)
      r
    })
}
