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

  /** Pair-table summary computed once at materialization time (the pair
    * table at t=0.3 is large enough that re-scanning the cache for a
    * count+min costs seconds — consumers that only need the summary read
    * this instead). `minCosine` is None on a corpus with no pairs ≥ 0.3. */
  final case class EmbeddingPairStats(nPairs: Long, minCosine: Option[Double])

  private val embCache = TrieMap.empty[(String, String), (DataFrame, EmbeddingPairStats)]

  private def embeddingPairsWithStats(spark: SparkSession,
                                      sfDir: String): (DataFrame, EmbeddingPairStats) =
    embCache.getOrElseUpdate((spark.sparkContext.applicationId, sfDir), {
      val r = Dedup.embeddingNearDupLsh(Tables.embeddings(spark, sfDir),
        "vec_id", "embedding", dims = 64, threshold = 0.3).persist()
      // the eager action doubles as the summary pass: one scan populates the
      // cache AND yields (count, min) so summary consumers never rescan
      val row = r.agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.col("cosine")).as("m")).head()
      val stats = EmbeddingPairStats(row.getLong(0),
        Option(row.getAs[java.lang.Double]("m")).map(_.doubleValue))
      (r, stats)
    })

  /** Banded-LSH embedding pair table at the lowest consumed threshold
    * (cosine ≥ 0.3, recall 1 at 0.3 per the banding analysis in
    * [[Dedup.embeddingNearDupLsh]]): `dedup_embedding` filters it at 0.45,
    * `sim_ann_lsh` summarizes it at 0.3 — one banded join per session. */
  def embeddingPairs(spark: SparkSession, sfDir: String): DataFrame =
    embeddingPairsWithStats(spark, sfDir)._1

  /** The (count, min-cosine) summary of [[embeddingPairs]], free after the
    * first materialization. */
  def embeddingPairStats(spark: SparkSession, sfDir: String): EmbeddingPairStats =
    embeddingPairsWithStats(spark, sfDir)._2
}
