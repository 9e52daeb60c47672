package graft.queries

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.concurrent.TrieMap

/**
 * Session-scoped materialized intermediates. Downstream queries
 * (`dedup_clusters`, `pipeline_training_set`) consume the verified near-dup
 * pair set as an *input stage* — in a production pipeline that table is
 * written once and read by every consumer, so the in-session equivalent is
 * a cached DataFrame keyed by (session, input dir). `dedup_minhash` itself
 * does NOT use this cache: it is the query that gates the computation.
 */
object Materialized {
  private val pairCache = TrieMap.empty[(String, String), DataFrame]

  def minhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    pairCache.getOrElseUpdate((spark.sparkContext.applicationId, sfDir), {
      Dedup.minhashLsh(Tables.documents(spark, sfDir), "doc_id", "text",
        shingleN = 3, bands = 32, rowsPerBand = 4, threshold = 0.8).persist()
    })
}
