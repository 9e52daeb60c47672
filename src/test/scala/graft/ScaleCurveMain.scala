package graft

import graft.llm.Dedup
import graft.queries.{LlmQueries, Materialized, Tables}
import org.apache.spark.sql.SparkSession

/** Dev harness: empirical scale curve for the dedup/ANN family across
  * sf0.001 / sf0.01 / sf0.1 — wall time + candidate/pair counts, the
  * datapoints behind BASELINE.md's growth table. */
object ScaleCurveMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the curve measures the JOINS, not parquet reads: an isolated store
    // root per run keeps the persistent pair store (shared default under
    // java.io.tmpdir) from serving a previous run's tables
    spark.conf.set("spark.graft.materialized.dir",
      java.nio.file.Files.createTempDirectory("graft-scale-curve").toString)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      val nDocs = Tables.documents(spark, d).count()
      val nVecs = Tables.embeddings(spark, d).count()
      val (mh, tMh) = timed(Materialized.minhashPairs(spark, d).count())
      // the emb03 curve column is the LIVE t=0.3 banded join (the stored
      // table moved to the consumed 0.45 threshold in round 5 — reading it
      // here would silently change what this column has measured since r3)
      val (emb, tEmb) = timed(Dedup.embeddingNearDupLsh(
        Tables.embeddings(spark, d), "vec_id", "embedding",
        dims = 64, threshold = 0.3).count())
      val planted = LlmQueries.plantedEmbeddings(spark, d)
      val nPlanted = planted.count()
      val (cand90, tCand) = timed(Dedup.embeddingLshCandidates(
        planted, "vec_id", "embedding", dims = 64, planesPerBand = 8, bands = 32).count())
      val (t90, tT90) = timed(Dedup.embeddingNearDupLsh(planted, "vec_id", "embedding",
        dims = 64, threshold = 0.9, planesPerBand = 8, bands = 32).count())
      // deep-banding production config: 2,048 planes through the typed kernel
      val (candDeep, tCandDeep) = timed(Dedup.embeddingLshCandidates(
        planted, "vec_id", "embedding", dims = 64, planesPerBand = 16, bands = 128).count())
      val (tDeep, tTDeep) = timed(Dedup.embeddingNearDupLsh(planted, "vec_id", "embedding",
        dims = 64, threshold = 0.9, planesPerBand = 16, bands = 128).count())
      val (cl, tCl) = timed(Dedup.duplicateClusters(
        Materialized.minhashPairs(spark, d),
        Tables.documents(spark, d).select(
          org.apache.spark.sql.functions.col("doc_id").as("id"))).count())
      println(f"$sf docs=$nDocs vecs=$nVecs | minhash pairs=$mh ${tMh}%.2fs | " +
        f"emb03 pairs=$emb ${tEmb}%.2fs | t90 n=$nPlanted cand=$cand90 ${tCand}%.2fs " +
        f"verified=$t90 ${tT90}%.2fs | deep(r16b128) cand=$candDeep ${tCandDeep}%.2fs " +
        f"verified=$tDeep ${tTDeep}%.2fs prune=${nPlanted * (nPlanted - 1) / 2.0 / candDeep}%.0fx | " +
        f"clusters rows=$cl ${tCl}%.2fs")
    }
    spark.stop()
  }
}
