package graft

import graft.llm.Similarity
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: 1-bit axis-sign vs densified 2-bit Hamming prefilter
  * recall@5 against exact kNN ground truth, at a given SF dir. */
object RecallProbeMain {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, d)
    val qs = emb.where(col("vec_id") % 97 === 3)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.knnJoin(emb, qs, "vec_id", "embedding",
      "vec_id", k = 5))
    for (os <- Seq(2, 4, 8)) {
      val r1 = (pairs(Similarity.knnJoinHamming(emb, qs, "vec_id",
        "embedding", "vec_id", k = 5, dims = 64, oversample = os))
        & truth).size.toDouble / truth.size
      val r2 = (pairs(Similarity.knnJoinHamming(emb, qs, "vec_id",
        "embedding", "vec_id", k = 5, dims = 64, oversample = os,
        bitsPerDim = 2)) & truth).size.toDouble / truth.size
      val r3 = (pairs(Similarity.knnJoinHammingAdc(emb, qs, "vec_id",
        "embedding", "vec_id", k = 5, dims = 64, oversample = os))
        & truth).size.toDouble / truth.size
      println(f"oversample=$os%d  1-bit recall@5=$r1%.3f  2-bit recall@5=$r2%.3f  adc recall@5=$r3%.3f  (n=${truth.size})")
    }
    spark.stop()
  }
}
