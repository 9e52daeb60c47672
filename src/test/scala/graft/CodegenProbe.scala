package graft

import graft.llm.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val sig = e.select(Similarity.lshBandSignature(col("v"), 64, 3, 64).as("s"))
    sig.select(sum(element_at(col("s"), 1))).collect() // warm
    val t0 = System.nanoTime()
    var i = 0
    while (i < 5) { sig.select(sum(element_at(col("s"), 1))).collect(); i += 1 }
    println(f"5 runs: ${(System.nanoTime() - t0) / 1e9}%.3fs")
    spark.stop()
  }
}
