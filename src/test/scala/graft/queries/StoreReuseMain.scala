package graft.queries
import org.apache.spark.sql.SparkSession

/**
 * One half of the cross-PROCESS store-reuse proof (driven by
 * [[graft.queries.StoreReuseE2eSpec]], which runs this main twice in
 * separate JVMs): a "restart" is a genuinely fresh process, not a
 * same-JVM cache clear, so the reuse path exercised is exactly what a
 * production job sees after its driver restarts.
 *
 * Usage: `StoreReuseMain <storeRoot> <sfDir>` — consumes the minhash pair
 * table, the IVF index, the PQ code table, the OPQ-rotated code table, the
 * content-hash table, the BPE merge list, the unigram LM, and the trained
 * classifier weights against `storeRoot`, then prints
 * `builds=<n> minhash=<rows> ivf=<rows> pq=<rows> opq=<rows>
 * hashes=<rows> bpe=<rows> lm=<rows> clf=<rows> dsir=<rows>` on the LAST stdout line. The
 * first run builds (`builds>0`); a rerun in a new process must print
 * `builds=0` (everything served from storage).
 */
object StoreReuseMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: StoreReuseMain <storeRoot> <sfDir>")
    val Array(storeRoot, sfDir) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.materialized.dir", storeRoot)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val minhash = Materialized.minhashPairs(spark, sfDir).count()
    val idx = Materialized.ivfIndex(spark, sfDir)
    val ivf = idx.assignment.count()
    val pq = Materialized.pqCodes(spark, sfDir).count()
    val opq = Materialized.opqCodes(spark, sfDir).count()
    val hashes = Materialized.contentHashes(spark, sfDir).count()
    val bpe = Materialized.bpeMerges(spark, sfDir).count()
    val lm = Materialized.lmUnigrams(spark, sfDir).count()
    val clf = Materialized.clfWeights(spark, sfDir).count()
    val dsir = Materialized.dsirRatios(spark, sfDir).count()
    val uni = Materialized.unigramPieces(spark, sfDir).count()
    val wfp = Materialized.winnowFps(spark, sfDir).count()
    val kn = Materialized.knTypes(spark, sfDir).count()
    val ham = Materialized.hammingSigs(spark, sfDir).count()
    val builds = Materialized.buildsStarted.get()
    spark.stop()
    println(s"builds=$builds minhash=$minhash ivf=$ivf pq=$pq opq=$opq hashes=$hashes bpe=$bpe lm=$lm clf=$clf dsir=$dsir uni=$uni wfp=$wfp kn=$kn ham=$ham")
  }
}
