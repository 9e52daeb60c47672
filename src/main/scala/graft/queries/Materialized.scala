package graft.queries

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.collection.concurrent.TrieMap

/**
 * Storage-materialized pipeline intermediates — the production shape for
 * pair tables: the expensive candidate-generation + verification join runs
 * ONCE per (corpus, configuration) and its verified output is written to
 * parquet; every consumer (`dedup_minhash`, `dedup_clusters`,
 * `pipeline_training_set`, `dedup_embedding`) reads the written table, and a
 * RESTARTED session finds it on storage and skips the computation entirely.
 * At 100 TB this is not an optimization but the only viable shape — a
 * near-dup pair table feeds many downstream jobs across days, and each one
 * re-deriving it would re-pay the dominant shuffle of the whole pipeline.
 *
 * Store layout: `<root>/v<FormatVersion>/<kind>_<corpusFp>_<config>/`
 * (parquet dir with `_SUCCESS`), plus `<...>.json` for scalar summaries.
 *  - `root` comes from `spark.graft.materialized.dir` (default: a
 *    `graft-materialized` dir under `java.io.tmpdir`); production would
 *    point it at shared storage (HDFS/S3 + a table format with a real
 *    commit protocol — the local-FS equivalent here is write-to-temp +
 *    atomic directory rename, so a killed writer never leaves a
 *    half-visible table).
 *  - `corpusFp` fingerprints the input table's files (name, size, mtime):
 *    regenerated inputs get a fresh key instead of stale reuse.
 *  - `config` pins the operator parameters; [[FormatVersion]] must be
 *    bumped when stored SEMANTICS change so old rounds' tables can't leak
 *    into new code.
 *
 * The computation stays independently gated: LlmSpec re-derives pairs from
 * scratch and compares against the exact joins; MaterializedSpec proves the
 * write-once/read-many contract (a fresh consumer reuses the stored table
 * without rebuilding).
 */
object Materialized {

  /** Bump when the stored pair-table or summary semantics change. */
  private val FormatVersion = 1

  /** Build count, exposed so MaterializedSpec can prove storage reuse
    * (a second consumer must NOT increment it). */
  private[queries] val buildsStarted = new java.util.concurrent.atomic.AtomicInteger()

  // in-session handle caches (the parquet scan is cheap, but consumers call
  // these per query — keep one DataFrame/stats handle per store path)
  private val dfCache = TrieMap.empty[String, DataFrame]
  private val statsCache = TrieMap.empty[String, EmbeddingPairStats]

  /** Test hook: drop in-session handles so the next call exercises the
    * storage-read path like a fresh session would. */
  private[queries] def clearSessionCache(): Unit = {
    dfCache.clear(); statsCache.clear()
  }

  private def storeRoot(spark: SparkSession): Path =
    Paths.get(spark.conf.get("spark.graft.materialized.dir",
      Paths.get(sys.props("java.io.tmpdir"), "graft-materialized").toString))

  /** Fingerprint of the input table's storage files — (relative name, size,
    * mtime) of every file under `<sfDir>/<table>.parquet`, hashed. Local-FS
    * walk (the corpus is a driver-provided directory); a production store
    * would use the catalog's snapshot/version id instead. */
  private def corpusFingerprint(sfDir: String, table: String): String = {
    val p = Paths.get(sfDir, s"$table.parquet")
    val entries =
      if (!Files.exists(p)) Seq(s"absent:$p")
      else if (Files.isDirectory(p)) {
        val s = Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(Files.isRegularFile(_)).map { f =>
            s"${p.relativize(f)}:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}"
          }.toSeq.sorted
        } finally s.close()
      } else Seq(s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update((p.toAbsolutePath.toString +: entries).mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.sorted(Comparator.reverseOrder[Path]()).iterator().asScala
          .foreach(Files.deleteIfExists(_))
      } finally s.close()
    }

  /** Staging leftovers older than this are fair game for the sweep below —
    * age-gated so a live concurrent writer's staging dir is never touched. */
  private val StaleTmpMs = 60L * 60 * 1000

  /** Remove `<dest>.tmp-*` siblings abandoned by a writer killed between
    * its parquet write and the atomic publish — otherwise each crash leaks
    * a full-size staged copy of the table under the store root. */
  private def sweepStaleTmp(dest: Path): Unit = {
    val parent = dest.getParent
    if (parent != null && Files.isDirectory(parent)) {
      val prefix = dest.getFileName.toString + ".tmp-"
      val cutoff = System.currentTimeMillis() - StaleTmpMs
      val s = Files.list(parent)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith(prefix))
          .filter(p => try Files.getLastModifiedTime(p).toMillis < cutoff
            catch { case _: java.io.IOException => false })
          .foreach(deleteRecursively)
      } finally s.close()
    }
  }

  /** Atomically publish `tmp` as `dest`: rename wins or loses cleanly — if
    * another writer published first, keep theirs and drop ours. */
  private def publish(tmp: Path, dest: Path): Unit =
    try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException => deleteRecursively(tmp)
      case e: java.nio.file.FileSystemException =>
        if (Files.exists(dest)) deleteRecursively(tmp) else throw e
    }

  /** Write-once / read-many parquet table: build + write on first use (per
    * corpus fingerprint + config, atomic publish), read back everywhere
    * else — including a fresh session after restart. `build`'s result is
    * unpersisted after the write (no-op if it wasn't cached), so builders
    * may hand back their eagerly-cached form. */
  private def parquetBacked(spark: SparkSession, kind: String, config: String,
                            sfDir: String, inputTable: String,
                            partitionCols: Seq[String] = Nil)
                           (build: => DataFrame): DataFrame = {
    val dir = storeRoot(spark).resolve(s"v$FormatVersion")
      .resolve(s"${kind}_${corpusFingerprint(sfDir, inputTable)}_$config")
    dfCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}|$dir", {
      if (!Files.exists(dir.resolve("_SUCCESS"))) {
        buildsStarted.incrementAndGet()
        Files.createDirectories(dir.getParent)
        sweepStaleTmp(dir)
        val tmp = dir.getParent.resolve(
          s"${dir.getFileName}.tmp-${java.util.UUID.randomUUID()}")
        val df = build
        val w = df.write.mode("overwrite")
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .parquet(tmp.toString)
        df.unpersist()
        publish(tmp, dir)
      }
      spark.read.parquet(dir.toString)
    })
  }

  /** Verified MinHash(128)+LSH(32×4) near-dup pair table at J ≥ 0.8 over
    * `documents` — written once, read by `dedup_minhash`, `dedup_clusters`
    * and `pipeline_training_set`. */
  def minhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    parquetBacked(spark, "minhash_pairs", "n3_b32_r4_t080", sfDir, "documents") {
      // materialize=true: eagerly cache the (tiny) verified pair set and
      // free the signature/shingle intermediates before the parquet write
      Dedup.minhashLsh(Tables.documents(spark, sfDir), "doc_id", "text",
        shingleN = 3, bands = 32, rowsPerBand = 4, threshold = 0.8,
        materialize = true)
    }

  /** Exact word-3-gram Jaccard pair table at J ≥ 0.6 (inverted-index /
    * PPJoin adaptive join) — `dedup_ngram_jaccard` reads it. */
  def ngramPairs(spark: SparkSession, sfDir: String): DataFrame =
    parquetBacked(spark, "ngram_pairs", "n3_t060", sfDir, "documents") {
      Dedup.ngramJaccard(Tables.documents(spark, sfDir), "doc_id", "text",
        shingleN = 3, threshold = 0.6, materialize = true)
    }

  /** SimHash(60-bit) pair table at hamming ≤ 3 (pigeonhole banding,
    * exact) — `dedup_simhash` reads it. */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    parquetBacked(spark, "simhash_pairs", "h3_b60", sfDir, "documents") {
      Dedup.simhashPairs(Tables.documents(spark, sfDir), "doc_id", "text",
        maxHamming = 3, materialize = true)
    }

  /** Banded-LSH embedding near-dup pair table at the CONSUMED threshold
    * (cosine ≥ 0.45, banding recall 1 there — see
    * [[Dedup.embeddingNearDupLsh]]) — `dedup_embedding` reads it as-is.
    * Storing at the consumed threshold (not a lower build threshold) keeps
    * the stored table small: at scale the ≥0.3 pair set is enormously
    * larger and nothing reads it as rows — its summary is
    * [[embeddingPairStats]], a streaming aggregate that never materializes
    * the pairs at all. */
  def embeddingPairs(spark: SparkSession, sfDir: String): DataFrame =
    parquetBacked(spark, "emb_pairs", "d64_t045_r3b64", sfDir, "embeddings") {
      Dedup.embeddingNearDupLsh(Tables.embeddings(spark, sfDir),
        "vec_id", "embedding", dims = 64, threshold = 0.45)
    }

  /** The two stored tables of an IVF index: `assignment` is
    * `(id, centroid_id, dist, norm, v)` PARTITIONED BY `centroid_id`
    * (searches prune to the probed cells' files); `centroids` is the
    * trained `(centroid_id, vec)` sidecar, unrounded. */
  final case class IvfIndex(assignment: DataFrame, centroids: DataFrame)

  /**
   * Stored IVF index over `embeddings`: k-means centroids trained ONCE
   * ([[graft.llm.Similarity.ivfTrainCentroids]], the expensive Lloyd
   * iterations), then every vector written into its cell —
   * `partitionBy(centroid_id)`, so the directory layout IS the inverted
   * file and a probed-cell search scans only `nprobe/k` of the corpus via
   * partition pruning. Keyed like every other store entry (corpus
   * fingerprint + (k, iters) config): a regenerated corpus or changed
   * config builds a fresh index instead of serving a stale one.
   */
  def ivfIndex(spark: SparkSession, sfDir: String,
               k: Int = 8, iters: Int = 2): IvfIndex = {
    val cfg = s"k${k}_i$iters"
    val cents = parquetBacked(spark, "ivf_centroids", cfg, sfDir, "embeddings") {
      graft.llm.Similarity.ivfTrainCentroids(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", k, iters)
    }
    val assignment = parquetBacked(spark, "ivf_index", cfg, sfDir, "embeddings",
        partitionCols = Seq("centroid_id")) {
      graft.llm.Similarity.ivfIndexRows(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", cents)
    }
    // the partition column round-trips through directory names (inferred
    // int) — restore the build-time long type and column order for consumers
    IvfIndex(
      assignment.select(col("id"), col("centroid_id").cast("long").as("centroid_id"),
        col("dist"), col("norm"), col("v")),
      cents)
  }

  /** Pair-table summary at the ANN search threshold (cosine ≥ 0.3).
    * `minCosine` is None on a corpus with no pairs ≥ 0.3. */
  final case class EmbeddingPairStats(nPairs: Long, minCosine: Option[Double])

  /**
   * (count, min cosine) of the banded-LSH pair set at cosine ≥ 0.3 —
   * `sim_ann_lsh`'s conformance summary. Computed by ONE streaming
   * aggregation over the banded join's output (the ≥0.3 pair set is never
   * persisted or written — at low thresholds it approaches n²/2 rows and
   * only this scalar summary is consumed), then stored as a JSON sidecar so
   * restarts and repeat calls read two numbers instead of re-running the
   * join.
   */
  def embeddingPairStats(spark: SparkSession, sfDir: String): EmbeddingPairStats = {
    val file = storeRoot(spark).resolve(s"v$FormatVersion").resolve(
      s"emb_pair_stats_${corpusFingerprint(sfDir, "embeddings")}_d64_t030_r3b64.json")
    statsCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}|$file", {
      if (Files.exists(file)) parseStats(Files.readString(file))
      else {
        buildsStarted.incrementAndGet()
        val row = Dedup.embeddingNearDupLsh(Tables.embeddings(spark, sfDir),
            "vec_id", "embedding", dims = 64, threshold = 0.3)
          .agg(count(lit(1)).as("n"), min(col("cosine")).as("m"))
          .head()
        val stats = EmbeddingPairStats(row.getLong(0),
          Option(row.getAs[java.lang.Double]("m")).map(_.doubleValue))
        Files.createDirectories(file.getParent)
        sweepStaleTmp(file)
        val tmp = file.getParent.resolve(
          s"${file.getFileName}.tmp-${java.util.UUID.randomUUID()}")
        Files.writeString(tmp, renderStats(stats))
        publish(tmp, file)
        stats
      }
    })
  }

  // scalar JSON sidecar: Double.toString round-trips exactly, so the stored
  // minCosine is bit-identical after a restart
  private def renderStats(s: EmbeddingPairStats): String =
    s"""{"nPairs":${s.nPairs},"minCosine":${s.minCosine.map(_.toString).getOrElse("null")}}"""

  private def parseStats(json: String): EmbeddingPairStats = {
    val re = """\{"nPairs":(\d+),"minCosine":(null|[-0-9.eE]+)\}""".r
    json.trim match {
      case re(n, m) =>
        EmbeddingPairStats(n.toLong,
          if (m == "null") None else Some(java.lang.Double.parseDouble(m)))
      case other =>
        throw new IllegalStateException(s"corrupt pair-stats sidecar: $other")
    }
  }
}
