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
    val modes = Set("crossover-only", "knn-ivf-only", "knn-dist-only", "knn-pq-only",
      "split-only", "bloom-only", "semantic-only", "million-vec-only",
      "million-floor-only", "million-lean-only", "million-ivfpq-only",
      "million-sdc-only", "tenmillion-doc-only", "regimes-only",
      "admission-only", "winnow-only", "cdc-only", "hotgram-only",
      "gear-only", "phash-only", "simhash-only", "adc-only", "sdc-opq-only",
      "frames-only", "hybrid-only", "adc-state-only", "cell-state-only",
      "cell-recall-only", "sq8-only", "million-sq8-only")
    require(args.forall(modes.contains), s"unknown args: ${args.mkString(" ")}; modes: $modes")
    val sfs = if (args.isEmpty) Seq("sf0.001", "sf0.01", "sf0.1") else Nil
    sfs.foreach { sf =>
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
    if (args.contains("knn-ivf-only")) knnIvf55k(spark)
    else if (args.contains("knn-dist-only")) knnDist55k(spark)
    else if (args.contains("knn-pq-only")) knnPq55k(spark)
    else if (args.contains("split-only")) splitSkew55k(spark)
    else if (args.contains("bloom-only")) bloom500k(spark)
    else if (args.contains("semantic-only")) semantic55k(spark)
    else if (args.contains("million-vec-only")) millionVec(spark)
    else if (args.contains("regimes-only")) knnRegimes55k(spark)
    else if (args.contains("million-floor-only")) millionFloor(spark)
    else if (args.contains("million-lean-only")) millionLean(spark)
    else if (args.contains("million-ivfpq-only")) millionIvfPq(spark)
    else if (args.contains("million-sdc-only")) millionSdc(spark)
    else if (args.contains("admission-only")) admission10M(spark)
    else if (args.contains("winnow-only")) winnow10M(spark)
    else if (args.contains("cdc-only")) cdc10M(spark)
    else if (args.contains("hotgram-only")) hotGram10M(spark)
    else if (args.contains("gear-only")) gear10M(spark)
    else if (args.contains("phash-only")) phash10M(spark)
    else if (args.contains("simhash-only")) simhash10M(spark)
    else if (args.contains("adc-only")) adcStored55k(spark)
    else if (args.contains("hybrid-only")) hybridStored55k(spark)
    else if (args.contains("adc-state-only")) adcStreamState(spark)
    else if (args.contains("cell-state-only")) cellStreamState(spark)
    else if (args.contains("cell-recall-only")) cellStreamRecall(spark)
    else if (args.contains("sq8-only")) sq8Stored55k(spark)
    else if (args.contains("million-sq8-only")) millionSq8(spark)
    else if (args.contains("sdc-opq-only")) sdcOpq55k(spark)
    else if (args.contains("frames-only")) frames10M(spark)
    else if (args.contains("tenmillion-doc-only")) tenMillionDocs(spark)
    else if (args.contains("crossover-only")) { crossover50k(spark); knn55k(spark) }
    else { crossover50k(spark); knn55k(spark); knnIvf55k(spark); knnDist55k(spark)
           knnPq55k(spark); bloom500k(spark) }
    spark.stop()
  }

  /**
   * The SemDeDup scale story: 55,550 vectors in 64 natural clusters
   * (deterministic anchors + per-vector perturbation, no RNG) with 550
   * planted near-copies. Clustering bounds the pair scan to the
   * within-cell mass — ~k× below all-pairs when occupancy is balanced —
   * and the measurement isolates the SemDeDup-specific phase (assignment
   * + within-cell scan + election) from Lloyd training, which the IVF
   * family already measures. Planted copies share their donor's anchor,
   * so within-cell recall on them is structural.
   */
  private def semantic55k(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.llm.{Dedup, Similarity}
    import spark.implicits._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = 55000; val dims = 64; val k = 64
    val anchors = Array.tabulate(k, dims)((a, d) => comp(1000000L + a.toLong * dims + d))
    val anchB = spark.sparkContext.broadcast(anchors)
    val base = spark.range(n).as[Long].map { i =>
      val a = (i % k).toInt
      (i, Array.tabulate(dims)(d => anchB.value(a)(d) + 0.5 * comp(i * dims + d)))
    }.toDF("vec_id", "embedding")
    val planted = spark.range(n / 100).as[Long].map { j =>
      val i = j * 100
      val a = (i % k).toInt
      (n + j, Array.tabulate(dims)(d => anchB.value(a)(d) + 0.5 * comp(i * dims + d) +
        0.005 * comp(900000000L + i * dims + d)))
    }.toDF("vec_id", "embedding")
    val emb = base.unionByName(planted)
    val cents = anchors.zipWithIndex
      .map { case (v, a) => (a.toLong, v.toSeq) }.toSeq.toDF("centroid_id", "vec")
    val e = emb.select(col("vec_id").as("id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val (assigned, tAssign) = timed {
      val a = Similarity.ivfAssign(e, "id", "v", cents)
        .select("id", "centroid_id").persist()
      a.count(); a
    }
    val occ = assigned.groupBy("centroid_id").count().collect().map(_.getLong(1))
    val cellMass = occ.map(c => c * (c - 1) / 2).sum
    val total = (n + n / 100).toLong
    val allMass = total * (total - 1) / 2
    val members = e.join(assigned, "id").select(col("id"), col("centroid_id"), col("v"))
    val (dups, tSem) = timed(
      Dedup.semanticDedupFromCells(members, threshold = 0.95)
        .where(!col("keep")).count())
    println(f"semantic55k n=$total k=$k | cell pair mass=$cellMass vs " +
      f"all-pairs=$allMass (${allMass.toDouble / cellMass}%.0fx prune) | " +
      f"assign ${tAssign}%.2fs | within-cell scan+elect ${tSem}%.2fs | " +
      f"dups=$dups (planted=${n / 100})")
    assigned.unpersist()
    ()
  }

  /**
   * The Bloom-gated incremental dedup scale story: a 500k-doc synthetic
   * corpus (deterministic texts, no RNG) and a 10k-doc batch carrying 1%
   * corpus dups. Measures the day-1 artifact costs (hash-table scan,
   * sketch fold and its byte size) and the day-2 judgment cost through
   * the hash view vs [[graft.llm.Dedup.dedupIncremental]]'s text-side
   * join path, asserting verdict-identical outputs. The headline number
   * is the candidate count: the sketch admits ~dups + fpp·|batch| rows
   * into the exact-confirm join instead of the whole batch.
   */
  private def bloom500k(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.llm.Dedup
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = 500000L
    def corpusText(id: org.apache.spark.sql.Column) =
      concat(lit("corpus document body text number "), id, lit(" tail"))
    val corpus = spark.range(n).select(col("id").as("doc_id"),
      corpusText(col("id")).as("text"))
    val batch = spark.range(9900).select((col("id") + 1000000L).as("doc_id"),
        concat(lit("batch novel content item "), col("id"), lit(" end")).as("text"))
      .unionByName(spark.range(100).select((col("id") + 2000000L).as("doc_id"),
        corpusText(col("id")).as("text")))
    def verdicts(r: org.apache.spark.sql.DataFrame): Map[String, Long] =
      r.groupBy("status").count().collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
    val (joinRes, tJoin) = timed(
      verdicts(Dedup.dedupIncremental(batch, corpus, "doc_id", "text")))
    // the stored-artifact emulation: the hash view exists before day 2
    val hashes = corpus.select(col("doc_id").as("id"),
      Dedup.contentHashSafe(col("text")).as("h")).persist()
    val (nh, tHash) = timed(hashes.count())
    val (bloom, tBloom) = timed(Dedup.bloomFromHashes(hashes, n, 0.01))
    val (cand, tCand) = timed(batch.where(Dedup.bloomMightContain(bloom,
      Dedup.contentHashSafe(col("text")))).count())
    val (bloomRes, tB) = timed(verdicts(
      Dedup.dedupIncrementalBloomFromHashes(batch, hashes, "doc_id", "text", n)))
    require(bloomRes == joinRes, s"verdicts diverge: $bloomRes vs $joinRes")
    println(f"bloom500k corpus=$nh batch=10000 | text-join path ${tJoin}%.2fs | " +
      f"hash-view scan ${tHash}%.2fs, sketch fold ${tBloom}%.2fs " +
      f"(${bloom.length}%d bytes) | candidates=$cand probe ${tCand}%.2fs | " +
      f"hash-view judgment ${tB}%.2fs | verdicts=$joinRes")
    hashes.unpersist()
    ()
  }

  /**
   * The split operator's scale story: a 55k-vector index where one cell
   * holds half the corpus (the shape a drifting append feed produces).
   * Measures the hot-query retrieval cost (256 hot-cluster queries,
   * nprobe=1, [[graft.llm.Similarity.knnJoinIvf]]) and the probed-cell
   * bytes BEFORE the split, the maintenance wall time
   * ([[Materialized.splitIvfCells]] to ≤30% max share), and the same
   * retrieval + bytes AFTER — per-query probe work and probed-partition
   * I/O should both drop roughly with the max-cell share, while the
   * result sets stay verdict-identical for queries whose true neighbors
   * share the probed cell.
   */
  private def splitSkew55k(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = 55000L
    val hot = n / 2
    // ids 0..7 are exact cluster centers (the trainer's id<k seeds); the
    // hot cluster 0 is bimodal (±0.3 on dim 1) so a local 2-means separates
    val base = spark.range(n).map { id =>
      val c = if (id < 8) id.toInt else if (id < hot) 0 else (1 + id % 7).toInt
      val v = Array.tabulate(64) { d =>
        val u = if (d == c * 8) 1.0 else 0.0
        val m = if (c == 0 && id >= 8 && d == 1)
          (if (id % 2 == 0) 0.3 else -0.3) else 0.0
        val j = if (id < 8) 0.0
          else 0.1 * (((mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble) - 0.5)
        u + m + j
      }
      (id, v)
    }.toDF("vec_id", "embedding")
    val sfDir = java.nio.file.Files.createTempDirectory("graft-split-curve-sf")
    base.write.parquet(sfDir.resolve("embeddings.parquet").toString)
    val d = sfDir.toString
    val (_, tBuild) = timed(Materialized.ivfIndex(spark, d))
    val idx = Materialized.ivfIndexCurrent(spark, d)
    def maxShare(a: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val occ = a.groupBy("centroid_id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val total = occ.map(_._2).sum.toDouble
      val (cid, c) = occ.maxBy(x => (x._2, -x._1))
      (cid, c / total)
    }
    val (hotCell, shareB) = maxShare(idx.assignment)
    val storeRoot = java.nio.file.Paths.get(
      spark.conf.get("spark.graft.materialized.dir"))
    def cellBytes(cid: Long): Long = {
      // the store root holds exactly one versioned dir (v<FormatVersion>)
      val v = {
        val l = java.nio.file.Files.list(storeRoot)
        try {
          import scala.jdk.CollectionConverters._
          l.iterator().asScala.filter(_.getFileName.toString.startsWith("v")).next()
        } finally l.close()
      }
      val s = java.nio.file.Files.list(v)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("ivf_index_"))
          .map(_.resolve(s"centroid_id=$cid"))
          .filter(java.nio.file.Files.isDirectory(_))
          .flatMap { p =>
            val w = java.nio.file.Files.walk(p)
            try w.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
              .map(java.nio.file.Files.size(_)).toList
            finally w.close()
          }.sum
      } finally s.close()
    }
    val bytesB = cellBytes(hotCell)
    val queries = base.where(col("vec_id") >= 1000 && col("vec_id") < 1256)
    val (nB, tBefore) = timed(graft.llm.Similarity.knnJoinIvf(
      idx.assignment, idx.centroids, queries, "vec_id", "embedding",
      k = 10, nprobe = 1).count())
    val (rep, tSplit) = timed(Materialized.splitIvfCells(spark, d, maxShare = 0.30))
    val cur = rep.index
    val (childCell, shareA) = maxShare(cur.assignment)
    val bytesA = cellBytes(childCell)
    val (nA, tAfter) = timed(graft.llm.Similarity.knnJoinIvf(
      cur.assignment, cur.centroids, queries, "vec_id", "embedding",
      k = 10, nprobe = 1).count())
    println(f"split-skew n=$n build=${tBuild}%.1fs | before: share=${shareB}%.3f " +
      f"cell=$hotCell bytes=$bytesB probe256(np1)=${tBefore}%.2fs rows=$nB | " +
      f"split ${rep.splitCells.size} cells in ${tSplit}%.1fs | after: " +
      f"share=${shareA}%.3f maxCell=$childCell bytes=$bytesA " +
      f"probe256(np1)=${tAfter}%.2fs rows=$nA")
  }

  /**
   * IVF-PQ batch retrieval ([[graft.llm.Similarity.knnJoinPq]]) vs the
   * full-precision distributed join over the same 60.5k stored index:
   * the PQ side scans only the cell-partitioned CODE table (8 code ids
   * per vector — the on-disk ratio is printed), ships no vectors, and
   * pays the ADC approximation; the measurement reports wall time at
   * growing Q plus the planted-copy recall through codes alone (an exact
   * copy shares its source's codes, so its ADC score ties the maximum —
   * the honest question is whether OTHER code cells beat it).
   */
  private def knnPq55k(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val base0 = spark.range(55000).map { id =>
      (id, Array.tabulate(64)(d =>
        (mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
    }.toDF("vec_id", "embedding")
    val planted = base0.unionByName(
      base0.where(col("vec_id") % 10 === 5)
        .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding")))
    val root = java.nio.file.Files.createTempDirectory("graft-knn-pq")
    val cents = graft.llm.Similarity.ivfTrainCentroids(
      base0, "vec_id", "embedding", k = 64, iters = 2)
    graft.llm.Similarity.ivfIndexRows(planted, "vec_id", "embedding", cents)
      .write.partitionBy("centroid_id").parquet(root.resolve("idx").toString)
    val index = spark.read.parquet(root.resolve("idx").toString)
    val books = graft.llm.Similarity.pqTrainCodebooks(
      base0, "vec_id", "embedding", m = 8, ksub = 16, iters = 2, dims = 64)
    graft.llm.Similarity.pqEncode(index, "id", "v", books, dims = 64,
        cellCol = Some("centroid_id"))
      .write.partitionBy("centroid_id").parquet(root.resolve("codes").toString)
    val codes = spark.read.parquet(root.resolve("codes").toString)
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    val (bi, bc) = (dirBytes(root.resolve("idx")), dirBytes(root.resolve("codes")))
    println(f"knn-pq n=${index.count()} bytes idx=$bi codes=$bc ratio=${bi.toDouble / bc}%.1fx")
    Seq(256, 4096).foreach { q =>
      val queries = index.where(col("id") < q)
        .select(col("id").as("vec_id"), col("v").as("embedding"))
      val (np, tp) = timed(graft.llm.Similarity.knnJoinPq(
        codes, books, cents, queries, "vec_id", "embedding", k = 10, nprobe = 4).count())
      val (nd, td) = timed(graft.llm.Similarity.knnJoinDistributed(
        index, cents, queries, "vec_id", "embedding", k = 10, nprobe = 4).count())
      println(f"knn-pq Q=$q k=10 nprobe=4 pq=${tp}%.1fs ($np rows) full=${td}%.1fs ($nd rows)")
    }
    // planted-copy retrieval through codes alone: does the source win rank 1?
    val plantedQ = index.where(col("id") >= 2000000L && col("id") < 2002560L)
      .select(col("id").as("vec_id"), col("v").as("embedding"))
    val nQ = plantedQ.count()
    val (hits, tr) = timed(graft.llm.Similarity.knnJoinPq(
        codes, books, cents, plantedQ, "vec_id", "embedding", k = 1, nprobe = 4)
      .where(col("rank") === 1 && col("neighbor_id") === col("query_id") - 2000000L)
      .count())
    println(f"knn-pq planted recall@1 = $hits/$nQ (${tr}%.1fs)")
  }

  /**
   * Fully distributed IVF-probed kNN join ([[Similarity.knnJoinDistributed]])
   * vs the broadcast-heap variant ([[Similarity.knnJoinIvf]]) over the same
   * 60.5k stored cell-partitioned index at growing Q: at the heap variant's
   * comfort zone (Q=256) the broadcast shape should win (no probe window,
   * no candidate exchange); past its hard 4,096 bound only the distributed
   * shape runs at all — the measurement documents both the constant-factor
   * price of staying declarative and the scale regime that pays it.
   */
  private def knnDist55k(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val base0 = spark.range(55000).map { id =>
      (id, Array.tabulate(64)(d =>
        (mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
    }.toDF("vec_id", "embedding")
    val planted = base0.unionByName(
      base0.where(col("vec_id") % 10 === 5)
        .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding")))
    val root = java.nio.file.Files.createTempDirectory("graft-knn-dist")
    val cents = graft.llm.Similarity.ivfTrainCentroids(
      base0, "vec_id", "embedding", k = 64, iters = 2)
    graft.llm.Similarity.ivfIndexRows(planted, "vec_id", "embedding", cents)
      .write.partitionBy("centroid_id").parquet(root.resolve("idx").toString)
    val index = spark.read.parquet(root.resolve("idx").toString)
    val n = index.count()

    // correctness pin at Q=256: identical (query, neighbor, rank) sets
    val qs256 = index.where(col("id") < 256).select(col("id").as("vec_id"), col("v").as("embedding"))
    val heapSet = graft.llm.Similarity.knnJoinIvf(index, cents, qs256,
        "vec_id", "embedding", k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val distSet = graft.llm.Similarity.knnJoinDistributed(index, cents, qs256,
        "vec_id", "embedding", k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    println(s"knn-dist equality@Q=256: ${heapSet == distSet} (${distSet.size} rows)")

    Seq(256, 4096, 16384).foreach { q =>
      val queries = index.where(col("id") < q)
        .select(col("id").as("vec_id"), col("v").as("embedding"))
      val (nd, td) = timed(graft.llm.Similarity.knnJoinDistributed(
        index, cents, queries, "vec_id", "embedding", k = 10, nprobe = 4).count())
      val heapNote = if (q <= 4096) {
        val (nh, th) = timed(graft.llm.Similarity.knnJoinIvf(
          index, cents, queries, "vec_id", "embedding", k = 10, nprobe = 4).count())
        f"heap=${th}%.1fs ($nh rows)"
      } else "heap=n/a (beyond the 4,096 broadcast bound)"
      println(f"knn-dist n=$n Q=$q k=10 nprobe=4 dist=${td}%.1fs ($nd rows) $heapNote")
    }
  }

  /**
   * IVF-probed batch kNN join vs brute-force [[Similarity.knnJoin]] at
   * Q=256 over a 60.5k stored corpus (55k uniform + 10% planted exact
   * copies; flat parquet for brute, 64-cell-partitioned parquet for IVF —
   * BOTH sides pay their real storage read). Two query regimes:
   *
   *  - UNIFORM (first 256 vectors): queries scatter, the probe union
   *    covers every cell — no scan pruning; the win is cell-local scoring
   *    only (each row scores against ~Q·nprobe/cells queries, not Q).
   *    Uniform vectors are also IVF's worst case for generic recall
   *    (random-pair cosines concentrate near 0, true top-10 scatter
   *    across cells) — reported honestly, alongside the planted-copy
   *    recall@1, which is the dedup-shaped retrieval and probes its own
   *    cell by construction.
   *  - CLUSTERED (256 jittered perturbations of one corpus vector — the
   *    production retrieval shape: a batch of related queries): the probe
   *    union is a handful of cells, partition pruning skips the rest of
   *    the corpus files, and the scan cost itself collapses.
   */
  private def knnIvf55k(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val base0 = spark.range(55000).map { id =>
      (id, Array.tabulate(64)(d =>
        (mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
    }.toDF("vec_id", "embedding")
    val planted = base0.unionByName(
      base0.where(col("vec_id") % 10 === 5)
        .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding")))
    val root = java.nio.file.Files.createTempDirectory("graft-knn-ivf")
    planted.write.parquet(root.resolve("flat").toString)
    val corpus = spark.read.parquet(root.resolve("flat").toString)
    val cents = graft.llm.Similarity.ivfTrainCentroids(
      base0, "vec_id", "embedding", k = 64, iters = 2)
    val (_, tBuild) = timed(
      graft.llm.Similarity.ivfIndexRows(corpus, "vec_id", "embedding", cents)
        .write.partitionBy("centroid_id").parquet(root.resolve("idx").toString))
    val index = spark.read.parquet(root.resolve("idx").toString)
    val n = corpus.count()

    def run(label: String, queries: org.apache.spark.sql.DataFrame,
            checkPlanted: Boolean): Unit = {
      val (ivfRows, tIvf) = timed(graft.llm.Similarity.knnJoinIvf(
          index, cents, queries, "vec_id", "embedding", k = 10, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
      val (bruteRows, tBrute) = timed(graft.llm.Similarity.knnJoin(
          corpus, queries, "vec_id", "embedding", "vec_id", k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
      // recall over (query, neighbor) MEMBERSHIP, rank dropped: one missed
      // true neighbor shifts every later rank by one, and triple-equality
      // would cascade that single miss into up to k scored misses
      val ivfPairs = ivfRows.map(r => (r._1, r._2))
      val brutePairs = bruteRows.map(r => (r._1, r._2))
      val recall10 = ivfPairs.count(brutePairs.contains).toDouble / brutePairs.size
      val plantedNote = if (checkPlanted) {
        val ids = 5L until 256L by 10L
        val hit = ids.count(q => ivfRows.contains((q, q + 2000000L, 1L)))
        f" planted-copy recall@1=$hit/${ids.size}"
      } else ""
      println(f"knn-ivf[$label] n=$n Q=256 k=10 cells=64 nprobe=4 " +
        f"build=${tBuild}%.1fs ivf=${tIvf}%.1fs brute=${tBrute}%.1fs " +
        f"(${tBrute / tIvf}%.1fx) recall@10=${recall10}%.3f$plantedNote")
    }

    run("uniform", corpus.where(col("vec_id") < 256), checkPlanted = true)
    // clustered: 256 small deterministic perturbations of corpus vector 5
    val v5 = corpus.where(col("vec_id") === 5)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .head().getSeq[Double](0).toArray
    val clustered = spark.range(256).map { j =>
      (3000000L + j, Array.tabulate(64)(d => v5(d) +
        0.02 * ((mix64(j * 64L + d + 7777) >>> 11).toDouble / (1L << 53).toDouble - 0.5)))
    }.toDF("vec_id", "embedding")
    run("clustered", clustered, checkPlanted = false)
  }

  /**
   * The STORED binary-sketch ANN datapoint at the 55k uniform corpus
   * (the regimes corpus — structureless, the sign sketch's worst case):
   * build the `(id, sig, slo, shi)` signature table once
   * ([[graft.llm.Similarity.hammingSigRows]], written to parquet — the
   * readers pay real storage I/O), then measure recall@10 and wall time
   * of the sketch-reading SDC ([[graft.llm.Similarity
   * .knnJoinHammingFromSigs]], 2-bit) and ADC ([[graft.llm.Similarity
   * .knnJoinHammingAdcFromSigs]]) cuts at oversample 4/8/16 against the
   * exact [[graft.llm.Similarity.knnJoin]] ground truth. Also prints the
   * bytes story: sig-store size vs flat corpus size (the stage-1
   * probed-bytes ratio the ring's 100 TB claim rests on).
   */
  private def adcStored55k(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val base = spark.range(55000).map { id =>
      (id, Array.tabulate(64)(d =>
        (mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
    }.toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-adc-stored")
    base.write.parquet(root.resolve("flat").toString)
    val corpus = spark.read.parquet(root.resolve("flat").toString)
    val (_, tSig) = timed(
      graft.llm.Similarity.hammingSigRows(corpus, "vec_id", "embedding", dims = 64)
        .write.parquet(root.resolve("sigs").toString))
    val sigs = spark.read.parquet(root.resolve("sigs").toString)
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    val (bFlat, bSigs) = (dirBytes(root.resolve("flat")), dirBytes(root.resolve("sigs")))
    println(f"adc-stored n=55000 sig-build=${tSig}%.1fs bytes flat=$bFlat " +
      f"sigs=$bSigs (${bFlat.toDouble / bSigs}%.1fx)")
    val queries = corpus.where(col("vec_id") < 32)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (truth, tExact) = timed(pairs(graft.llm.Similarity.knnJoin(
      corpus, queries, "vec_id", "embedding", "vec_id", k = 10)))
    Seq(4, 8, 16).foreach { os =>
      val (sdc, tSdc) = timed(pairs(graft.llm.Similarity.knnJoinHammingFromSigs(
        corpus, sigs, queries, "vec_id", "embedding", "vec_id", k = 10,
        dims = 64, oversample = os, bitsPerDim = 2)))
      val (adc, tAdc) = timed(pairs(graft.llm.Similarity.knnJoinHammingAdcFromSigs(
        corpus, sigs, queries, "vec_id", "embedding", "vec_id", k = 10,
        dims = 64, oversample = os)))
      println(f"adc-stored Q=32 k=10 os=$os | " +
        f"sdc2 ${tSdc}%.1fs recall=${(sdc & truth).size.toDouble / truth.size}%.3f | " +
        f"adc ${tAdc}%.1fs recall=${(adc & truth).size.toDouble / truth.size}%.3f | " +
        f"exact ${tExact}%.1fs")
    }
  }

  /**
   * The streaming-ADC STATE-BYTES datapoint — the 16× state-cut claim
   * measured from the state store's own accounting, not schema
   * arithmetic: ingest UNIQUE vectors (no dups, so every arrival
   * registers — the worst-case state the claim is about) through
   * [[graft.streaming.StreamingEmbDedupAdc]] (16-byte sketch per
   * keeper per band) and its parent [[graft.streaming.StreamingEmbDedup]]
   * (full 512-byte vector per keeper per band), same banding geometry
   * (8 bands × 16 planes — 65k keys/band keeps bucket occupancy ~15 at
   * 1M, the production-shaped dial for unique-heavy feeds), and read
   * `stateOperators.memoryUsedBytes` / `numRowsTotal` from the query
   * progress. The ADC stream runs at 1M arrivals; the parent at 250k
   * (its 1M state would be ~4 GB of vectors — the point being made);
   * bytes/row is the size-independent comparison, and the parent's 1M
   * projection is printed from it.
   */
  private def adcStreamState(spark: SparkSession): Unit = {
    import spark.implicits._
    def gen(n: Int) = spark.range(n.toLong).map { id =>
      (id, Array.tabulate(64)(d =>
        (mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
    }.toDF("vecId", "vec")
    val bands = 8
    def measure(label: String, n: Int,
                judge: org.apache.spark.sql.Dataset[graft.streaming.StreamingEmbDedup.VecDoc]
                  => org.apache.spark.sql.Dataset[_]): (Long, Long) = {
      val root = java.nio.file.Files.createTempDirectory(s"adc-state-$label")
      gen(n).coalesce(8).write.parquet(root.resolve("in").toString)
      val t0 = System.nanoTime()
      val q = judge(
          spark.readStream.schema("vecId LONG, vec ARRAY<DOUBLE>")
            .parquet(root.resolve("in").toString)
            .as[graft.streaming.StreamingEmbDedup.VecDoc])
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[_], _: Long) =>
          df.count(); ()
        }
        .start()
      q.processAllAvailable()
      val states = q.recentProgress.toSeq.flatMap(_.stateOperators)
      // numRowsTotal counts state-store rows = BUCKETS (one AdcBucket/
      // EmbBucket per touched band key); the per-KEEPER-entry figure
      // divides by the known entry count — every arrival is unique here,
      // so entries = arrivals × bands exactly
      val buckets = states.map(_.numRowsTotal).max
      val bytes = states.map(_.memoryUsedBytes).max
      q.stop()
      val entries = n.toLong * bands
      println(f"adc-state[$label] arrivals=$n entries=$entries " +
        f"buckets=$buckets state-bytes=$bytes " +
        f"(${bytes.toDouble / entries}%.0f B/entry) " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.0fs")
      (entries, bytes)
    }
    val (aEntries, aBytes) = measure("adc-1m", 1000000,
      graft.streaming.StreamingEmbDedupAdc(bands = bands, planesPerBand = 16).judged)
    val (pEntries, pBytes) = measure("parent-250k", 250000,
      graft.streaming.StreamingEmbDedup(bands = bands, planesPerBand = 16).judged)
    val aPer = aBytes.toDouble / aEntries
    val pPer = pBytes.toDouble / pEntries
    println(f"adc-state ratio: parent ${pPer}%.0f B/entry vs adc " +
      f"${aPer}%.0f B/entry = ${pPer / aPer}%.1fx measured (schema " +
      f"32 B vs 528 B = 16.5x; store map/seq overhead is shared); " +
      f"parent@1M projected ${pPer * aEntries / 1e9}%.2f GB vs adc@1M " +
      f"measured ${aBytes / 1e9}%.2f GB")
  }

  /**
   * Total-state datapoint for the CELL-partitioned streaming dedup
   * ([[graft.streaming.StreamingEmbDedupCell]]) at 1M arrivals, against
   * the band-ADC stream at the same 128-plane sketch width: the band
   * family registers each keeper once per band (8 entries here), the
   * cell stream exactly ONCE, in its argmin cell — the claim is an
   * ENTRIES cut on top of the ADC stream's per-entry bytes cut, measured
   * from the state store's own accounting (`memoryUsedBytes`), not
   * schema arithmetic. C = 4096 uniform centroids (the same mix64
   * generator, negative key space so they are independent of the
   * arrivals); nprobe = 1 — nprobe scales probe WORK, not state. All 1M
   * vectors are unique isotropic-random (pairwise cosine ~ N(0, 1/64),
   * never near the 0.9 threshold), so every arrival registers —
   * worst-case state on both sides.
   */
  private def cellStreamState(spark: SparkSession): Unit = {
    import spark.implicits._
    def gen(n: Int) = spark.range(n.toLong).map { id =>
      (id, Array.tabulate(64)(d =>
        (mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
    }.toDF("vecId", "vec")
    val bands = 8
    val cents = Array.tabulate(4096)(c => (c.toLong, Array.tabulate(64)(d =>
      (mix64(-(c.toLong * 64L + d) - 1L) >>> 11).toDouble / (1L << 53).toDouble - 0.5)))
    def measure(label: String, n: Int, entriesPerArrival: Int,
                judge: org.apache.spark.sql.Dataset[graft.streaming.StreamingEmbDedup.VecDoc]
                  => org.apache.spark.sql.Dataset[_]): (Long, Long) = {
      val root = java.nio.file.Files.createTempDirectory(s"cell-state-$label")
      gen(n).coalesce(8).write.parquet(root.resolve("in").toString)
      val t0 = System.nanoTime()
      val q = judge(
          spark.readStream.schema("vecId LONG, vec ARRAY<DOUBLE>")
            .parquet(root.resolve("in").toString)
            .as[graft.streaming.StreamingEmbDedup.VecDoc])
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[_], _: Long) =>
          df.count(); ()
        }
        .start()
      q.processAllAvailable()
      val states = q.recentProgress.toSeq.flatMap(_.stateOperators)
      // numRowsTotal counts state-store rows: CELLS here, band buckets
      // for the ADC stream; per-keeper-entry bytes divide by the known
      // entry count (every arrival is unique → registers exactly
      // entriesPerArrival entries)
      val groups = states.map(_.numRowsTotal).max
      val bytes = states.map(_.memoryUsedBytes).max
      q.stop()
      val entries = n.toLong * entriesPerArrival
      println(f"cell-state[$label] arrivals=$n entries=$entries " +
        f"groups=$groups state-bytes=$bytes " +
        f"(${bytes.toDouble / entries}%.0f B/entry, " +
        f"${bytes.toDouble / n}%.0f B/keeper) " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.0fs")
      (entries, bytes)
    }
    val (cEntries, cBytes) = measure("cell-1m", 1000000, 1,
      graft.streaming.StreamingEmbDedupCell(cents, nprobe = 1).judged)
    val (aEntries, aBytes) = measure("adc-1m", 1000000, bands,
      graft.streaming.StreamingEmbDedupAdc(bands = bands, planesPerBand = 16).judged)
    println(f"cell-state ratio: adc ${aBytes.toDouble / 1000000}%.0f B/keeper " +
      f"(${aEntries} entries) vs cell ${cBytes.toDouble / 1000000}%.0f B/keeper " +
      f"(${cEntries} entries) = ${aBytes.toDouble / cBytes}%.1fx measured " +
      f"total-state cut at equal sketch width (entries cut $bands x; " +
      f"the trade is recall geometry: band-LSH corpus-independent vs " +
      f"cell-quality-dependent, the batch hybrid grid's axis)")
  }

  /**
   * Streaming dedup RECALL trade at the 55k corpus — the honest side of
   * the cell stream's 9.4× state cut: 500 planted near-dups (per-dim
   * perturbation 10% of the dim's scale → true cosine ≈ 0.995) arrive
   * one micro-batch AFTER their keepers; recall = planted dups judged
   * dup OF THEIR OWN KEEPER. [[graft.streaming.StreamingEmbDedupCell]]
   * at nprobe 1/2/4 over k-means-trained cells (C=64, the hybrid grid's
   * config) vs [[graft.streaming.StreamingEmbDedupAdc]] at the deep
   * 8×16 banding — on BOTH corpus shapes (uniform = weak cells, the
   * cell stream's null case; anisotropic 2^(−d/8) = cells carry real
   * structure). A planted dup can only match if its nprobe probes reach
   * the keeper's home cell, so uniform-corpus misses here ARE the
   * cell-boundary crossings the batch grid's cell-miss axis measures;
   * the band stream's recall is corpus-independent (`1 − (1 − p^r)^b`)
   * by construction. `wrong-keeper` counts planted dups that matched an
   * ORGANIC near-neighbor instead (not an error — the dedup verdict is
   * "is there any keeper within threshold", the pair label is just the
   * plant); `kept` counts planted dups that matched nothing.
   */
  private def cellStreamRecall(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val nPlanted = 500
    def run(label: String, scale: Int => Double): Unit = {
      def vec(id: Long) = Array.tabulate(64)(d => scale(d) *
        ((mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
      val base = spark.range(55000).map(id => (id, vec(id))).toDF("vecId", "vec")
      val dups = spark.range(nPlanted.toLong).map { i =>
        val keeper = i * 100L
        val v = vec(keeper)
        val d = Array.tabulate(64)(dd => v(dd) + 0.1 * scale(dd) *
          ((mix64(-(i * 64L + dd) - 7L) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
        (1000000L + i, d)
      }.toDF("vecId", "vec")
      val cents = graft.llm.Similarity.ivfTrainCentroids(
        base.select(col("vecId").as("vec_id"), col("vec").as("embedding")),
        "vec_id", "embedding", k = 64, iters = 2)
      def measure(cfg: String,
                  judge: org.apache.spark.sql.Dataset[graft.streaming.StreamingEmbDedup.VecDoc]
                    => org.apache.spark.sql.Dataset[_]): Unit = {
        val root = java.nio.file.Files.createTempDirectory(s"cell-recall-$label")
        val in = root.resolve("in").toString
        base.coalesce(8).write.mode("append").parquet(in)
        val sunk = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long], Boolean)]()
        val t0 = System.nanoTime()
        val q = judge(
            spark.readStream.schema("vecId LONG, vec ARRAY<DOUBLE>")
              .parquet(in).as[graft.streaming.StreamingEmbDedup.VecDoc])
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .foreachBatch { (df: org.apache.spark.sql.Dataset[_], _: Long) =>
            graft.streaming.StreamingNearDedup.verdicts(df.toDF()).collect().foreach { r =>
              sunk.add((r.getLong(0),
                if (r.isNullAt(1)) None else Some(r.getLong(1)),
                r.getBoolean(3)))
            }
          }
          .start()
        q.processAllAvailable() // micro-batch 1: keepers register
        dups.coalesce(1).write.mode("append").parquet(in)
        q.processAllAvailable() // micro-batch 2: planted dups probe
        q.stop()
        val wall = (System.nanoTime() - t0) / 1e9
        import scala.jdk.CollectionConverters._
        val out = sunk.iterator().asScala.toSeq
        val planted = out.filter(_._1 >= 1000000L)
        val right = planted.count(r => r._2.contains((r._1 - 1000000L) * 100L))
        val wrong = planted.count(r => r._2.isDefined &&
          !r._2.contains((r._1 - 1000000L) * 100L))
        val kept = planted.count(_._3)
        val keptB1 = out.count(r => r._1 < 1000000L && r._3)
        println(f"cell-recall[$label/$cfg] planted=$nPlanted " +
          f"recall=${right.toDouble / nPlanted}%.3f wrong-keeper=$wrong " +
          f"kept=$kept corpus-keeps=$keptB1/55000 wall=$wall%.0fs")
      }
      Seq(1, 2, 4).foreach { np =>
        measure(s"cell-np$np",
          graft.streaming.StreamingEmbDedupCell.fromCentroids(cents, nprobe = np).judged)
      }
      measure("adc-8x16",
        graft.streaming.StreamingEmbDedupAdc(bands = 8, planesPerBand = 16).judged)
    }
    run("uniform", _ => 1.0)
    run("aniso", d => math.pow(2.0, -d / 8.0))
  }

  /**
   * The HYBRID (IVF × binary-sketch) datapoint at the 55k corpus — the
   * composed dial measured, not formula'd: build the cell-partitioned
   * raw-sketch and residual-sketch stores once (written to parquet —
   * the searches pay real partition-pruned storage I/O), then sweep the
   * nprobe × oversample grid against brute-force ground truth, with
   * every miss decomposed into CELL-miss (the true neighbor's cell was
   * not probed — `nprobe`'s axis; no oversample can recover it) vs
   * SKETCH-miss (probed but cut by the Hamming rank — `oversample`'s
   * axis). The flat stored-sig search at the same oversamples is the
   * crossover reference (what the partition pruning trades recall
   * against). Two corpus shapes, the `sdc-opq` discipline: UNIFORM
   * (isotropic — cells absorb little variance, the residual refinement's
   * null case) and ANISOTROPIC (per-dim scale 2^(−d/8) — cells carry
   * real structure, the residual sketch's actual premise).
   */
  private def hybridStored55k(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    def run(label: String, scale: Int => Double,
            grid: Seq[(Int, Int)], flatOs: Seq[Int]): Unit = {
      val base = spark.range(55000).map { id =>
        (id, Array.tabulate(64)(d => scale(d) *
          ((mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5)))
      }.toDF("vec_id", "embedding")
      val root = java.nio.file.Files.createTempDirectory(s"graft-hybrid-$label")
      base.write.parquet(root.resolve("flat").toString)
      val corpus = spark.read.parquet(root.resolve("flat").toString)
      val cents = graft.llm.Similarity.ivfTrainCentroids(
        base, "vec_id", "embedding", k = 64, iters = 2)
      // raw-sketch cell store: codes + assignment, partitioned by cell
      val (_, tRaw) = timed(
        graft.llm.Similarity.hammingSigRows(corpus, "vec_id", "embedding", dims = 64)
          .join(graft.llm.Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
            .select(col("id"), col("centroid_id")), "id")
          .write.partitionBy("centroid_id").parquet(root.resolve("rawsigs").toString))
      val rawSigs = spark.read.parquet(root.resolve("rawsigs").toString)
      // residual-sketch cell store (assignment inside the builder)
      val (_, tRes) = timed(
        graft.llm.Similarity.hammingResidualSigRows(corpus, "vec_id", "embedding",
            cents, dims = 64)
          .write.partitionBy("centroid_id").parquet(root.resolve("ressigs").toString))
      val resSigs = spark.read.parquet(root.resolve("ressigs").toString)
      // flat sig store for the crossover reference
      graft.llm.Similarity.hammingSigRows(corpus, "vec_id", "embedding", dims = 64)
        .write.parquet(root.resolve("sigs").toString)
      val flatSigs = spark.read.parquet(root.resolve("sigs").toString)
      println(f"hybrid[$label] n=55000 cells=64 store-build raw=${tRaw}%.1fs " +
        f"res=${tRes}%.1fs bytes flat=${dirBytes(root.resolve("flat"))} " +
        f"rawsigs=${dirBytes(root.resolve("rawsigs"))} " +
        f"ressigs=${dirBytes(root.resolve("ressigs"))}")
      val queries = corpus.where(col("vec_id") < 32)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (truth, tExact) = timed(pairs(graft.llm.Similarity.knnJoin(
        corpus, queries, "vec_id", "embedding", "vec_id", k = 10)))
      // driver-side replicas for the miss decomposition: the true
      // neighbors' cells and each query's probed-cell ladder (the house
      // (dist, cid) probe rule)
      val centArr = cents.select(col("centroid_id").cast("long"), col("vec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
      val truthIds = truth.map(_._2).toSeq.distinct
      val cellOf = rawSigs.select(col("id"), col("centroid_id").cast("long"))
        .where(col("id").isin(truthIds: _*))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val qVecs = queries.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
      def probedSet(qid: Long, np: Int): Set[Long] = {
        val va = qVecs(qid)
        centArr.map { case (cid, cv) =>
            var s = 0.0; var i = 0
            while (i < cv.length) { val dx = cv(i) - va(i); s += dx * dx; i += 1 }
            (cid, s)
          }.sortBy { case (cid, dist) => (dist, cid) }.take(np)
          .map(_._1).toSet
      }
      def sweep(variant: String,
                search: (Int, Int) => org.apache.spark.sql.DataFrame): Unit =
        grid.foreach { case (np, os) =>
          val (got, t) = timed(pairs(search(np, os)))
          val misses = truth -- got
          val cellMiss = misses.count { case (q, n) =>
            !probedSet(q, np).contains(cellOf(n)) }
          val recall = (got & truth).size.toDouble / truth.size
          println(f"hybrid[$variant,$label] Q=32 k=10 np=$np os=$os ${t}%.1fs " +
            f"recall@10=$recall%.3f misses=${misses.size} " +
            f"cell=$cellMiss sketch=${misses.size - cellMiss}")
        }
      sweep("raw", (np, os) => graft.llm.Similarity.knnJoinHammingIvf(
        rawSigs, corpus, cents, queries, "vec_id", "embedding", "vec_id",
        k = 10, dims = 64, nprobe = np, oversample = os))
      sweep("res", (np, os) => graft.llm.Similarity.knnJoinHammingIvfRes(
        resSigs, corpus, cents, queries, "vec_id", "embedding", "vec_id",
        k = 10, dims = 64, nprobe = np, oversample = os))
      // crossover: the flat stored-sig search (no cell pruning, sketch
      // recall only) at the same oversamples
      flatOs.foreach { os =>
        val (got, t) = timed(pairs(graft.llm.Similarity.knnJoinHammingFromSigs(
          corpus, flatSigs, queries, "vec_id", "embedding", "vec_id",
          k = 10, dims = 64, oversample = os, bitsPerDim = 2)))
        println(f"hybrid[flat,$label] Q=32 k=10 os=$os ${t}%.1fs " +
          f"recall@10=${(got & truth).size.toDouble / truth.size}%.3f " +
          f"(exact ${tExact}%.1fs)")
      }
    }
    run("uniform", _ => 1.0,
      grid = for (np <- Seq(1, 2, 4, 8); os <- Seq(4, 8, 16)) yield (np, os),
      flatOs = Seq(4, 8, 16))
    run("aniso", d => math.pow(2.0, -d / 8.0),
      grid = for (np <- Seq(1, 2, 4, 8); os <- Seq(8)) yield (np, os),
      flatOs = Seq(8))
  }

  /**
   * The SQ8-rerank story at 55k on BOTH corpus shapes: what does
   * replacing the exact-cosine rerank with the stored int8 rerank cost
   * in recall, and what does it buy in bytes? Stores built once per
   * shape (flat raw vectors / 16-byte sketches / 80-byte int8 codes /
   * cell-partitioned residual sketches); the FLAT ladder sweeps
   * oversample for exact-rerank vs SQ-rerank reading the SAME stage-1
   * candidates, the COMPOSED ladder sweeps nprobe at fixed oversample
   * for the residual hybrid's exact vs SQ rerank. Recall is vs the
   * brute-force float truth, so the printed delta IS the int8 cost at
   * the ranking level (stage-1 candidacy is shared by construction);
   * bytes are the on-disk store sizes — the all-stored searches read
   * sigs + codes and never the flat store.
   */
  private def sq8Stored55k(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    def run(label: String, scale: Int => Double): Unit = {
      val base = spark.range(55000).map { id =>
        (id, Array.tabulate(64)(d => scale(d) *
          ((mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5)))
      }.toDF("vec_id", "embedding")
      val root = java.nio.file.Files.createTempDirectory(s"graft-sq8-$label")
      base.write.parquet(root.resolve("flat").toString)
      val corpus = spark.read.parquet(root.resolve("flat").toString)
      graft.llm.Similarity.hammingSigRows(corpus, "vec_id", "embedding", dims = 64)
        .write.parquet(root.resolve("sigs").toString)
      val sigs = spark.read.parquet(root.resolve("sigs").toString)
      val (_, tCodes) = timed(
        graft.llm.Similarity.q8CodeRows(corpus, "vec_id", "embedding")
          .write.parquet(root.resolve("codes").toString))
      val codes = spark.read.parquet(root.resolve("codes").toString)
      val cents = graft.llm.Similarity.ivfTrainCentroids(
        base, "vec_id", "embedding", k = 64, iters = 2)
      graft.llm.Similarity.hammingResidualSigRows(corpus, "vec_id", "embedding",
          cents, dims = 64)
        .write.partitionBy("centroid_id").parquet(root.resolve("ressigs").toString)
      val resSigs = spark.read.parquet(root.resolve("ressigs").toString)
      graft.llm.Similarity.q8CodeRows(corpus, "vec_id", "embedding")
        .join(graft.llm.Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
          .select(col("id"), col("centroid_id")), "id")
        .write.partitionBy("centroid_id").parquet(root.resolve("cellcodes").toString)
      val cellCodes = spark.read.parquet(root.resolve("cellcodes").toString)
      println(f"sq8[$label] n=55000 code-build=${tCodes}%.1fs bytes " +
        f"flat=${dirBytes(root.resolve("flat"))} " +
        f"sigs=${dirBytes(root.resolve("sigs"))} " +
        f"codes=${dirBytes(root.resolve("codes"))} " +
        f"ressigs=${dirBytes(root.resolve("ressigs"))}")
      val queries = corpus.where(col("vec_id") < 32)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (truth, tExact) = timed(pairs(graft.llm.Similarity.knnJoin(
        corpus, queries, "vec_id", "embedding", "vec_id", k = 10)))
      def recall(got: Set[(Long, Long)]) = (got & truth).size.toDouble / truth.size
      // FLAT ladder: exact rerank vs SQ rerank over the same stage-1 cut
      Seq(4, 8, 16).foreach { os =>
        val (ex, tEx) = timed(pairs(graft.llm.Similarity.knnJoinHammingFromSigs(
          corpus, sigs, queries, "vec_id", "embedding", "vec_id",
          k = 10, dims = 64, oversample = os, bitsPerDim = 2)))
        val (sq, tSq) = timed(pairs(graft.llm.Similarity.knnJoinHammingSqFromSigs(
          codes, sigs, queries, "embedding", "vec_id",
          k = 10, dims = 64, oversample = os)))
        println(f"sq8[flat,$label] Q=32 k=10 os=$os exact=${recall(ex)}%.3f " +
          f"${tEx}%.1fs sq=${recall(sq)}%.3f ${tSq}%.1fs " +
          f"rankmoved=${(ex -- sq).size} (brute ${tExact}%.1fs)")
      }
      // COMPOSED ladder: the residual hybrid's exact vs SQ rerank
      Seq(1, 2, 4, 8).foreach { np =>
        val (ex, tEx) = timed(pairs(graft.llm.Similarity.knnJoinHammingIvfRes(
          resSigs, corpus, cents, queries, "vec_id", "embedding", "vec_id",
          k = 10, dims = 64, nprobe = np, oversample = 8)))
        val (sq, tSq) = timed(pairs(graft.llm.Similarity.knnJoinHammingIvfResSq(
          cellCodes, resSigs, cents, queries, "embedding", "vec_id",
          k = 10, dims = 64, nprobe = np, oversample = 8)))
        println(f"sq8[res,$label] Q=32 k=10 np=$np os=8 exact=${recall(ex)}%.3f " +
          f"${tEx}%.1fs sq=${recall(sq)}%.3f ${tSq}%.1fs " +
          f"rankmoved=${(ex -- sq).size}")
      }
    }
    run("uniform", _ => 1.0)
    run("aniso", d => math.pow(2.0, -d / 8.0))
  }

  /**
   * The OPQ-vs-plain SDC graph contrast on BOTH corpus shapes at 55k/64
   * cells: UNIFORM (isotropic — a variance-equalizing rotation has
   * nothing to fix; the honest null result) and ANISOTROPIC (per-dim
   * scale `2^(−d/8)` — variance concentrated in the low dims, the
   * documented failure mode of plain residual PQ's blind subspace
   * split, and OPQ's actual premise). Measurement: top-1 agreement of
   * each code-space graph with its float graph, same geometry and
   * bytes, only the rotation differing.
   */
  private def sdcOpq55k(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(label: String, scale: Int => Double): Unit = {
      val base = spark.range(55000).map { id =>
        (id, Array.tabulate(64)(d => scale(d) *
          ((mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5)))
      }.toDF("vec_id", "embedding").persist()
      base.count()
      val cents = graft.llm.Similarity.ivfTrainCentroids(
        base, "vec_id", "embedding", k = 64, iters = 2)
      val index = graft.llm.Similarity.ivfIndexRows(base, "vec_id", "embedding", cents)
        .persist()
      index.count()
      val g = graft.llm.Similarity.knnGraph(index, cents, k = 10).persist()
      g.count()
      def top1(df: org.apache.spark.sql.DataFrame) =
        df.where(col("rank") === 1).select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
      val f1 = top1(g)
      val res = graft.llm.Similarity.ivfResiduals(
        index.select(col("id"), col("centroid_id"), col("v")), cents)
      def agree(rot: Option[Array[Double]]): (Double, Double) = {
        val r2 = rot.map(s => graft.llm.Similarity.opqRotateResiduals(res, s))
          .getOrElse(res)
        val books = graft.llm.Similarity.pqTrainCodebooks(r2, "id", "rv",
          m = 8, ksub = 16, iters = 2, dims = 64)
        val codes = graft.llm.Similarity.pqEncode(r2, "id", "rv", books,
          dims = 64, cellCol = Some("centroid_id"))
        val (s1, t) = timed(top1(graft.llm.Similarity.knnGraphSdc(
          codes, books, cents, k = 10, rotation = rot)))
        (f1.count { case (q, n) => s1.get(q).contains(n) }.toDouble / f1.size, t)
      }
      val signs = graft.llm.Similarity.opqSigns(64, 17L)
      val (aPlain, tPlain) = agree(None)
      val (aOpq, tOpq) = agree(Some(signs))
      println(f"sdc-opq[$label] n=55000 cells=64 k=10 " +
        f"top1-agree plain=$aPlain%.3f (${tPlain}%.1fs) " +
        f"opq=$aOpq%.3f (${tOpq}%.1fs)")
      g.unpersist(); index.unpersist(); base.unpersist()
    }
    run("uniform", _ => 1.0)
    run("aniso", d => math.pow(2.0, -d / 8.0))
  }

  /** One-scan batch retrieval vs Q repeated scans: [[Similarity.knnJoin]]
    * at Q=32, k=10 over a 55k synthetic corpus against a driver loop of
    * [[Similarity.topK]] — the wall-clock evidence for the broadcast-heap
    * shape (the loop re-scans and re-projects the corpus Q times). */
  private def knn55k(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val base = spark.range(55000).map { id =>
      (id, Array.tabulate(64)(d =>
        (mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
    }.toDF("vec_id", "embedding").persist()
    base.count()
    val queries = base.where(col("vec_id") < 32)
    val (nJoin, tJoin) = timed(graft.llm.Similarity.knnJoin(
      base, queries, "vec_id", "embedding", "vec_id", k = 10).count())
    val qvs = queries.as[(Long, Array[Double])].collect()
    val (nLoop, tLoop) = timed(qvs.map { case (qid, v) =>
      graft.llm.Similarity.topK(base, "vec_id", "embedding", v.toSeq,
        k = 10, excludeId = Some(qid)).count()
    }.sum)
    println(f"knn n=55000 Q=32 k=10 join=$nJoin (${tJoin}%.1fs) " +
      f"loop=$nLoop (${tLoop}%.1fs, ${tLoop / tJoin}%.1fx slower)")
    base.unpersist()
  }

  /**
   * The round-9 ANN regimes at the 55k corpus: the 1-bit Hamming
   * prefilter (bytes story: 8 B signature vs 512 B vector per scanned
   * row; recall vs the exact join is the honest cost) and the corpus-wide
   * kNN graph (the per-cell quadratic bounded by the cell dial; mutual
   * fraction is the symmetrization yield).
   */
  private def knnRegimes55k(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val base = spark.range(55000).map { id =>
      (id, Array.tabulate(64)(d =>
        (mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
    }.toDF("vec_id", "embedding").persist()
    base.count()
    val queries = base.where(col("vec_id") < 32)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (truth, tExact) = timed(pairs(graft.llm.Similarity.knnJoin(
      base, queries, "vec_id", "embedding", "vec_id", k = 10)))
    Seq(4, 16).foreach { os =>
      val (got, tHam) = timed(pairs(graft.llm.Similarity.knnJoinHamming(
        base, queries, "vec_id", "embedding", "vec_id", k = 10, dims = 64,
        oversample = os)))
      println(f"knn-regimes hamming n=55000 Q=32 k=10 os=$os ${tHam}%.1fs " +
        f"(exact ${tExact}%.1fs) recall=${(got & truth).size.toDouble / truth.size}%.3f")
    }
    val (cents, tTrain) = timed {
      val c = graft.llm.Similarity.ivfTrainCentroids(
        base, "vec_id", "embedding", k = 64, iters = 2)
      c.count(); c
    }
    val index = graft.llm.Similarity.ivfIndexRows(base, "vec_id", "embedding", cents)
      .persist()
    val g = graft.llm.Similarity.knnGraph(index, cents, k = 10).persist()
    val (edges, tGraph) = timed(g.count())
    val mutual = g.where(col("mutual")).count()
    println(f"knn-regimes graph n=55000 cells=64 k=10 edges=$edges " +
      f"(${tGraph}%.1fs, train ${tTrain}%.1fs) mutual=${mutual * 100.0 / edges}%.1f%%")
    // SDC twin: the same cell-local graph scored purely in residual-PQ
    // code space — measure build wall + top-1 agreement with the float
    // graph (the quantization trade the regime buys its 64x byte cut with)
    val idxSlim = index.select(col("id"), col("centroid_id"), col("v"))
    val res = graft.llm.Similarity.ivfResiduals(idxSlim, cents)
    val (books, tPq) = timed {
      val b = graft.llm.Similarity.pqTrainCodebooks(res, "id", "rv",
        m = 8, ksub = 16, iters = 2, dims = 64)
      b.count(); b
    }
    val codes = graft.llm.Similarity.pqEncode(res, "id", "rv", books,
      dims = 64, cellCol = Some("centroid_id"))
    val gs = graft.llm.Similarity.knnGraphSdc(codes, books, cents, k = 10).persist()
    val (sdcEdges, tSdc) = timed(gs.count())
    def top1(df: org.apache.spark.sql.DataFrame) =
      df.where(col("rank") === 1).select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    val f1 = top1(g); val s1 = top1(gs)
    val agree = f1.count { case (q, n) => s1.get(q).contains(n) }
    println(f"knn-regimes sdc-graph n=55000 cells=64 k=10 edges=$sdcEdges " +
      f"(${tSdc}%.1fs, pq-train ${tPq}%.1fs) " +
      f"top1-agree=${agree.toDouble / f1.size}%.3f vs float graph")
    // OPQ-rotated twin at the SAME bytes (sign-flip + Walsh–Hadamard
    // before PQ): the dial against plain residual PQ's documented top-1
    // weakness on structureless corpora — measured, not assumed
    val signs = graft.llm.Similarity.opqSigns(64, 17L)
    val resRot = graft.llm.Similarity.opqRotateResiduals(res, signs)
    val (booksR, tPqR) = timed {
      val b = graft.llm.Similarity.pqTrainCodebooks(resRot, "id", "rv",
        m = 8, ksub = 16, iters = 2, dims = 64)
      b.count(); b
    }
    val codesR = graft.llm.Similarity.pqEncode(resRot, "id", "rv", booksR,
      dims = 64, cellCol = Some("centroid_id"))
    val gr = graft.llm.Similarity.knnGraphSdc(codesR, booksR, cents, k = 10,
      rotation = Some(signs)).persist()
    val (rotEdges, tRot) = timed(gr.count())
    val r1 = top1(gr)
    val agreeR = f1.count { case (q, n) => r1.get(q).contains(n) }
    println(f"knn-regimes sdc-graph-opq n=55000 cells=64 k=10 edges=$rotEdges " +
      f"(${tRot}%.1fs, pq-train ${tPqR}%.1fs) " +
      f"top1-agree=${agreeR.toDouble / f1.size}%.3f vs float graph " +
      f"(plain sdc ${agree.toDouble / f1.size}%.3f)")
    gr.unpersist(); gs.unpersist(); g.unpersist(); index.unpersist(); base.unpersist()
  }

  /**
   * The ≥1M-vector validation pass: do the 55k–500k crossover numbers
   * hold an order of magnitude up? One deterministic 1.01M-vector corpus
   * (1M uniform + 10k planted exact copies), measuring
   *  - deep banding (r16×b128): candidate mass, prune factor, verified
   *    t=0.9 pairs, planted recall;
   *  - IVF-PQ (k=128 cells, m8×k16 residual codes): index+code build,
   *    1,024-query batch ADC retrieval wall time, planted recall@1
   *    through codes alone;
   *  - hot-cell split at 1M (50% skew): probed-bytes and wall time
   *    before/after, the splitSkew55k story at 18× the rows.
   */
  private def millionVec(spark: SparkSession): Unit = {
    millionFloor(spark); millionLean(spark); millionIvfPq(spark)
  }

  /** The shared 1.01M corpus (1M uniform + 10k planted exact copies),
    * written fresh per PHASE: each phase runs in its own JVM (its own
    * `million-*-only` mode) so its shuffle files die with its app — one
    * long app accumulating all three phases' exchanges is what filled the
    * disk on this machine's 48 GB headroom. Also sets 128 shuffle
    * partitions (the lean path's shuffle_hash builds hold one partition of
    * band rows each; at 129M band rows, 32 partitions would put ~4M rows
    * in every build map). */
  private def millionCorpus(spark: SparkSession): (java.nio.file.Path, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    val n = 1000000L
    val base = spark.range(n).map { id =>
      (id, Array.tabulate(64)(d =>
        (mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
    }.toDF("vec_id", "embedding")
    val planted = base.unionByName(
      base.where(col("vec_id") % 100 === 5)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")))
    val root = java.nio.file.Files.createTempDirectory("graft-million-vec")
    planted.write.parquet(root.resolve("flat").toString)
    (root, spark.read.parquet(root.resolve("flat").toString))
  }

  /**
   * Banding geometry at 1M: the collision-floor curve. The 55k production
   * config (r16×b128) does NOT extrapolate: its per-band random floor
   * C(n,2)·2⁻¹⁶ reaches ~7.6M rows/band at n=10⁶ (≈2×10⁹ join rows over
   * 128 bands), and the ride-along-signature join additionally carries
   * bands×4-byte signatures on every band row — the first attempt of this
   * run spilled ~130 GB and died on disk. Measure the floor exactly
   * WITHOUT materializing pairs: join-row mass = Σ_{band,bucket}
   * C(occupancy, 2), one occupancy aggregation per geometry.
   */
  private def millionFloor(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, corpus) = millionCorpus(spark)
    val total = corpus.count()
    val allPairs = total.toDouble * (total - 1) / 2.0
    val corpusE = corpus.select(col("vec_id").as("id"),
      graft.llm.Similarity.asDouble(col("embedding")).as("v"))
    def floorMass(r: Int): Long =
      graft.llm.Similarity.lshSigRowsTyped(corpusE, "id", "v", bands = 128,
          planesPerBand = r, dims = 64)
        .select(posexplode(col("sig")).as(Seq("band", "bucket")))
        .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) / 2")).cast("long"))
        .head.getLong(0)
    Seq(16, 20, 24).foreach { r =>
      val (mass, tM) = timed(floorMass(r))
      println(f"million-vec banding-floor r=$r b=128 n=$total " +
        f"join-rows=$mass (${tM}%.1fs occupancy agg) " +
        f"prune=${allPairs / mass}%.0fx")
    }
  }

  /**
   * Verified near-dup at the 1M-correct depth: the geometry rule
   * `r ≥ log₂(b·C(n,2)/budget)` gives r≈24 for a ~20M-candidate budget at
   * n=10⁶/b=128 (r=20's 186M-pair floor would push ~80 GB of
   * vector-carrying exchange through the verify joins). LEAN path: bare
   * (band,bucket,id) shuffle, 16-byte pair distinct MATERIALIZED to
   * parquet once — the candidate count and the verify join both read the
   * file instead of re-running the banding chain.
   */
  private def millionLean(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (root, corpus) = millionCorpus(spark)
    val total = corpus.count()
    val nPlanted = 1000000L / 100
    val allPairs = total.toDouble * (total - 1) / 2.0
    val (_, tCand) = timed(Dedup.embeddingLshCandidatesLean(
        corpus, "vec_id", "embedding", dims = 64,
        planesPerBand = 24, bands = 128)
      .write.parquet(root.resolve("cand").toString))
    val candT = spark.read.parquet(root.resolve("cand").toString)
    val cand = candT.count()
    val e = corpus.select(col("vec_id").cast("long").as("id"),
      graft.llm.Similarity.asDouble(col("embedding")).as("v"))
    val (ver, tVer) = timed(candT
      .join(e.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(e.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .select(round(graft.functions.VectorExpressions.graft_cosine(
        col("va"), col("vb")), 6).as("cosine"))
      .where(!isnan(col("cosine")) && col("cosine") >= 0.9)
      .count())
    println(f"million-vec deep-lean(r24b128) n=$total cand=$cand " +
      f"(${tCand}%.1fs materialize, prune=${allPairs / cand}%.0fx) " +
      f"verified=$ver (${tVer}%.1fs) " +
      f"planted=$nPlanted recall=${ver.toDouble / nPlanted}%.3f")
  }

  /** IVF-PQ at 1M: build, batch ADC retrieval, planted recall@1. */
  private def millionIvfPq(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (root, corpus) = millionCorpus(spark)
    val base = corpus.where(col("vec_id") < 10000000L)
    val (cents, tTrain) = timed {
      val c = graft.llm.Similarity.ivfTrainCentroids(
        base, "vec_id", "embedding", k = 128, iters = 2)
      c.count(); c
    }
    val (_, tIdx) = timed(
      graft.llm.Similarity.ivfIndexRows(corpus, "vec_id", "embedding", cents)
        .write.partitionBy("centroid_id").parquet(root.resolve("idx").toString))
    val index = spark.read.parquet(root.resolve("idx").toString)
    val (books, tPq) = timed {
      val b = graft.llm.Similarity.pqTrainCodebooks(
        graft.llm.Similarity.ivfResiduals(
          index.select(col("id"), col("centroid_id"), col("v")), cents),
        "id", "rv", m = 8, ksub = 16, iters = 2, dims = 64)
      b.count(); b
    }
    val (_, tEnc) = timed(
      graft.llm.Similarity.pqEncode(
        graft.llm.Similarity.ivfResiduals(
          index.select(col("id"), col("centroid_id"), col("v")), cents),
        "id", "rv", books, dims = 64, cellCol = Some("centroid_id"))
      .write.partitionBy("centroid_id").parquet(root.resolve("codes").toString))
    val codes = spark.read.parquet(root.resolve("codes").toString)
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    println(f"million-vec ivf-pq build: train=${tTrain}%.1fs index=${tIdx}%.1fs " +
      f"pq-train=${tPq}%.1fs encode=${tEnc}%.1fs bytes idx=${dirBytes(root.resolve("idx"))} " +
      f"codes=${dirBytes(root.resolve("codes"))}")
    val plantedQ = index.where(col("id") >= 10000000L && col("id") < 10102400L)
      .where(col("id") % 100 === 5)
      .select(col("id").as("vec_id"), col("v").as("embedding"))
    val nQ = plantedQ.count()
    val (hits, tAdc) = timed(graft.llm.Similarity.knnJoinPq(
        codes, books, cents, plantedQ, "vec_id", "embedding", k = 1, nprobe = 8,
        residual = true)
      .where(col("rank") === 1 && col("neighbor_id") === col("query_id") - 10000000L)
      .count())
    println(f"million-vec ivf-pq retrieval: Q=$nQ k=1 nprobe=8 ${tAdc}%.1fs " +
      f"planted recall@1=$hits/$nQ (${hits.toDouble / nQ}%.3f)")
  }

  /**
   * The fully-composed all-stored search at 1M vectors — the newest
   * rung measured at the batch ring's scale: residual cell store +
   * int8 code store built once, then [[graft.llm.Similarity
   * .knnJoinHammingIvfResSq]] retrieving 1,024 planted exact twins'
   * donors at k=1. A planted copy shares its donor's vector, hence its
   * cell and its residual sketch (Hamming 0) — recall@1 is structural,
   * so the datapoints are the build walls, the store bytes, and the
   * probed-vs-flat search wall (the composed plan reads nprobe/128 of
   * the sketch rows the flat SQ search scans; both rerank from the
   * same 72 B/candidate codes and neither ever reads the flat
   * vectors).
   */
  private def millionSq8(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    val (root, corpus) = millionCorpus(spark)
    val base = corpus.where(col("vec_id") < 10000000L)
    val (cents, tTrain) = timed {
      val c = graft.llm.Similarity.ivfTrainCentroids(
        base, "vec_id", "embedding", k = 128, iters = 2)
      c.count(); c
    }
    val (_, tSigs) = timed(
      graft.llm.Similarity.hammingResidualSigRows(corpus, "vec_id", "embedding",
          cents, dims = 64)
        .write.partitionBy("centroid_id").parquet(root.resolve("ressigs").toString))
    val resSigs = spark.read.parquet(root.resolve("ressigs").toString)
    val (_, tCodes) = timed(
      graft.llm.Similarity.q8CodeRows(corpus, "vec_id", "embedding")
        .join(graft.llm.Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
          .select(col("id"), col("centroid_id")), "id")
        .write.partitionBy("centroid_id").parquet(root.resolve("codes").toString))
    val codes = spark.read.parquet(root.resolve("codes").toString)
    graft.llm.Similarity.hammingSigRows(corpus, "vec_id", "embedding", dims = 64)
      .write.parquet(root.resolve("sigs").toString)
    val flatCodes = codes.select("id", "scale", "q")
    val flatSigs = spark.read.parquet(root.resolve("sigs").toString)
    println(f"million-sq8 build: train=${tTrain}%.1fs ressigs=${tSigs}%.1fs " +
      f"codes=${tCodes}%.1fs bytes flat=${dirBytes(root.resolve("flat"))} " +
      f"ressigs=${dirBytes(root.resolve("ressigs"))} " +
      f"codes=${dirBytes(root.resolve("codes"))} " +
      f"sigs=${dirBytes(root.resolve("sigs"))}")
    val plantedQ = corpus.where(col("vec_id") >= 10000000L)
      .where(col("vec_id") % 1000 === 5)
    val nQ = plantedQ.count()
    Seq(1, 4).foreach { np =>
      val (hits, t) = timed(graft.llm.Similarity.knnJoinHammingIvfResSq(
          codes, resSigs, cents, plantedQ, "embedding", "vec_id",
          k = 1, dims = 64, nprobe = np, oversample = 4)
        .where(col("rank") === 1 && col("neighbor_id") === col("query_id") - 10000000L)
        .count())
      println(f"million-sq8 composed: Q=$nQ k=1 np=$np os=4 ${t}%.1fs " +
        f"planted recall@1=$hits/$nQ (${hits.toDouble / nQ}%.3f)")
    }
    val (fHits, tFlat) = timed(graft.llm.Similarity.knnJoinHammingSqFromSigs(
        flatCodes, flatSigs, plantedQ, "embedding", "vec_id",
        k = 1, dims = 64, oversample = 4)
      .where(col("rank") === 1 && col("neighbor_id") === col("query_id") - 10000000L)
      .count())
    println(f"million-sq8 flat-sq: Q=$nQ k=1 os=4 ${tFlat}%.1fs " +
      f"planted recall@1=$fHits/$nQ (${fHits.toDouble / nQ}%.3f)")
    // the maxQueries bound, honestly exercised: 4,096 queries at the
    // realistic retrieval dial (k=10, np=4, os=8) put ~4096·4·10·8 ≈
    // 1.3M candidate rows through the broadcast rerank — the measured
    // ceiling of the "candidates are still broadcast-sized" claim
    val qMax = corpus.where(col("vec_id") >= 10000000L && col("vec_id") < 10409600L)
    val nMax = qMax.count()
    val (mHits, tMax) = timed(graft.llm.Similarity.knnJoinHammingIvfResSq(
        codes, resSigs, cents, qMax, "embedding", "vec_id",
        k = 10, dims = 64, nprobe = 4, oversample = 8)
      .where(col("rank") === 1 && col("neighbor_id") === col("query_id") - 10000000L)
      .count())
    println(f"million-sq8 composed-qmax: Q=$nMax k=10 np=4 os=8 ${tMax}%.1fs " +
      f"(${nMax / tMax}%.0f q/s) planted recall@1=$mHits/$nMax " +
      f"(${mHits.toDouble / nMax}%.3f)")
  }

  /**
   * The admission-family scale measurement — 10M docs in ONE source (the
   * adversarial shape the round-10 ranged/threshold twins exist for: the
   * window paths put that entire source through a single sort task, the
   * twins distribute it). Outputs must be row-identical (the LlmSpec
   * property re-checked here at 10M via count + keep-mass equality);
   * the wall-clock ratio is the datapoint.
   */
  private def admission10M(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.llm.TextAnalysis
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = 10000000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("doc body text number "), col("id"), lit(" tail")).as("text"),
      lit("web").as("source"))
    val budget = 30000000L // ~3/7 of the corpus token mass admitted
    val (wKeep, tW) = timed(TextAnalysis.budgetMix(
      docs, "doc_id", "text", "source", budget).where(col("keep")).count())
    val (rKeep, tR) = timed(TextAnalysis.budgetMixRanged(
      docs, "doc_id", "text", "source", budget).where(col("keep")).count())
    require(wKeep == rKeep, s"paths disagree: window=$wKeep ranged=$rKeep")
    println(f"admission budget-mix n=$n sources=1 keep=$wKeep | " +
      f"window ${tW}%.1fs | ranged ${tR}%.1fs (${tW / tR}%.1fx)")
    // ppl terciles: one giant language, 6-dp scores over a bounded value
    // alphabet (the rounding argument made literal)
    val scored = spark.range(n).select(col("id").as("doc_id"),
      lit("en").as("lang"), lit(100L).as("n_words"),
      (pmod(col("id") * 2654435761L, lit(100000L)).cast("double") / 100.0)
        .as("nll_sum"))
    val (wB, tWp) = timed(TextAnalysis.pplBuckets(scored, "doc_id", "lang")
      .groupBy("bucket").agg(count(lit(1))).count())
    val (tB, tTp) = timed(TextAnalysis.pplBucketsThreshold(scored, "doc_id", "lang")
      .groupBy("bucket").agg(count(lit(1))).count())
    println(f"admission ppl-terciles n=$n langs=1 buckets w=$wB t=$tB | " +
      f"ntile-window ${tWp}%.1fs | threshold ${tTp}%.1fs (${tWp / tTp}%.1fx)")
    // domain cap — the admission op whose window key is MANY-valued by
    // construction (the contrast case): 10M docs over 100k domains,
    // ~100 docs/key, cap 50 → per-key mass is bounded and every window
    // partition is tiny; the wall should sit near scan+shuffle cost
    val domains = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("domain body "), col("id")).as("text"),
      concat(lit("d"), pmod(col("id") * 2654435761L, lit(100000L)),
        lit(".example")).as("domain"))
    val (dKeep, tD) = timed(TextAnalysis.domainCap(
      domains, "doc_id", "text", "domain", cap = 50)
      .where(col("keep")).count())
    println(f"admission domain-cap n=$n domains=100000 cap=50 keep=$dKeep | " +
      f"${tD}%.1fs")
  }

  /**
   * The SDC ring at MILLION scale — the 55k-only claim closer: build the
   * 1.01M IVF-PQ artifacts (512 cells so the within-cell quadratic stays
   * at the n²/cells mass the cell-share dial promises), then run the
   * code-space kNN graph, mutual-edge component labeling (the >1M-edge
   * distributed label-propagation path — the adaptive union-find gate is
   * deliberately exceeded), and SemDeDup scored entirely in code space.
   * Planted exact copies (10k, donor+10M ids) share their donor's codes,
   * so the SemDeDup election must flag ~every planted row as a dup of an
   * earlier member at reconstruction cosine 1.
   */
  private def millionSdc(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (root, corpus) = millionCorpus(spark)
    val base = corpus.where(col("vec_id") < 10000000L)
    val (cents, tTrain) = timed {
      val c = graft.llm.Similarity.ivfTrainCentroids(
        base, "vec_id", "embedding", k = 512, iters = 2)
      c.count(); c
    }
    val (_, tIdx) = timed(
      graft.llm.Similarity.ivfIndexRows(corpus, "vec_id", "embedding", cents)
        .write.partitionBy("centroid_id").parquet(root.resolve("idx").toString))
    val index = spark.read.parquet(root.resolve("idx").toString)
    val (books, tPq) = timed {
      val b = graft.llm.Similarity.pqTrainCodebooks(
        graft.llm.Similarity.ivfResiduals(
          index.select(col("id"), col("centroid_id"), col("v")), cents),
        "id", "rv", m = 8, ksub = 16, iters = 2, dims = 64)
      b.count(); b
    }
    val (_, tEnc) = timed(
      graft.llm.Similarity.pqEncode(
        graft.llm.Similarity.ivfResiduals(
          index.select(col("id"), col("centroid_id"), col("v")), cents),
        "id", "rv", books, dims = 64, cellCol = Some("centroid_id"))
      .write.partitionBy("centroid_id").parquet(root.resolve("codes").toString))
    val codes = spark.read.parquet(root.resolve("codes").toString)
    val n = codes.count()
    println(f"million-sdc build: n=$n cells=512 m=8 train=${tTrain}%.1fs " +
      f"index=${tIdx}%.1fs pq-train=${tPq}%.1fs encode=${tEnc}%.1fs")
    val ((g, edges, mutualEdges), tGraph) = timed {
      val gr = graft.llm.Similarity.knnGraphSdc(codes, books, cents, k = 3).persist()
      (gr, gr.count(), gr.where(col("mutual")).count())
    }
    println(f"million-sdc knn-graph: k=3 edges=$edges mutual=$mutualEdges ${tGraph}%.1fs")
    val mutualPairs = g.where(col("mutual") && col("query_id") < col("neighbor_id"))
      .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"))
    val ((nonSingleton, labeled), tCl) = timed {
      val cl = graft.llm.Dedup.duplicateClusters(
        mutualPairs, codes.select(col("id"))).persist()
      val ns = cl.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
        .where(col("sz") > 1).count()
      val tot = cl.count(); cl.unpersist(); (ns, tot)
    }
    g.unpersist()
    println(f"million-sdc components: labeled=$labeled multi-member=$nonSingleton ${tCl}%.1fs")
    val ((dups, plantedDup), tSdc) = timed {
      val dd = graft.llm.Dedup.semanticDedupSdc(codes, books, cents,
        threshold = 0.99).where(!col("keep")).persist()
      val all = dd.count()
      val pl = dd.where(col("id") >= 10000000L).count()
      dd.unpersist(); (all, pl)
    }
    println(f"million-sdc semdedup: t=0.99 dups=$dups planted-dups=$plantedDup/10000 ${tSdc}%.1fs")
  }

  /**
   * The ≥10M-doc validation pass:
   *  - Bloom geometry PAST the 4M-item clamp boundary: the direct sketch
   *    build at expectedItems=10M must come out at the requested
   *    optimal-bits size (~11.4 MB — over Catalyst's silent 8 MB
   *    BloomFilterAggregate clamp, which is the point), and a 100k batch
   *    carrying 1% corpus dups must see a candidate admission near
   *    dups + fpp·novel, verdict-identical to the text-join path;
   *  - maximal span dedup at 10M docs: 10k planted 40-token repeats must
   *    come back as exactly one aligned span each, with the gram shuffle
   *    carrying only (hash, id, pos).
   */
  private def tenMillionDocs(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = 10000000L
    def corpusText(id: org.apache.spark.sql.Column) =
      concat(lit("corpus document body text number "), id, lit(" tail"))
    val corpus = spark.range(n).select(col("id").as("doc_id"),
      corpusText(col("id")).as("text"))
    val batch = spark.range(99000).select((col("id") + 100000000L).as("doc_id"),
        concat(lit("batch novel content item "), col("id"), lit(" end")).as("text"))
      .unionByName(spark.range(1000).select((col("id") + 200000000L).as("doc_id"),
        corpusText(col("id")).as("text")))
    val hashes = corpus.select(col("doc_id").as("id"),
      Dedup.contentHashSafe(col("text")).as("h")).persist()
    val (nh, tHash) = timed(hashes.count())
    val (bloom, tBloom) = timed(Dedup.bloomFromHashes(hashes, n, 0.01))
    val (cand, tCand) = timed(batch.where(Dedup.bloomMightContain(bloom,
      Dedup.contentHashSafe(col("text")))).count())
    val (verd, tB) = timed(
      Dedup.dedupIncrementalBloomFromHashes(batch, hashes, "doc_id", "text", n)
        .groupBy("status").count().collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap)
    println(f"tenmillion-doc bloom corpus=$nh batch=100000 | hash scan ${tHash}%.1fs | " +
      f"sketch fold ${tBloom}%.1fs bytes=${bloom.length} " +
      f"(past the 8,388,608-byte Catalyst clamp: ${bloom.length > 8388608}) | " +
      f"candidates=$cand (expect ~1000 dups + ~990 fpp) probe ${tCand}%.1fs | " +
      f"judgment ${tB}%.1fs verdicts=$verd")
    hashes.unpersist()
    // --- maximal span dedup at 10M docs ---
    val blockWords = (0 until 40).map(i => s"rep$i").mkString(" ")
    val spanDocs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 1000 === 7,
        concat(lit(blockWords + " unique"), col("id"), lit("a uniq"), col("id"),
          lit("b uniq"), col("id"), lit("c")))
        .otherwise(concat(
          lit("u"), col("id"), lit("a u"), col("id"), lit("b u"), col("id"),
          lit("c u"), col("id"), lit("d u"), col("id"), lit("e u"), col("id"),
          lit("f u"), col("id"), lit("g u"), col("id"), lit("h u"), col("id"),
          lit("i u"), col("id"), lit("j u"), col("id"), lit("k u"), col("id"),
          lit("l")))
        .as("text"))
    val (spans, tSpan) = timed {
      val s = Dedup.repeatedSpansMaximal(spanDocs, "doc_id", "text",
        n = 10, minTokens = 30)
      (s.count(), s.where(col("n_tokens") === 40).count())
    }
    println(f"tenmillion-doc spans: docs=$n planted=${n / 1000} copies | " +
      f"maximal spans=${spans._1} exact-40-token=${spans._2} ${tSpan}%.1fs")
    // --- soft dedup at 10M docs over the same planted corpus ---
    // 1/1000 docs share the 40-token boilerplate block (each of its
    // 4-grams occurs 10k times); the rest are id-unique. The planted
    // rows' mean gram-duplication must separate cleanly from ~0.
    val (softStats, tSoft) = timed {
      Dedup.softDedupScores(spanDocs, "doc_id", "text")
        .select(when(col("doc_id") % 1000 === 7, lit("planted"))
          .otherwise(lit("unique")).as("cls"), col("dup_score"))
        .groupBy("cls").agg(avg("dup_score").as("mean_dup"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    println(f"tenmillion-doc soft-dedup: planted mean=${softStats("planted")}%.4f " +
      f"unique mean=${softStats("unique")}%.6f ${tSoft}%.1fs")
  }

  /** Winnowing at 10M docs: every doc carries 10 id-unique filler words;
    * ids ≡ 0,1 (mod 100) additionally share an 8-word run keyed by
    * id div 100 — 100k planted PAIRS, each run ≥ w+k−1 = 7 words so the
    * winnowing guarantee applies pair by pair. Measures the fingerprint
    * scan (per-doc windows only) and the df-capped pairing join; the pair
    * count must be exactly the planted 100k (unique filler never pairs;
    * the cap never fires at df=2). */
  private def winnow10M(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = 10000000L
    val pairKey = (col("id") / 100).cast("long")
    val shared = concat(lit("s"), pairKey, lit("a s"), pairKey, lit("b s"),
      pairKey, lit("c s"), pairKey, lit("d s"), pairKey, lit("e s"), pairKey,
      lit("f s"), pairKey, lit("g s"), pairKey, lit("h"))
    val filler = concat(
      lit("u"), col("id"), lit("a u"), col("id"), lit("b u"), col("id"),
      lit("c u"), col("id"), lit("d u"), col("id"), lit("e u"), col("id"),
      lit("f u"), col("id"), lit("g u"), col("id"), lit("h u"), col("id"),
      lit("i u"), col("id"), lit("j"))
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 100 < 2, concat(filler, lit(" "), shared))
        .otherwise(filler).as("text"))
    val (nFp, tFp) = timed(
      Dedup.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 4).count())
    val (pairs, tPair) = timed {
      val p = Dedup.winnowPairs(docs, "doc_id", "text", k = 4, w = 4,
        minShared = 1, maxDocFreq = 100)
      (p.count(), p.where(col("id_b") === col("id_a") + 1).count())
    }
    // adjacent must cover every planted pair (the winnowing guarantee);
    // total may exceed it slightly — ~1.4e8 distinct grams against 40-bit
    // hashes yields a few thousand colliding gram pairs, a handful of which
    // land on selected fingerprints (the documented quality-not-correctness
    // trade; minShared=2 removes them at production settings)
    println(f"winnow-10M docs=$n planted_pairs=${n / 100} | " +
      f"fingerprints=$nFp scan ${tFp}%.1fs | pairs=${pairs._1} " +
      f"adjacent=${pairs._2} (expect adjacent ≥ ${n / 100}) join ${tPair}%.1fs")
  }

  /** Byte-rolling CDC at 10M docs: the cdc10M planted corpus (1/1000 docs
    * share a ~240-char block inside unique surroundings). Measures the
    * zero-shuffle gear and FastCDC kernels plus the gear duplicate
    * rollup; the planted block's interior gear boundaries are
    * content-defined and identical in every copy, so shared chunk hashes
    * must surface held by ≈ n/1000 docs. */
  private def gear10M(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = 10000000L
    val blockWords = (0 until 40).map(i => s"rep$i").mkString(" ")
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 1000 === 7,
        concat(lit(blockWords + " unique"), col("id"), lit("a uniq"), col("id"),
          lit("b uniq"), col("id"), lit("c")))
        .otherwise(concat(
          lit("u"), col("id"), lit("a u"), col("id"), lit("b u"), col("id"),
          lit("c u"), col("id"), lit("d u"), col("id"), lit("e u"), col("id"),
          lit("f u"), col("id"), lit("g u"), col("id"), lit("h u"), col("id"),
          lit("i u"), col("id"), lit("j u"), col("id"), lit("k u"), col("id"),
          lit("l")))
        .as("text"))
    val (nG, tG) = timed(
      Dedup.gearChunks(docs, "doc_id", "text", maskBits = 6).count())
    val (nF, tF) = timed(Dedup.fastCdcChunks(docs, "doc_id", "text").count())
    // plain gear has no min size, so its dup rollup drowns in tiny
    // accidental chunks (a 2-char chunk shared by ~400k unique docs) —
    // the geometric-tail pathology that motivates FastCDC's minSize.
    // Report the planted-block signal for gear RESTRICTED to real-sized
    // chunks, and the clean FastCDC rollup beside it.
    val (gd, tGd) = timed {
      val d = Dedup.gearDuplicateChunks(docs, "doc_id", "text", maskBits = 6)
      (d.count(),
        d.where(col("n_chars") >= 32).agg(max("n_docs")).head().getLong(0))
    }
    // the FINAL chunk of a doc has no min-size protection (the document
    // just ends), so a handful of short tail chunks still collide across
    // docs — restrict the planted-block signal to real-sized chunks for
    // FastCDC too
    val (fd, tFd) = timed {
      val d = Dedup.fastCdcChunks(docs, "doc_id", "text")
        .groupBy("chunk_hash")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          max("n_chars").as("n_chars"))
        .where(col("n_docs") >= 2)
      (d.count(),
        d.where(col("n_chars") >= 32).agg(max("n_docs")).head().getLong(0))
    }
    println(f"gear-10M docs=$n planted=${n / 1000} | gear chunks=$nG " +
      f"scan ${tG}%.1fs | fastcdc chunks=$nF scan ${tF}%.1fs | " +
      f"gear dup_hashes=${gd._1} (tiny-chunk noise) " +
      f"max_docs_at_32+chars=${gd._2} rollup ${tGd}%.1fs | " +
      f"fastcdc dup_hashes=${fd._1} max_docs_at_32+chars=${fd._2} " +
      f"(both expect ≈ ${n / 1000}) rollup ${tFd}%.1fs")
  }

  /** Text simhash at 10M docs — the wide-key contrast on FULL-entropy
    * sketches (word-hash simhash, unlike the entropy-capped 8-dim stub
    * features of `phash-only`): candidate mass for contiguous 4×15-bit
    * bands vs C(6,3) 30-bit combination keys, analytically from the key
    * histograms, then the combo pair join actually RUN at 10M with 10k
    * planted exact-dup docs (Hamming 0, guaranteed recovery). */
  private def simhash10M(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.llm.Dedup
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = 10000000L
    // 16 distinct 8-hex-char words per doc — high-entropy signatures
    def wordsOf(seed: String) = (0 until 4).map(j =>
      substring(md5(concat(lit(seed), col("id"))), j * 8 + 1, 8))
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (wordsOf("sa") ++ wordsOf("sb") ++ wordsOf("sc") ++
        wordsOf("sd")): _*).as("text"))
    val plants = base.where(col("doc_id") % 1000 === 3)
      .select((col("doc_id") + 20000000L).as("doc_id"), col("text"))
    val docs = base.unionByName(plants)
    val sigs = docs
      .select(col("doc_id").as("id"),
        transform(split(col("text"), " "),
          w => graft.llm.TextHashing.md5Long60(w)).as("hs"))
      .select(col("id"), Dedup.simhashSignature(col("hs"), 60).as("sig"))
      .persist()
    val (nS, tS) = timed(sigs.count())
    def mass(bandRows: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val h = bandRows.groupBy("band", "v").agg(count(lit(1)).as("m"))
        .agg(sum(expr("m * (m - 1) div 2")).as("cand"), max(col("m")).as("mx"))
        .head()
      (h.getLong(0), h.getLong(1))
    }
    val narrowRows = sigs.select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(3)), b =>
          struct(b.as("band"),
            pmod(call_function("shiftright", col("sig"), (b * 15).cast("int")),
              lit(32768L)).as("v")))).as("b"))
      .select(col("id"), col("sig"), col("b.band").as("band"), col("b.v").as("v"))
    val ((cN, mxN), tN) = timed(mass(narrowRows))
    val ((cC, mxC), tC) = timed(mass(
      Dedup.comboKeyRows(sigs, bits = 60, nBlocks = 6, maxHamming = 3)))
    val (pairStats, tP) = timed {
      val p = Dedup.simhashComboJoin(sigs, maxHamming = 3).persist()
      val c = p.count()
      val planted = p.where(col("hamming") === 0 &&
        col("id_b") - col("id_a") === 20000000L).count()
      p.unpersist()
      (c, planted)
    }
    sigs.unpersist()
    println(f"simhash-10M sigs=$nS scan ${tS}%.1fs | candidate mass: " +
      f"narrow(4x15)=$cN (max key $mxN) in ${tN}%.1fs vs " +
      f"combo(20x30)=$cC (max key $mxC) in ${tC}%.1fs | combo pairs=" +
      f"${pairStats._1} planted_h0=${pairStats._2}/${n / 1000} " +
      f"join ${tP}%.1fs")
  }

  /**
   * The frame near-dup ring at 10M FRAMES ([[graft.llm.Multimodal
   * .frameNearDupGroups]] — the r13 operator, measured only at sf0.1
   * until now): 500k synthetic videos × 20 frames (md5-derived 96-byte
   * payloads, frame slices through the spectral decode), with 500
   * planted TWIN videos (identical payload under a distinct id — every
   * frame an exact cross-video perceptual dup of its donor's, 10k
   * planted dup frames total). Measures the end-to-end grouped ring:
   * frame sketch scan + radius-3 combo-key pair join + label-propagation
   * components + the cluster rollup, and pins that every planted twin
   * frame lands in a donor-canonical multi-video cluster.
   */
  private def frames10M(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.llm.Multimodal
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val nVids = 500000L
    val nf = 20
    // 160 RAW bytes (10 unhexed md5 blocks) = 8 random bytes per frame
    // slice — a 2^64 slice alphabet, so organic sketch collisions across
    // 10M frames are ~zero and every recovered dup is a planted one
    // (hex-char payloads at 4 bits/byte were measured to collide wildly)
    def mediaOf(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("media_id"),
      lit("video").as("kind"),
      concat((0 until 10).map(j =>
        unhex(md5(concat(lit(s"f$j|"), col("seed"))))): _*).as("payload"),
      struct(lit(160L).as("byte_len"), lit("webm").as("format"),
        lit(640).as("width"), lit(480).as("height"),
        lit(nf).as("n_frames")).as("meta"))
    val base = mediaOf(spark.range(nVids)
      .select(col("id").as("media_id"), col("id").as("seed")))
    // twins: same seed (= byte-identical payload) under a disjoint id range
    val twins = mediaOf(spark.range(nVids).where(col("id") % 1000 === 3)
      .select((col("id") + 2000000L).as("media_id"), col("id").as("seed")))
    val media = base.unionByName(twins)
    val ((rows, planted, maxMedia), t) = timed {
      val g = Multimodal.frameNearDupGroups(media, stride = 1, maxHamming = 3)
        .persist()
      val n = g.count()
      // every planted twin frame: cluster canonical = the donor (smaller
      // packed key), spanning exactly the donor + twin
      val p = g.where(col("canonical_media") % 1000 === 3 &&
        col("canonical_media") < 2000000L && col("n_media") >= 2).count()
      val mx = g.agg(max(col("n_media"))).head().getLong(0)
      g.unpersist()
      (n, p, mx)
    }
    println(f"frames-10M videos=${nVids + nVids / 1000} frames=${nVids * nf} " +
      f"(+${nVids / 1000 * nf} planted) | multi-video clusters=$rows " +
      f"donor-canonical planted=$planted/${nVids / 1000 * nf} " +
      f"max n_media=$maxMedia | end-to-end ${t}%.1fs")
  }

  /** Perceptual-hash ring at 10M media rows over the FULL-ENTROPY
    * spectral decode (64 integer coefficients — r12's "make the media
    * pair ring's 10 TB path real"): sketch scan throughput, the
    * candidate-mass contrast (contiguous 4×15-bit bands vs C(6,3) 30-bit
    * combination keys), and the corpus-wide radius-3 PAIR JOIN actually
    * RUN end-to-end with 10k planted spectral-class-swap perceptual dups
    * (bytes 1/65 swapped — sketch-exact, byte-distinct; Hamming-0
    * recovery guaranteed), plus the grouped and incremental production
    * forms. Under the old 8-dim histogram decode the sketch alphabet
    * capped at ~10⁶ values and this join was inherently quadratic; the
    * spectral sketch draws on the full 2⁶⁰ alphabet. */
  private def phash10M(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.llm.{Dedup, Multimodal}
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = 10000000L
    // three md5 blocks give each doc a random 96-char byte mix; the plant
    // swaps positions 1 and 65 (same spectral class mod 64 → coefficients
    // and sketch EXACTLY preserved, bytes differ)
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat(md5(concat(lit("da"), col("id"))),
        md5(concat(lit("db"), col("id"))),
        md5(concat(lit("dc"), col("id")))).as("text"))
    val plants = base.where(col("doc_id") % 1000 === 3)
      .select((col("doc_id") + 20000000L).as("doc_id"),
        concat(substring(col("text"), 65, 1), substring(col("text"), 2, 63),
          substring(col("text"), 1, 1),
          substring(col("text"), 66, Int.MaxValue)).as("text"))
    val media = Multimodal.asMedia(base, "doc_id", "text")
    val sigs = Multimodal.phashSketches(media).persist()
    val (nS, tS) = timed(sigs.count())
    println(s"[phash10M] scan done ${tS}s")
    // full-entropy sketches mean the 200M-row key expansions no longer
    // collapse in partial aggregation — each step shuffles ~200M near-
    // unique keys, and the files outlive the step until its shuffle
    // dependency is GC'd. Reclaim between steps so the probe's cumulative
    // footprint is one step's shuffle, not five (a prior run filled the
    // disk with ~80 GB of stacked shuffle files).
    def reclaim(): Unit = {
      System.gc(); Thread.sleep(3000)
      println(f"[phash10M] tmp free: " +
        f"${new java.io.File("/tmp").getUsableSpace / 1e9}%.1f GB")
    }
    // candidate MASS analytically from the key histograms — Σ C(m, 2)
    // over each scheme's key multiplicities. An aggregation, never a
    // join: the number itself decides whether a join is even runnable.
    def mass(bandRows: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val h = bandRows.groupBy("band", "v").agg(count(lit(1)).as("m"))
        .agg(sum(expr("m * (m - 1) div 2")).as("cand"), max(col("m")).as("mx"))
        .head()
      (h.getLong(0), h.getLong(1))
    }
    val narrowRows = sigs.select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(3)), b =>
          struct(b.as("band"),
            pmod(call_function("shiftright", col("sig"), (b * 15).cast("int")),
              lit(32768L)).as("v")))).as("b"))
      .select(col("id"), col("sig"), col("b.band").as("band"), col("b.v").as("v"))
    val ((cN, mxN), tN) = timed(mass(narrowRows))
    reclaim()
    val comboRows = Dedup.comboKeyRows(sigs, bits = 60, nBlocks = 6,
      maxHamming = 3)
    val ((cC, mxC), tC) = timed(mass(comboRows))
    reclaim()
    // the production forms at this scale: GROUPED exact-sketch dedup
    // (linear) and INCREMENTAL batch judgment against the stored sigs
    val (grp, tG) = timed {
      sigs.groupBy("sig").agg(count(lit(1)).as("m")).where(col("m") >= 2)
        .agg(count(lit(1)), max(col("m"))).head() match {
          case r => (r.getLong(0), r.getLong(1))
        }
    }
    reclaim()
    val (inc, tI) = timed {
      val out = Multimodal.phashIncremental(
        Multimodal.asMedia(plants, "doc_id", "text"), sigs).persist()
      val total = out.count()
      val flagged = out.where(!col("keep") && col("hamming") === 0).count()
      val donor = out.where(col("dup_of") === col("media_id") - 20000000L &&
        col("hamming") === 0).count()
      out.unpersist()
      (total, flagged, donor)
    }
    println(s"[phash10M] incremental done ${tI}s")
    reclaim()
    // the corpus-wide radius-3 PAIR JOIN end-to-end — measurable now that
    // the spectral sketch has real entropy (the r12 done-bar): corpus ∪
    // planted sketch-exact dups through the wide combo keys
    val (pairStats, tP) = timed {
      val allSigs = sigs.unionByName(Multimodal.phashSketches(
        Multimodal.asMedia(plants, "doc_id", "text")))
      val p = Dedup.simhashComboJoin(allSigs, maxHamming = 3).persist()
      val c = p.count()
      val planted = p.where(col("hamming") === 0 &&
        col("id_b") - col("id_a") === 20000000L).count()
      p.unpersist()
      (c, planted)
    }
    sigs.unpersist()
    println(f"phash-10M sigs=$nS scan ${tS}%.1fs | candidate mass: " +
      f"narrow(4x15)=$cN (max key $mxN) in ${tN}%.1fs vs " +
      f"combo(20x30)=$cC (max key $mxC) in ${tC}%.1fs | grouped dup sigs=" +
      f"${grp._1} (max group ${grp._2}) in ${tG}%.1fs | incremental " +
      f"batch=${inc._1} flagged_h0=${inc._2}/${n / 1000} " +
      f"donor_exact=${inc._3} in ${tI}%.1fs | combo pairs=${pairStats._1} " +
      f"planted_h0=${pairStats._2}/${n / 1000} join ${tP}%.1fs")
  }

  /** The hot-gram cap at 10M docs: EVERY doc opens with the same 4-word
    * boilerplate (one gram with 10⁷ occurrences — the pathological key
    * the uncapped window puts on one task) followed by id-unique filler.
    * Measures softDedupScores uncapped vs capped (threshold 1000, salt
    * 64) and asserts the per-doc aggregates agree exactly (bit-identity
    * itself is LlmSpec-pinned at spec scale). */
  private def hotGram10M(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = 10000000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("hb1 hb2 hb3 hb4 u"), col("id"), lit("a u"), col("id"),
        lit("b u"), col("id"), lit("c u"), col("id"), lit("d")).as("text"))
    def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum("n_grams").cast("long"),
        sum(round(col("dup_score") * 1e6, 0).cast("long"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val (fU, tU) = timed(fingerprint(
      Dedup.softDedupScores(docs, "doc_id", "text", n = 4)))
    val (fC, tC) = timed(fingerprint(
      Dedup.softDedupScores(docs, "doc_id", "text", n = 4,
        hotGramThreshold = Some(1000L))))
    require(fU == fC, s"capped path diverged: $fU vs $fC")
    println(f"hotgram-10M docs=$n | uncapped ${tU}%.1fs | " +
      f"capped(t=1000, salt=64) ${tC}%.1fs | aggregates equal: $fU")
  }

  /** CDC chunking at 10M docs: the tenmillion-doc planted corpus (1/1000
    * docs carry the same 40-word block inside unique surroundings).
    * Measures the zero-shuffle chunking scan and the duplicate-chunk
    * rollup; the planted block's INTERIOR boundaries are content-defined
    * and identical in every copy, so its interior chunks must surface as
    * duplicated hashes held by ~n/1000 docs. */
  private def cdc10M(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = 10000000L
    val blockWords = (0 until 40).map(i => s"rep$i").mkString(" ")
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 1000 === 7,
        concat(lit(blockWords + " unique"), col("id"), lit("a uniq"), col("id"),
          lit("b uniq"), col("id"), lit("c")))
        .otherwise(concat(
          lit("u"), col("id"), lit("a u"), col("id"), lit("b u"), col("id"),
          lit("c u"), col("id"), lit("d u"), col("id"), lit("e u"), col("id"),
          lit("f u"), col("id"), lit("g u"), col("id"), lit("h u"), col("id"),
          lit("i u"), col("id"), lit("j u"), col("id"), lit("k u"), col("id"),
          lit("l")))
        .as("text"))
    val (nCh, tCh) = timed(
      Dedup.cdcChunks(docs, "doc_id", "text", k = 4, mask = 16).count())
    val (dup, tDup) = timed {
      val d = Dedup.cdcDuplicateChunks(docs, "doc_id", "text", k = 4, mask = 16)
      (d.count(), d.agg(max("n_docs")).head().getLong(0))
    }
    println(f"cdc-10M docs=$n planted=${n / 1000} | chunks=$nCh scan ${tCh}%.1fs | " +
      f"dup_chunk_hashes=${dup._1} max_docs_per_chunk=${dup._2} " +
      f"(expect ≈ ${n / 1000}) rollup ${tDup}%.1fs")
  }

  /** Deterministic uniform component in [-0.5, 0.5) — serializable at the
    * object level so typed-map closures don't drag the method scope in. */
  private def comp(seed: Long): Double =
    (mix64(seed) >>> 11).toDouble / (1L << 53).toDouble - 0.5

  /** splitmix64 finalizer (same formula as Similarity's plane derivation). */
  private def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /**
   * The shallow-vs-deep banding crossover measured PAST the derived n ≈ 15k
   * point (BASELINE.md): a deterministic 50k-vector synthetic corpus
   * (hash-derived uniform components, so random-pair cosines concentrate
   * near 0) plus 10% exact copies as the planted t=0.9 dup set. Measures
   * candidate-generation and full verified wall time at r=8×b=32 vs
   * r=16×b=128 — at this n the shallow config's 11.8% random collision
   * floor is the dominant cost and the 8× deeper signatures win outright.
   */
  private def crossover50k(spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val base = spark.range(50000).map { id =>
      (id, Array.tabulate(64)(d =>
        (mix64(id * 64L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5))
    }.toDF("vec_id", "embedding")
    val planted = base.unionByName(
        base.where(col("vec_id") % 10 === 5)
          .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding")))
      .persist()
    val n = planted.count() // materialize: time the joins, not the generator
    val allPairs = n * (n - 1) / 2.0
    // at this bounded n the ~30 MB vector table must BROADCAST into the
    // verify joins: the shallow config's ~1.5×10⁸-pair candidate stream then
    // pipelines through two hash probes + the fused cosine, instead of
    // sort-merge-joining (sorting the pair stream with vectors attached
    // spills ~80 GB and fills local disk). The default 10 MB threshold
    // picks SMJ — the right call only when BOTH sides are huge.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
    try {
      Seq(("r8xb32", 8, 32), ("r16xb128", 16, 128)).foreach { case (label, r, b) =>
        val (cand, tCand) = timed(Dedup.embeddingLshCandidates(
          planted, "vec_id", "embedding", dims = 64, planesPerBand = r, bands = b).count())
        val (ver, tVer) = timed(Dedup.embeddingNearDupLsh(planted, "vec_id", "embedding",
          dims = 64, threshold = 0.9, planesPerBand = r, bands = b).count())
        println(f"crossover n=$n $label cand=$cand (${tCand}%.1fs, prune=${allPairs / cand}%.1fx) " +
          f"verified=$ver (${tVer}%.1fs)")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    planted.unpersist()
  }
}
