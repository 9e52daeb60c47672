package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed decode output (top-level for Encoder derivation). */
final case class MediaFeature(media_id: Long, feat_dim: Int,
                              feature: Seq[Double], ok: Boolean)

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / frame-sample stages.
 *
 * The decode step itself is STUBBED (this container has no image/audio
 * codecs): [[DecodeStub]] produces deterministic fake features derived from
 * the bytes. Everything around it — schema, batch iteration, partition
 * sizing, output shape — is the real Spark plumbing a production decoder
 * (JNI/FFI or `mapInPandas` on the PySpark side) would drop into.
 *
 * Scale notes: media bytes dominate row size, so (a) metadata-only queries
 * must prune the binary column at the scan (columnar parquet makes that
 * free once the projection omits it), (b) decode runs `mapPartitions` with
 * bounded batch memory, and (c) `spark.sql.files.maxPartitionBytes` governs
 * per-task media volume.
 */
object Multimodal {

  /** Canonical media schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),        // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))
  ))

  /** Wrap a text corpus as fake media rows (payload = UTF-8 bytes) — the
    * deterministic stand-in for real binary columns, exercising the full
    * schema/pruning path. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = col(textCol).cast(BinaryType)
    val len = octet_length(col(textCol)).cast(LongType)
    docs.select(
      col(idCol).as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)).as("kind"),
      payload.as("payload"),
      struct(
        len.as("byte_len"),
        element_at(typedLit(Seq("png", "jpg", "webp")),
          (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)).as("format"),
        (pmod(len, lit(640)) + 1).cast(IntegerType).as("width"),
        (pmod(len * 7, lit(480)) + 1).cast(IntegerType).as("height"),
        (pmod(len, lit(30)) + 1).cast(IntegerType).as("n_frames")).as("meta"))
  }

  /** Decoded-feature schema produced by the (stubbed) decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("feat_dim", IntegerType),
    StructField("feature", ArrayType(DoubleType)),
    StructField("ok", BooleanType)))

  /**
   * STUB decoder — deterministic fake "pixel decode + feature extraction":
   * features are a folded byte histogram, accumulated in double in byte
   * order so the result is bit-identical to a sequential fold in any engine
   * (the DuckDB oracle reproduces it with a list comprehension). A real
   * implementation replaces only the body of `decodeOne`; the
   * partition-batch iteration (bounded memory, one decoder init per
   * partition) is the production shape.
   */
  object DecodeStub {
    val featDim = 8
    def decodeOne(payload: Array[Byte]): Array[Double] = {
      val acc = new Array[Double](featDim)
      var i = 0
      while (i < payload.length) {
        acc(i % featDim) += (payload(i) & 0xff) / 255.0
        i += 1
      }
      acc
    }

    /** Width of the SPECTRAL decode mode: 64 integer coefficients — the
      * stand-in for the 8×8 DCT block a real pHash thresholds. */
    val spectralDim = 64

    /** Deterministic KEYED weight table for the spectral fold, indexed
      * `(byte-class j)(byte value b)(coefficient k)` for the inner loop:
      * small signed integers in [−8, 8] from md5 of `dw|k|j|b` —
      * engine-portable like the projection planes (any engine regenerates
      * the identical 64×256×64 table; the DuckDB oracle replays it in
      * four lines), no baked-in constants. The weight must key on the
      * byte VALUE, not multiply it: a transform LINEAR in the raw byte
      * (`Σ bᵢ·W(k, i mod 64)`) concentrates the cross-document mean —
      * every doc shares the corpus byte distribution, so |E v_k| ≈ 3·σ
      * and most sketch bits freeze (measured: 20k md5-payload docs →
      * 11,449 distinct sketches, per-bit frequencies hitting 0.0/1.0 —
      * the r12 entropy cap reborn). Keying on (class, value) makes the
      * per-slot expectation ~0, so the DOC-specific selection is the
      * signal (same 20k docs → 20,000 distinct sketches, bit
      * frequencies 0.19–0.73). */
    private[llm] lazy val spectralWeights: Array[Array[Array[Long]]] =
      Array.tabulate(spectralDim, 256) { (j, b) =>
        Array.tabulate(spectralDim)(k =>
          TextHashing.md5Long60Kernel(s"dw|$k|$j|$b") % 17L - 8L)
      }

    /**
     * SPECTRAL decode — the full-entropy stand-in for "decode pixels, take
     * the 64 low-frequency DCT coefficients" (the real pHash front end):
     * `coef_k = Σ_i W(k, i mod 64, byte_i)` — a dense keyed integer
     * transform where EVERY byte feeds EVERY coefficient through a
     * content-selected weight, so the downstream 60-bit sketch draws
     * entropy from the whole 64-dim spectrum (the 8-dim histogram
     * [[decodeOne]] caps sketch entropy at ~10⁶ distinct values over 10M
     * rows, making corpus-wide radius-3 pair enumeration inherently
     * quadratic — measured, BASELINE.md r12; THIS mode is what makes the
     * 10M pair join real). Exact long arithmetic end-to-end:
     * |coef| ≤ 8·len, so the kernel's `64·coef − Σcoef` centering and ±1
     * projections stay inside a long for any realistic payload. Positions
     * ≡ (mod 64) share a weight column, so a same-class byte PERMUTATION
     * is a perceptual no-op — the planted-dup construction the oracles
     * replay.
     */
    def decodeSpectral(payload: Array[Byte]): Array[Long] = {
      val acc = new Array[Long](spectralDim)
      var i = 0
      while (i < payload.length) {
        val row = spectralWeights(i & 63)(payload(i) & 0xff)
        var k = 0
        while (k < spectralDim) { acc(k) += row(k); k += 1 }
        i += 1
      }
      acc
    }
  }

  /** Decode/feature-extract stage: typed `mapPartitions` over the payloads
    * with a per-partition "decoder" lifecycle (typed Dataset keeps Tungsten
    * encoding — no raw-RDD detour). Binary column pruned immediately after
    * use. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (e.g. JNI handle)
        it.map { case (id, payload) =>
          val ok = payload != null
          val feat = if (ok) DecodeStub.decodeOne(payload) else Array.empty[Double]
          MediaFeature(id, DecodeStub.featDim, feat.toSeq, ok)
        }
      }.toDF()
  }

  /** Perceptual-hash width: 60 bits — the repo's positive-BIGINT packing
    * discipline (md5Long60/simhash), banded 4×15 so Hamming ≤ 3 pair
    * search is EXHAUSTIVE by pigeonhole (the [[Dedup.simhashPairs]]
    * guarantee, reused verbatim). */
  val PhashBits = 60

  /** Deterministic ±1 projection planes from md5 parity (engine-portable,
    * the [[TextHashing]] discipline) — no baked-in constants, so any
    * engine regenerates the same planes from the string `ph|k|i`. Sized
    * for the 64-coefficient spectral decode. */
  private lazy val phashPlanes: Array[Array[Long]] =
    Array.tabulate(PhashBits, DecodeStub.spectralDim) { (k, i) =>
      if ((TextHashing.md5Long60Kernel(s"ph|$k|$i") & 1L) == 0L) 1L else -1L
    }

  /**
   * 60-bit perceptual sketch of one integer coefficient vector — the
   * pHash/dHash construction (mean-center, project, threshold the signs)
   * over the SPECTRAL decode ([[DecodeStub.decodeSpectral]]'s 64
   * coefficients, the stand-in for the DCT block a real pHash
   * thresholds). EXACT integer arithmetic end-to-end:
   * `u_i = d·f_i − Σf` (mean-centering scaled by `d` to stay integral —
   * removing the common brightness/length component is what makes the
   * bits content-discriminative), `bit_k = (Σ_i u_i·s(k,i)) > 0` — no
   * float sign decision anywhere, so any engine reproduces the bits
   * bit-for-bit. A featureless vector (all components equal ⇒ `u ≡ 0`,
   * e.g. an empty payload) has no perceptual signature and returns None
   * — the zero-norm cosine guard's analogue (every bit would be 0 and
   * all such media would pair with each other at Hamming 0).
   */
  private[graft] def phashKernel(f: Array[Long]): Option[Long] = {
    val d = f.length
    var s = 0L
    var i = 0
    while (i < d) { s += f(i); i += 1 }
    val u = new Array[Long](d)
    var anyNz = false
    i = 0
    while (i < d) {
      u(i) = d * f(i) - s
      if (u(i) != 0L) anyNz = true
      i += 1
    }
    if (!anyNz) None
    else {
      var h = 0L
      var k = 0
      while (k < PhashBits) {
        val pk = phashPlanes(k)
        var v = 0L
        var j = 0
        while (j < d) { v += u(j) * pk(j); j += 1 }
        if (v > 0L) h |= (1L << k)
        k += 1
      }
      Some(h)
    }
  }

  /** Per-media perceptual sketches `(id, sig)`: spectral decode + sketch
    * fused in ONE typed stage over the payload scan — zero shuffle
    * (PlanSpec); a production decoder would read its stored DCT-coefficient
    * column instead. Null payloads and featureless media emit nothing. */
  def phashSketches(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        if (payload == null) Iterator.empty
        else phashKernel(DecodeStub.decodeSpectral(payload))
          .map(h => (id, h)).iterator
      }.toDF("id", "sig")
  }

  /**
   * Cross-media perceptual near-dup pairs at `hamming ≤ maxHamming` —
   * the pHash sketch scan composed with the WIDE-KEY Hamming-LSH ring
   * ([[Dedup.simhashComboJoin]], Manku et al. 2007): C(6, 6−r)
   * 30-bit-wide block-combination keys, pigeonhole-EXHAUSTIVE at any
   * r ≤ 3 — the generator that survives 10M+ media rows, where
   * contiguous 15-bit bands drown in ~N²/2¹⁵ accidental candidates
   * (measured crossover in BASELINE.md; the PAIR SET is identical, both
   * verify exact Hamming). 100 TB shape: the only exchange carries
   * fixed-width `(key, id, sig)` rows — media bytes never shuffle; the
   * sketch is an 8-byte stored column in a production pipeline.
   */
  def phashPairs(media: DataFrame, maxHamming: Int = 3,
                 materialize: Boolean = false): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"6-block combo keys are exhaustive only for hamming <= 3 (and 15-bit" +
        s" keys below that), got $maxHamming")
    val sigs = phashSketches(media).persist()
    val out = Dedup.simhashComboJoin(sigs, maxHamming = maxHamming)
    Dedup.materializeAndRelease(out, materialize, sigs)
  }

  /**
   * Incremental perceptual near-dup: judge a NEW media batch against the
   * STORED corpus sketch table ([[phashSketches]]' `(id, sig)` rows,
   * materialized once per corpus) — the media pillar's analogue of the
   * text ring's incremental MinHash judgment. The batch is sketched (one
   * fused decode+sketch stage), its band keys BROADCAST into the corpus
   * sketch table's band expansion (the corpus is never re-decoded and
   * media bytes never move), candidates verified by exact sketch Hamming
   * (no second payload pass — the sketch IS the verifier at a pinned
   * radius), and each batch row reports its best corpus match
   * `(dup_of, hamming)` — min Hamming, ties to the smaller id — or
   * `keep = true`. Unsketchable batch rows (null payload / featureless)
   * have no perceptual identity and keep. Wide combination keys
   * ([[Dedup.comboKeyRows]]) make radius ≤ 3 exhaustive (pigeonhole) AND
   * survive 10M+ stored rows, so `keep` decisions are exact, not
   * probabilistic.
   */
  def phashIncremental(batch: DataFrame, corpusSigs: DataFrame,
                       maxHamming: Int = 3,
                       broadcastBatchLimit: Long = Dedup.MaxBroadcastBatchRows): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"6-block combo keys are exhaustive only for hamming <= 3, got $maxHamming")
    def bandsOf(sigs: DataFrame): DataFrame =
      Dedup.comboKeyRows(sigs, bits = 60, nBlocks = 6, maxHamming = maxHamming)
    // batch≪corpus broadcast contract made explicit (payload column is
    // pruned from the probe, which touches ≤ limit+1 rows — never a full
    // batch count) — see [[Dedup.MaxBroadcastBatchRows]]
    val batchSmall =
      Dedup.fitsBroadcast(batch.select(col("media_id")), broadcastBatchLimit)
    val bSigs = phashSketches(batch)
    val bKeys = bandsOf(bSigs).as("x")
    val cand = bandsOf(corpusSigs).as("c")
      .join(if (batchSmall) broadcast(bKeys) else bKeys,
        col("c.band") === col("x.band") && col("c.v") === col("x.v"))
      .select(col("x.id").as("id_a"), col("c.id").as("id_b"),
        col("x.sig").as("sa"), col("c.sig").as("sb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .where(col("hamming") <= maxHamming)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a").orderBy(col("hamming"), col("id_b"))
    val best = cand.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("id_a").as("media_id"), col("id_b").as("dup_of"),
        col("hamming"))
    batch.select(col("media_id"))
      .join(best, Seq("media_id"), "left")
      .withColumn("keep", col("dup_of").isNull)
  }

  /** Frame-packing bound for the canonical-election key
    * (`media_id·2²⁰ + frame_idx` — the same expression in any engine). */
  private val FramePackBits = 20

  /** Per-frame perceptual sketches for video media `(media_id, frame_idx,
    * sig)`: every `stride`-th frame's payload slice
    * (`bytes [⌊f·L/n⌋, ⌊(f+1)·L/n⌋)` — the [[sampleFrames]] indices over
    * an even byte split) is decoded and sketched in the same fused typed
    * stage. Empty/featureless slices emit nothing. */
  def frameSketches(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("kind") === "video")
      .select(col("media_id"), col("payload"), col("meta.n_frames"))
      .as[(Long, Array[Byte], Int)]
      .flatMap { case (id, payload, nf) =>
        if (payload == null || nf <= 0) Iterator.empty
        else {
          // both halves of the packed canonical key (media_id·2²⁰ +
          // frame_idx) are bounded fail-loud: an id ≥ 2⁴³ (or negative)
          // would overflow the long and corrupt the min-election silently
          require(id >= 0L && id < (1L << (63 - FramePackBits)),
            s"media_id $id outside [0, 2^${63 - FramePackBits}) — the packed " +
              "canonical-key election would overflow")
          val len = payload.length
          Iterator.range(0, nf, stride).flatMap { f =>
            require(f < (1 << FramePackBits),
              s"frame index $f exceeds the 2^$FramePackBits canonical-key bound")
            val a = (f.toLong * len / nf).toInt
            val b = ((f + 1).toLong * len / nf).toInt
            val slice = java.util.Arrays.copyOfRange(payload, a, b)
            phashKernel(DecodeStub.decodeSpectral(slice))
              .map(h => (id, f.toLong, h)).iterator
          }
        }
      }.toDF("media_id", "frame_idx", "sig")
  }

  /**
   * Frame-level CROSS-VIDEO dedup: perceptual frame sketches grouped by
   * exact signature; groups spanning ≥ 2 distinct videos are shared
   * content (a planted duplicate video shares EVERY sampled frame).
   * Output per duplicated signature: occurrence/video counts and the
   * canonical (min `(media_id, frame_idx)`) holder via the packed
   * integer key — the [[Dedup.exact]] election at frame granularity.
   * One fixed-width `(sig, media, frame)` exchange; video bytes never
   * shuffle.
   */
  def frameDupGroups(media: DataFrame, stride: Int): DataFrame = {
    val packed = col("media_id") * (1L << FramePackBits) + col("frame_idx")
    frameSketches(media, stride)
      .groupBy("sig")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("media_id")).as("n_media"),
        min(packed).as("ck"))
      .where(col("n_media") >= 2)
      // ck is non-negative, so the arithmetic shift IS the exact div 2^20
      .select(col("sig"), col("n_occ"), col("n_media"),
        call_function("shiftright", col("ck"), lit(FramePackBits))
          .as("canonical_media"),
        pmod(col("ck"), lit(1L << FramePackBits)).as("canonical_frame"))
  }

  /**
   * Frame-level cross-video NEAR-dup grouping — the Hamming ≤ `maxHamming`
   * generalization of [[frameDupGroups]] (whose exact-signature groups are
   * the radius-0 special case): perceptual frame sketches are clustered by
   * connected components over the near-dup pair graph, so re-encoded /
   * lightly-perturbed frames group with their exact twins. Candidate
   * generation rides the WIDE combination keys ([[Dedup.comboKeyRows]] —
   * pigeonhole-exhaustive at r ≤ 3 AND the generator that survives 10M+
   * frames); components come from [[Dedup.duplicateClusters]]' label
   * propagation over the PACKED frame key, so the cluster label IS the
   * canonical min `(media_id, frame_idx)` holder — no second election
   * pass. Output: one row per cluster spanning ≥ 2 distinct videos, with
   * occurrence/video/distinct-signature counts (`n_sigs > 1` ⇔ the
   * cluster holds genuine near-dups, not just exact twins). 100 TB shape:
   * the exchanges carry fixed-width `(key, id, sig)` rows and verified
   * pairs — video bytes never shuffle; dup-cluster diameters are tiny, so
   * the component closure converges in 2–4 rounds.
   */
  def frameNearDupGroups(media: DataFrame, stride: Int, maxHamming: Int = 3,
                         materialize: Boolean = true): DataFrame = {
    // materialize defaults TRUE here, unlike the pair generators: the
    // persisted frame-sketch table is internal (callers never see it), so
    // the lazy path has no release hook — materialize=false intentionally
    // leaves the sketch cached in the session cache for an immediately
    // following re-query and is for callers who manage
    // spark.catalog.clearCache() themselves.
    require(maxHamming >= 0 && maxHamming <= 3,
      s"6-block combo keys are exhaustive only for hamming <= 3, got $maxHamming")
    val packed = col("media_id") * (1L << FramePackBits) + col("frame_idx")
    val sigs = frameSketches(media, stride)
      .select(packed.as("id"), col("sig")).persist()
    val pairs = Dedup.simhashComboJoin(sigs, maxHamming = maxHamming)
    val clusters = Dedup.duplicateClusters(pairs, sigs.select(col("id")))
    val out = sigs.join(clusters, "id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(call_function("shiftright", col("id"),
          lit(FramePackBits))).as("n_media"),
        countDistinct(col("sig")).as("n_sigs"))
      .where(col("n_media") >= 2)
      .select(
        call_function("shiftright", col("cluster_id"), lit(FramePackBits))
          .as("canonical_media"),
        pmod(col("cluster_id"), lit(1L << FramePackBits)).as("canonical_frame"),
        col("n_occ"), col("n_media"), col("n_sigs"))
    Dedup.materializeAndRelease(out, materialize, sigs)
  }

  /**
   * Image-text pair gating (the LAION/CLIP-score filter shape): join each
   * media row's decoded features against its caption's embedding — folded
   * from 64 to the shared 8-dim space by congruence-class sums, the
   * deterministic stand-in for projecting both encoders into one space —
   * and gate on the cosine. Output one row per pair with the score and
   * the keep decision; zero-norm sides (undefined cosine) are excluded,
   * exactly like the embedding near-dup guard. 100 TB shape: one
   * id-equality hash join (pairs are 1:1 by construction — PlanSpec pins
   * no cartesian), per-row arithmetic only.
   */
  def pairFilter(media: DataFrame, emb: DataFrame, vecIdCol: String,
                 vecCol: String, threshold: Double): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val d = DecodeStub.featDim
    val mf = media.transform(decodeFeatures)
      .where(col("ok") && size(col("feature")) > 0)
      .select(col("media_id"), col("feature"))
    val tf = emb.select(col(vecIdCol).cast("long").as("media_id"),
      Similarity.asDouble(col(vecCol)).as("tv"))
    // fused gate kernel (the expression form of this 8-way fold + dot +
    // norms blows the 64 KB codegen method limit and falls back to
    // interpreted eval — one JIT kernel keeps the hot path compiled):
    // fold ascending within each congruence class, 6-dp-round both
    // sides, sequential IEEE dot/norms, HALF_UP cosine — the exact
    // expression order the oracle's list comprehensions replay.
    mf.join(tf, "media_id")
      .select(col("media_id"), col("feature"), col("tv"))
      .as[(Long, Seq[Double], Seq[Double])]
      .flatMap { case (id, f, tvRaw) =>
        if (tvRaw == null) Iterator.empty
        else {
          val mv = f.iterator.map(Similarity.roundHalfUp(_, 6)).toArray
          val tv = new Array[Double](d)
          var k = 0
          while (k < d) {
            var s = 0.0
            var j = k
            while (j < tvRaw.length) { s += tvRaw(j); j += d }
            tv(k) = Similarity.roundHalfUp(s, 6)
            k += 1
          }
          var dot = 0.0; var mn = 0.0; var tn = 0.0
          var i = 0
          while (i < mv.length) {
            dot += mv(i) * tv(i); mn += mv(i) * mv(i); tn += tv(i) * tv(i)
            i += 1
          }
          if (mn == 0.0 || tn == 0.0) Iterator.empty
          else {
            val c = Similarity.roundHalfUp(
              dot / (math.sqrt(mn) * math.sqrt(tn)), 6)
            Iterator.single((id, c, c >= threshold))
          }
        }
      }.toDF("media_id", "cosine", "kept")
  }

  /** Frame sampling for video-kind rows: emit every `stride`-th frame index
    * up to `meta.n_frames` — generator expression, no shuffle. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize stage for image/video rows: fit into a `box`×`box` bounding box
    * preserving aspect ratio, never upscaling (`max(1, ⌊dim·box/maxdim⌋)`).
    * The pixel work belongs to the stubbed decode step; THIS is the real
    * planning arithmetic a resize stage runs at scale — pure per-row integer
    * expressions (no shuffle), emitting target dims and the RGB byte volume
    * the resized media will occupy (the number that sizes the output
    * dataset and downstream `maxPartitionBytes`). */
  def resizeMeta(media: DataFrame, box: Int = 256): DataFrame = {
    val w = col("meta.width").cast(LongType)
    val h = col("meta.height").cast(LongType)
    val m = greatest(w, h)
    def fit(d: org.apache.spark.sql.Column) =
      when(m <= box, d).otherwise(greatest(floor(d * box / m), lit(1L)))
    media.where(col("kind") =!= "audio")
      .select(col("media_id"), col("kind"), w.as("width"), h.as("height"),
        fit(w).as("out_width"), fit(h).as("out_height"),
        (fit(w) * fit(h) * 3).as("out_bytes"))
  }
}
