package graft.llm

import org.apache.spark.sql.DataFrame
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
