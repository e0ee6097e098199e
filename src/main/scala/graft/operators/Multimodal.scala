package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE north star): image/audio/video
  * as opaque `binary` columns + typed metadata, with decode /
  * feature-extract / frame-sample as per-partition batch transforms.
  *
  * The Spark-side mechanics here are REAL — schema, partition-batched
  * execution, fixed feature shapes, deterministic outputs — while the
  * decode itself is a clearly-marked STUB (`stubDecodeFeatures`): the
  * image/audio codecs aren't in this container, so the stub derives a
  * deterministic byte-histogram "feature vector" of the right shape.
  * Swapping in a real codec changes ONLY the function body: the
  * mapPartitions boundary is exactly where a JNI/FFI decoder with
  * per-partition init (model load, codec context) belongs — the same
  * shape `mapInPandas` gives PySpark, minus the Python round-trip.
  */
object Multimodal {

  /** Media-table schema: opaque payload + typed metadata (the pattern
    * for any binary modality).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),       // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  val FeatureDim = 16

  /** STUB decode: byte-value histogram over `FeatureDim` buckets,
    * L1-normalized. Deterministic, shape-stable, and cheap — replace
    * with a real decoder (JNI/codec) without touching callers.
    */
  def stubDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xFF) * FeatureDim / 256) += 1f
        i += 1
      }
      var j = 0
      while (j < FeatureDim) { hist(j) /= bytes.length; j += 1 }
    }
    hist
  }

  /** Frame sampling STUB: every `stride`-th 256-byte block stands in
    * for a decoded frame; real video sampling keeps the same
    * (media_id, frame_idx, frame_bytes) contract.
    */
  def stubSampleFrames(bytes: Array[Byte], stride: Int): Seq[(Int, Array[Byte])] =
    if (bytes == null) Seq.empty
    else bytes.grouped(256).zipWithIndex.collect {
      case (chunk, idx) if idx % stride == 0 => (idx, chunk)
    }.toSeq

  /** Decode a media frame-batch per partition: one decoder context per
    * partition (init cost amortized over the batch, exactly where a
    * real codec's native context lives), preserving partitioning — no
    * shuffle.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(FloatType))))
    val rdd = media.select(col("media_id"), col("kind"), col("bytes"))
      .rdd.mapPartitions { it =>
        // per-partition "decoder init" happens here in a real codec
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          Row(r.getLong(0), r.getString(1),
            if (bytes == null) 0L else bytes.length.toLong,
            stubDecodeFeatures(bytes).toSeq)
        }
      }
    media.sparkSession.createDataFrame(rdd, out)
  }

  /** Explode sampled frames relationally: (media_id, frame_idx,
    * frame_bytes) rows ready for a per-frame model pass.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_bytes", BinaryType)))
    val rdd = media.select(col("media_id"), col("bytes"))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          stubSampleFrames(bytes, stride).map { case (idx, chunk) =>
            Row(r.getLong(0), idx, chunk)
          }
        }
      }
    media.sparkSession.createDataFrame(rdd, out)
  }

  /** Metadata-only resize (images): pure column transform — the
    * payload transform would live in [[decodeFeatures]]'s partition
    * pass.
    */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      col("meta").withField("width", lit(w)).withField("height", lit(h)))
}
