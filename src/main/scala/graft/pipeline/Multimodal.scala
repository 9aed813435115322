package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns + typed metadata, with decode / feature-extraction
  * staged as partition-wise batch transforms.
  *
  * The Spark-side contract (schema, partitioning, batch shape) is real and
  * tested; the actual codec step is a clearly-marked deterministic STUB —
  * this container has no image/audio libraries. Swapping `stubDecode` for a
  * real decoder (e.g. JNI/FFI or `mapInPandas` on PySpark) changes no plan
  * shape: it stays a narrow mapPartitions with no shuffle.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach a synthetic binary payload + metadata to a text corpus (stand-in
    * for reading real media; payload = utf-8 bytes, metadata derived
    * deterministically). */
  def attachFakeMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", to_binary(col(textCol), lit("utf-8")))
      .withColumn("media_meta", struct(
        lit("fake/raw").alias("format"),
        (pmod(length(col(textCol)), lit(64)) + 1).cast("int").alias("width"),
        (pmod(length(col(textCol)), lit(48)) + 1).cast("int").alias("height"),
        length(col(textCol)).cast("long").alias("n_bytes")))

  /** STUB decoder: deterministic 8-dim "feature vector" from the payload
    * bytes. ??? replace with a real codec — the signature (bytes, meta) →
    * Array[Float] and the partition-wise batch shape are the real contract. */
  private def stubDecode(bytes: Array[Byte], width: Int, height: Int): Array[Float] = {
    val feat = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      feat(i % 8) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    var j = 0
    while (j < 8) { feat(j) = feat(j) / math.max(1, bytes.length) * width / math.max(1, height); j += 1 }
    feat
  }

  /** Partition-wise feature extraction over the binary column: narrow (no
    * shuffle), batched per partition — the exact plan shape a real decoder
    * needs (decoder init amortized per partition, not per row). */
  def extractFeatures(df: DataFrame, mediaCol: String = "media",
      metaCol: String = "media_meta"): DataFrame = {
    val schema = df.schema.add(StructField("media_feat",
      ArrayType(FloatType, containsNull = false)))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val metaIdx = df.schema.fieldIndex(metaCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handles, buffers)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](mediaIdx)
        val meta = row.getStruct(metaIdx)
        val feat = stubDecode(bytes, meta.getInt(1), meta.getInt(2))
        Row.fromSeq(row.toSeq :+ feat.toSeq)
      }
    }(enc)
  }

  /** STUB resize: deterministic byte subsampling standing in for a real
    * image rescale — output payload length scales with the target pixel
    * count and the metadata reflects the new dimensions. Same narrow
    * partition-wise contract as extractFeatures: swapping in a real codec
    * changes no plan shape. */
  def resizeMedia(df: DataFrame, newWidth: Int, newHeight: Int,
      mediaCol: String = "media", metaCol: String = "media_meta"): DataFrame = {
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val metaIdx = df.schema.fieldIndex(metaCol)
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](mediaIdx)
        val meta = row.getStruct(metaIdx)
        val oldPixels = math.max(1, meta.getInt(1) * meta.getInt(2))
        val newPixels = newWidth * newHeight
        // an empty payload stays empty (there is no byte to subsample)
        val outLen = if (bytes.isEmpty) 0
          else math.max(1, (bytes.length.toLong * newPixels / oldPixels).toInt)
        val out = new Array[Byte](outLen)
        var i = 0
        while (i < outLen) {
          out(i) = bytes(((i.toLong * bytes.length) / outLen).toInt)
          i += 1
        }
        val newMeta = Row(meta.getString(0), newWidth, newHeight, outLen.toLong)
        val seq = row.toSeq.toArray
        seq(mediaIdx) = out
        seq(metaIdx) = newMeta
        Row.fromSeq(seq.toIndexedSeq)
      }
    }(enc)
  }

  /** Deterministic frame-sampling plan for video-like payloads: emit one
    * row per sampled frame offset (explode — narrow, no shuffle). */
  def sampleFrames(df: DataFrame, metaCol: String = "media_meta",
      everyNBytes: Long = 1024): DataFrame =
    df.withColumn("frame_offset",
      // empty payloads sample zero frames — an unguarded sequence(0, -1)
      // is an illegal-boundaries runtime error, not an empty array
      explode(when(col(s"$metaCol.n_bytes") > 0,
        sequence(lit(0L), col(s"$metaCol.n_bytes") - 1, lit(everyNBytes)))
        .otherwise(array().cast("array<bigint>"))))
}
