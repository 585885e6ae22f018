package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode/feature plumbing.
  *
  * The Spark-side design is real and tested — schema, partition
  * shape, per-partition batch processing; the codec itself is STUBBED
  * (no image/audio libraries in this container): [[StubDecoder]] is a
  * deterministic fake that a real implementation (JavaCPP/FFmpeg, or
  * `mapInPandas`+PIL on a PySpark edge) would replace 1:1 — the
  * `mapPartitions` batch shape is exactly what a vectorized decoder
  * wants.
  */
object Multimodal {

  /** Media row: payload + typed metadata, the storage schema for a
    * multimodal corpus (payloads inline for small media; at scale the
    * binary column holds a pointer + byte-range into object storage
    * and the same operators apply).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("size_bytes", LongType),
      StructField("checksum", StringType),
      StructField("source", StringType))))))

  /** Attach typed metadata to a binary payload column — pure column
    * expressions, runs in the scan stage.
    */
  def withMetadata(df: DataFrame, payloadCol: String = "payload",
      sourceCol: String = "source"): DataFrame =
    df.withColumn("meta", struct(
      length(col(payloadCol)).cast("long").as("size_bytes"),
      md5(col(payloadCol)).as("checksum"),
      col(sourceCol).as("source")))

  /** Decoded-feature record produced by the (stubbed) decoder. */
  case class DecodedFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** The decode seam. Real impl: JNI/FFI codec. The stub derives
    * deterministic fake dimensions/features from the payload bytes so
    * the distributed plumbing is testable end-to-end.
    */
  trait Decoder extends Serializable {
    def decode(mediaId: Long, payload: Array[Byte]): DecodedFeatures
  }

  /** The fake is derived from the md5 hex digest of the payload —
    * NOT a JVM hash — so a SQL oracle can mirror it exactly
    * (`md5()` + per-nibble `substr`/`ascii` arithmetic): nibble i is
    * hex digit i, width/height pack two nibbles each, n_frames is a
    * payload-length residue, features are nibbles scaled to [0,1].
    */
  object StubDecoder extends Decoder {
    override def decode(mediaId: Long, payload: Array[Byte]): DecodedFeatures = {
      // ??? <- real codec goes here; deterministic fake below.
      val bytes = if (payload == null) Array.emptyByteArray else payload
      val hex = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      def nib(i: Int): Int = Character.digit(hex.charAt(i), 16)
      DecodedFeatures(
        media_id = mediaId,
        width = 16 + nib(0) * 16 + nib(1),
        height = 16 + nib(2) * 16 + nib(3),
        n_frames = 1 + bytes.length % 16,
        feature = Array.tabulate(8)(i => nib(4 + i) / 15.0f))
    }
  }

  /** Distributed decode: one decoder instance per partition (codecs
    * are expensive to init), rows streamed through it — the Scala
    * analog of `mapInPandas` batch processing. Narrow (no shuffle);
    * repartition upstream to match decoder parallelism to cores.
    */
  def decodeFeatures(media: DataFrame, decoder: Decoder,
      idCol: String = "media_id", payloadCol: String = "payload"): Dataset[DecodedFeatures] = {
    val enc = Encoders.product[DecodedFeatures]
    val idIdx = media.schema.fieldIndex(idCol)
    val payloadIdx = media.schema.fieldIndex(payloadCol)
    media.mapPartitions { rows: Iterator[Row] =>
      rows.map(r => decoder.decode(r.getLong(idIdx), r.getAs[Array[Byte]](payloadIdx)))
    }(enc)
  }

  /** Resize stub: the Spark-side plumbing of an image resize —
    * per-partition batch transform (one resizer instance per
    * partition, same seam as [[decodeFeatures]]), typed output dims,
    * payload replaced by the "resized" bytes. The stub decodes the
    * payload as UTF-8 and keeps the first targetW*targetH CODE
    * POINTS re-encoded (a real codec swaps in scaled pixel data;
    * everything around it — schema, partitioning, batch shape — is
    * what production keeps). Code points, not bytes, so a SQL oracle
    * mirrors it exactly via character substr for any text, multibyte
    * included.
    */
  case class ResizedMedia(
      media_id: Long, width: Int, height: Int, payload: Array[Byte])

  def resizeStub(media: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "media_id", payloadCol: String = "payload"): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0,
      s"target dims must be positive, got ${targetW}x$targetH")
    val enc = Encoders.product[ResizedMedia]
    val idIdx = media.schema.fieldIndex(idCol)
    val payloadIdx = media.schema.fieldIndex(payloadCol)
    val cap = targetW * targetH
    media.mapPartitions { rows: Iterator[Row] =>
      // per-partition init site (a real resizer allocates here)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val in = if (bytes == null) Array.emptyByteArray else bytes
        val s = new String(in, java.nio.charset.StandardCharsets.UTF_8)
        val keep = math.min(s.codePointCount(0, s.length), cap)
        val sliced = s.substring(0, s.offsetByCodePoints(0, keep))
        ResizedMedia(
          media_id = r.getLong(idIdx),
          width = targetW,
          height = targetH,
          payload = sliced.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }(enc)
  }

  /** Frame sampling stub for video payloads: byte-range slices stand
    * in for frames (a real demuxer replaces the slicing, the
    * explode-to-frames shape stays).
    */
  def sampleFrames(media: DataFrame, everyNBytes: Int = 64,
      payloadCol: String = "payload"): DataFrame = {
    val n = length(col(payloadCol))
    // integer frame index: Column./ is double division, which sequence()
    // rejects — floor back to int
    val offsets = sequence(lit(0),
      greatest(floor((n - 1) / everyNBytes).cast("int"), lit(0)))
    media
      .withColumn("frame_no", explode(offsets))
      .withColumn("frame_bytes",
        expr(s"substring($payloadCol, frame_no * $everyNBytes + 1, $everyNBytes)"))
  }
}
