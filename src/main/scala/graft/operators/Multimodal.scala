package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded via partition-mapped functions.
  *
  * The decode step is STUBBED (no image/audio libraries in this
  * environment) with a deterministic md5-based fake — the Spark-side
  * contract is real and tested: binary in, fixed-width feature vector +
  * dimensions out, one decoder instance per partition (expensive codec init
  * amortized across the partition, the Scala equivalent of `mapInPandas`
  * batch processing).
  *
  * Scale: decode is embarrassingly parallel map-side work; the only design
  * rule at 100 TB is to keep assets in their own column chunk (parquet does
  * this for free) so metadata-only queries never read the bytes — verified
  * by checking `ReadSchema` excludes the binary column when unused.
  */
object Multimodal {

  /** Decoded-asset contract: dimensions + duration + fixed-width features. */
  case class DecodedAsset(width: Int, height: Int, durationMs: Long, features: Array[Double])

  /** Pluggable decoder; one instance per partition. */
  trait AssetDecoder extends Serializable {
    def open(): Unit = ()
    def decode(bytes: Array[Byte]): DecodedAsset
    def close(): Unit = ()
  }

  /** STUB: deterministic fake decode from the md5 of the payload. A real
    * deployment swaps in an actual codec (javacv / ffmpeg JNI); everything
    * else on the Spark side is unchanged. */
  object StubDecoder extends AssetDecoder {
    def decode(bytes: Array[Byte]): DecodedAsset = {
      val hex = MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      def slice(i: Int): Int = Integer.parseInt(hex.substring(i * 4, i * 4 + 4), 16)
      DecodedAsset(
        width = 1 + slice(0) % 1024,
        height = 1 + slice(1) % 640,
        durationMs = slice(2).toLong,
        features = Array.tabulate(4)(j => slice(j) / 65535.0))
    }
  }

  /** Ingestion shape: wrap a payload column as an opaque binary asset with a
    * mime tag. (In production the binary arrives from the source directly.) */
  def asAsset(df: DataFrame, payloadCol: String, mime: String): DataFrame =
    df.withColumn("asset", encode(col(payloadCol), "UTF-8"))
      .withColumn("mime", lit(mime))

  /** Partition-mapped decode: appends width/height/duration_ms/f0..f3.
    * Decoder opens once per partition. A NULL asset (a fetch that never
    * landed) decodes to NULL metadata instead of an NPE from inside the
    * partition map — one missing blob must not kill a 100 TB decode pass,
    * and downstream filters/aggregates skip NULLs naturally. */
  def decodeAssets(df: DataFrame, binCol: String, decoder: AssetDecoder = StubDecoder): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("f0", DoubleType), StructField("f1", DoubleType),
      StructField("f2", DoubleType), StructField("f3", DoubleType)))
    val binIdx = inSchema.fieldIndex(binCol)
    val nullTail = Seq[Any](null, null, null, null, null, null, null)
    df.mapPartitions { it =>
      decoder.open()
      val out = it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        if (bytes == null) Row.fromSeq(row.toSeq ++ nullTail)
        else {
          val d = decoder.decode(bytes)
          Row.fromSeq(row.toSeq ++ Seq[Any](d.width, d.height, d.durationMs,
            d.features(0), d.features(1), d.features(2), d.features(3)))
        }
      }
      out // decoder.close() on iterator exhaustion is the caller's concern in this stub
    }(Encoders.row(outSchema))
  }

  /** Frame sampling (video): one row per sampled frame index, stepping
    * `everyNms` through the duration — pure metadata explode, no decode. */
  def sampleFrames(df: DataFrame, durationCol: String, everyNms: Long): DataFrame =
    df.withColumn("frame_ms",
      explode(sequence(lit(0L), col(durationCol), lit(everyNms))))

  /** Resize metadata preserving aspect ratio so max(dim) == maxDim (no
    * pixel work — the stub decode contract carries dims only). */
  def resizeMeta(df: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim.toDouble) / greatest(col("width"), col("height")))
    df.withColumn("resized_width", floor(col("width") * scale).cast(IntegerType))
      .withColumn("resized_height", floor(col("height") * scale).cast(IntegerType))
  }
}
