package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: media rides as opaque `binary` columns;
  * per-item work (decode / feature-extract / frame-sample) runs in
  * partition-batched iterator form via `mapPartitions` — the Scala/Tungsten
  * analog of PySpark's `mapInPandas` batch shape (one iterator per
  * partition, streaming through rows without materializing the partition).
  *
  * The container ships no image/audio codecs, so the decode step is a
  * DETERMINISTIC STUB — a byte-histogram "feature vector" and byte-slice
  * "frames" — while everything Spark-side is real: binary columns, explicit
  * schemas, partition-batched UDF signature, and downstream joins/aggs.
  * Swap `decodeStub` for a real codec call and nothing else changes.
  *
  * Scale: narrow maps, no shuffle; binary payloads stay columnar in
  * parquet; feature vectors are small fixed-size arrays suitable for the
  * `graft.queries.SimilarityQueries` ANN paths.
  */
object Multimodal {

  case class MediaFeature(doc_id: Long, feat_idx: Int, feat_value: Double)
  case class MediaFrame(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** DECODE STUB: stands in for an image/audio decoder. Deterministic:
    * class histogram of payload bytes (mod `dim`). */
  private[multimodal] def decodeStub(bytes: Array[Byte], dim: Int): Array[Long] = {
    val hist = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1; i += 1 }
    hist
  }

  /** Feature extraction over a binary payload column, one output row per
    * (item, feature-slot), normalized by payload length. Partition-batched:
    * the lambda sees a whole partition's iterator (mapInPandas shape). */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      dim: Int = 16): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val n = math.max(bytes.length, 1)
          decodeStub(bytes, dim).iterator.zipWithIndex.map { case (c, i) =>
            MediaFeature(id, i, c.toDouble / n)
          }
        }
      }
  }

  case class ResizedMedia(doc_id: Long, resized_len: Int, resized_md5: String)

  /** RESIZE STUB: stands in for an image/audio resampler — keeps every
    * `stride`-th byte of the payload (a real resizer swaps only the inner
    * function; schema, batch shape, and downstream metadata stay fixed). */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
             stride: Int = 4): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) =>
          val out = Array.range(0, bytes.length, stride).map(bytes(_))
          ResizedMedia(id, out.length, md.digest(out).map("%02x".format(_)).mkString)
        }
      }
  }

  /** Frame sampling over a binary payload treated as fixed-size frames
    * (a video decoder stub): every `stride`-th 256-byte frame, fingerprinted
    * with md5. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   frameSize: Int = 256, stride: Int = 4): Dataset[MediaFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, bytes) =>
          val nFrames = math.ceil(bytes.length.toDouble / frameSize).toInt
          (0 until nFrames).filter(_ % stride == 0).map { f =>
            val from = f * frameSize
            val until = math.min(from + frameSize, bytes.length)
            val hex = md.digest(java.util.Arrays.copyOfRange(bytes, from, until))
              .map("%02x".format(_)).mkString
            MediaFrame(id, f, hex)
          }
        }
      }
  }
}
