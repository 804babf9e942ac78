package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** A media "payload" row: opaque bytes + typed metadata. In production
  * the payload is an image/audio/video blob; here it is the document's
  * UTF-8 bytes — the container has no media codecs, so DECODE is a
  * deterministic stub while the Spark-side plumbing (binary column,
  * schema, partition-parallel batch iteration) is real and tested.
  */
case class MediaRecord(doc_id: Long, payload: Array[Byte], n_chars: Int,
                       modality: String)

/** Extracted metadata — what a real decoder would emit (dims/channels
  * here are a deterministic function of content length: the stub).
  */
case class MediaMeta(doc_id: Long, n_bytes: Int, sha: String, width: Int,
                     height: Int, channels: Int)

/** Multimodal-column plumbing: treat media as opaque `binary` with typed
  * metadata (builder brief). Two equivalent decode paths prove the
  * plumbing end-to-end:
  *
  *  - `metaExpressions`: pure codegen'd column expressions (the fast path
  *    when the "decode" is expressible);
  *  - `decodePartitions`: `mapPartitions` over a typed Dataset — the shape
  *    a real decoder takes (per-partition batch iteration, one codec init
  *    per partition, like a Pandas-UDF batch on the PySpark side). Both
  *    produce identical rows, so one DuckDB oracle checks both.
  *
  * Scale: payloads stay distributed (never collected); a real pipeline
  * would store blobs in the lake and carry (path, offset, len) pointers —
  * the metadata schema here is that pointer record's shape.
  */
object Multimodal {

  /** The media table: documents' bytes as the opaque payload. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      length(col("text")).as("n_chars"), col("source").as("modality"))

  private def fakeWidth(nChars: org.apache.spark.sql.Column) =
    (lit(16) + nChars % 240)

  private def fakeHeight(nChars: org.apache.spark.sql.Column) =
    (lit(16) + (nChars * 7) % 240)

  /** Expression path: metadata extraction fully inside codegen. */
  def metaExpressions(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("sha"),
      fakeWidth(col("n_chars")).as("width"),
      fakeHeight(col("n_chars")).as("height"),
      lit(3).as("channels"))

  /** mapPartitions path: the real-decoder shape. One "codec" (here: a
    * MessageDigest) is initialized per partition and reused across the
    * partition's rows — the pattern that amortizes real codec setup.
    */
  def decodePartitions(media: DataFrame): Dataset[MediaMeta] = {
    val ds = media.as[MediaRecord](Encoders.product[MediaRecord])
    ds.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        md.reset()
        val sha = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaMeta(r.doc_id, r.payload.length, sha,
          16 + r.n_chars % 240, 16 + (r.n_chars * 7) % 240, 3)
      }
    }(Encoders.product[MediaMeta])
  }
}
