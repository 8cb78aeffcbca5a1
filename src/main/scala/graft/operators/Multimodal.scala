package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 mm_*): media ride along as
  * opaque `binary` columns with typed metadata structs; decode / feature
  * extraction runs batch-wise per partition.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB (`stubDecode`); everything around it —
  * the binary payload schema, the metadata struct, the mapPartitions batch
  * shape, partition sizing — is the real plumbing a decoder would drop
  * into.
  *
  * Scale: payloads never leave their partition (no shuffle); feature
  * extraction is a narrow map, so a 100-TB corpus processes at scan speed
  * with decode parallelism = partition count.
  */
object Multimodal {

  /** Expression-level plumbing: binary payload + metadata + a stub scalar
    * feature, all engine-agnostic. The raw payload stays binary here (this
    * is the frame `extractFeatures` consumes). */
  def binaryColumns(documents: DataFrame): DataFrame =
    documents
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("header_hex", upper(hex(substring(col("text"), 1, 8).cast("binary"))))
      .withColumn("modality", lit("text/utf-8"))
      .withColumn("fake_feature", (col("n_bytes") % 7).cast("double") / 7.0)
      .select("doc_id", "payload", "n_bytes", "header_hex", "modality",
        "fake_feature")
      .orderBy("doc_id")

  /** Query view (oracle-checked as mm_binary): the raw payload is projected
    * to its md5 digest so every output column is flat and comparable —
    * payload bytes themselves never need to leave the executors. */
  def binaryColumnsChecked(documents: DataFrame): DataFrame =
    binaryColumns(documents)
      .withColumn("payload_md5", md5(col("payload")))
      .select("doc_id", "payload_md5", "n_bytes", "header_hex", "modality",
        "fake_feature")
      .orderBy("doc_id")

  /** One decoded media item: id + fixed-length feature vector. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, features: Array[Float])

  /** STUB decode kernel — stands in for an image/audio decoder
    * (deterministic: byte histogram folded to `dim` buckets, normalized).
    * A real deployment swaps this body for e.g. JPEG decode + model
    * features; the signature (bytes → fixed-dim float vector) is the
    * contract the pipeline depends on. */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc((payload(i) & 0xff) % dim) += 1.0f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    acc.map(_ / n)
  }

  /** Batch feature extraction: binary payloads → fixed-dim vectors, one
    * partition at a time (the Scala analog of a pandas-UDF `mapInPandas`
    * batch: the iterator processes rows lazily without materializing the
    * partition). */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("doc_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        MediaFeatures(r.getAs[Long]("doc_id"), payload.length.toLong,
          stubDecode(payload, dim))
      }
    }
  }
}
