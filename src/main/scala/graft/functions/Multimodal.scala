package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, exactly how a 100TB multimodal corpus is
  * laid out (content-addressed blobs + structured sidecars).
  *
  * The decode/feature-extract step is a deterministic STUB — the image and
  * audio codec libraries are not in this container — but the Spark-side
  * contract is real and tested: schema, partition-preserving batch
  * iteration (`mapPartitions`, the Scala analogue of `mapInPandas`: one
  * iterator of rows per partition, batched work, no per-row ser/de), and
  * the UDF signature (bytes in → struct of features out).
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, n_bytes: Long, format: String, checksum: Long)
  final case class DecodedRow(media_id: Long, kind: String, meta: MediaMeta, frames: Array[Long])

  /** STUB decoder: derives deterministic pseudo-metadata from the raw
    * bytes. A real deployment swaps this body for an actual codec call;
    * the signature (Array[Byte] → MediaMeta) is the contract.
    *
    * The checksum is the md5-derived [[TextHash.hash60]] so the DuckDB
    * oracle can replay width/height exactly:
    * `checksum = CAST('0x'||substr(md5(payload_text),1,15) AS BIGINT)`,
    * `width = 64 + checksum % 1920`, `height = 64 + (checksum >> 17) % 1080`.
    */
  def decodeStub(bytes: Array[Byte], kind: String): MediaMeta = {
    val h = TextHash.hash60(bytes) // non-negative 60-bit
    val w = 64 + (h % 1920L).toInt
    val hgt = 64 + ((h >> 17) % 1080L).toInt
    MediaMeta(w, hgt, bytes.length.toLong, kind, h)
  }

  /** Frame-sample stub: n evenly spaced deterministic frame signatures. */
  def frameSampleStub(meta: MediaMeta, n: Int): Array[Long] =
    Array.tabulate(n)(i => meta.checksum ^ graft.corpus.CorpusGen.mix(i.toLong))

  /** Decode + feature-extract over a (media_id, kind, payload binary)
    * table. Partition-preserving batch iteration; the decode never crosses
    * a shuffle boundary.
    */
  def decodeAndExtract(spark: SparkSession, media: DataFrame, frames: Int = 4): Dataset[DecodedRow] = {
    import spark.implicits._
    val nf = frames
    media.select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val meta = decodeStub(if (payload == null) Array.empty else payload, kind)
          val fr = if (kind == "video" || kind == "audio") frameSampleStub(meta, nf) else Array.empty[Long]
          DecodedRow(id, kind, meta, fr)
        }
      }
  }

  /** Build a synthetic media table from the documents table: payload =
    * UTF-8 bytes of the text (an opaque blob as far as the pipeline is
    * concerned), kind rotating by id.
    */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("video"), lit("audio")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
  }

  /** "Resize" stub: maps metadata through a deterministic scale — the
    * shape of a distributed image-resize stage (pure column math once the
    * decode produced metadata).
    */
  def resizePlan(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim).cast("double") / greatest(col("meta.width"), col("meta.height")))
    decoded.withColumn("out_width", floor(col("meta.width") * scale).cast("int"))
      .withColumn("out_height", floor(col("meta.height") * scale).cast("int"))
      .withColumn("scale", round(scale, 4))
  }
}
