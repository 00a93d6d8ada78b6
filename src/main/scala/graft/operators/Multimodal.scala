package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryModule, Tables}

/** Multimodal-column plumbing: media as opaque BINARY columns with typed
  * metadata, processed by per-partition decoders.
  *
  * The container has no image/audio codecs, so [[FakeCodec]] is a
  * deterministic stand-in (clearly marked): it "decodes" a binary payload
  * into (n_bytes, checksum, fake width/height from header bytes) and
  * "frame-samples" by striding the payload. The Spark-side shape is real:
  * binary columns, case-class schemas, `mapPartitions` batch decode (the
  * Scala analogue of `mapInPandas` — one codec instance per partition, not
  * per row), and partition-count control for decoder parallelism.
  */
object Multimodal extends QueryModule {

  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      checksum: String,
      width: Int,
      height: Int,
      n_frames: Int
  )

  /** Deterministic fake decoder — replace with a real codec binding in a
    * production image. Reads "dimensions" from the first header bytes and
    * samples every 1024th byte as a "frame". */
  object FakeCodec {
    def decode(doc_id: Long, payload: Array[Byte]): MediaMeta = {
      val md  = java.security.MessageDigest.getInstance("MD5")
      val sum = md.digest(payload).map("%02x".format(_)).mkString
      val w   = if (payload.length > 0) (payload(0) & 0x7f) + 1 else 0
      val h   = if (payload.length > 1) (payload(1) & 0x7f) + 1 else 0
      MediaMeta(doc_id, payload.length.toLong, sum, w, h, payload.length / 1024 + 1)
    }
  }

  /** Typed decode stage: one codec per partition, batch iteration —
    * the distributed decode shape a real pipeline needs. */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup cost happens once here (codec init in real life)
      it.map(r => FakeCodec.decode(r.doc_id, r.payload))
    }
  }

  /** Documents' text bytes treated as opaque media payloads. */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables
      .documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Oracle-checkable binary metadata: byte length, md5, header hex — pure
    * built-ins (the codegen'd subset of the decode). */
  def binaryMeta(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast(LongType).as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("checksum"),
        lower(hex(substring(encode(col("text"), "UTF-8"), 1, 8))).as("header_hex")
      )

  /** Decoded metadata aggregated per source — exercises the mapPartitions
    * decode path end-to-end (fake widths/heights are deterministic, so this
    * is still oracle-checkable via byte arithmetic in SQL). */
  def decodeStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src  = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val meta = decodeAll(mediaFromDocuments(s, dir))
    meta
      .toDF()
      .join(src, Seq("doc_id"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("width").cast(LongType)).as("sum_width"),
        sum(col("height").cast(LongType)).as("sum_height"),
        sum(col("n_frames").cast(LongType)).as("sum_frames")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_binary_meta"  -> (binaryMeta _),
    "q51_decode_stats" -> (decodeStats _)
  )

  val oracles: Map[String, String] = Map(
    "q50_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  lower(hex(encode(substring(text, 1, 8)))) AS header_hex
        |FROM documents""".stripMargin,
    "q51_decode_stats" ->
      """SELECT source, count(*) AS n_media,
        |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |  CAST(sum((ascii(substring(text, 1, 1)) % 128) + 1) AS BIGINT) AS sum_width,
        |  CAST(sum((ascii(substring(text, 2, 1)) % 128) + 1) AS BIGINT) AS sum_height,
        |  CAST(sum(octet_length(CAST(text AS BLOB)) // 1024 + 1) AS BIGINT) AS sum_frames
        |FROM documents GROUP BY source""".stripMargin
  )
}
