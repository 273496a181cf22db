package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline.
  *
  * Media (image/audio/video) is carried as an opaque `binary` payload
  * column plus typed metadata, and "decoded" per partition with
  * `Dataset.mapPartitions` — the Scala analog of `mapInPandas`: the
  * executor streams batches of blobs through a decode function without
  * ever collecting to the driver. The literal Pandas-UDF form of the
  * same operator (binary payload → `mapInPandas` → typed feature
  * schema, vectorized pandas batches) is exercised end-to-end by
  * `tools/pymultimodal_smoke.py`, cross-checked value-for-value
  * against this stub's arithmetic.
  *
  * ==== STUB ====
  * No image/audio libraries exist in this container, so [[decodeStub]]
  * is a DETERMINISTIC FAKE decoder (dimensions and features derived
  * arithmetically from the payload bytes). The Spark-side plumbing —
  * binary schema, typed Encoders, partition-wise batch iteration, output
  * schema — is real and oracle-tested; swapping `decodeStub` for a JNI/
  * JavaCV decoder changes no query shape.
  */
object Multimodal {

  /** Opaque media blob + typed metadata. */
  final case class MediaBlob(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (fake, deterministic — see STUB note). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int,
      n_bytes: Long,
      byte_sum: Long)

  /** STUB decode: byte statistics in lieu of pixel decode. Pure and
    * per-element — safe to run inside `mapPartitions` on executors. */
  def decodeStub(blob: MediaBlob): MediaFeatures = {
    var sum = 0L
    var i = 0
    val p = blob.payload
    while (i < p.length) { sum += (p(i) & 0xff); i += 1 }
    MediaFeatures(
      doc_id = blob.doc_id,
      media_type = blob.media_type,
      width = (p.length % 640) + 16,
      // widen BEFORE the multiply: p.length * 7 overflows Int32 past
      // ~307 MB payloads, and a negative % stays negative in Scala —
      // the oracle computes this in BIGINT
      height = ((p.length.toLong * 7L) % 480L).toInt + 16,
      n_frames = (p.length % 16) + 1,
      n_bytes = p.length.toLong,
      byte_sum = sum)
  }

  /** The operator: blobs → features, executed partition-wise. */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeStub))
  }

  /** One sampled frame of a video-like payload (STUB: the "frame" is a
    * byte slice; a real decoder would emit pixel buffers). */
  final case class Frame(doc_id: Long, k: Int, frame_idx: Int, frame_off: Long, frame_len: Int)

  /** Frame sampling: each blob yields 4 evenly-spaced frame references —
    * the flatMap shape (1 row in, N rows out per media item) of a
    * frame-extraction pipeline. */
  def sampleFrames(blobs: Dataset[MediaBlob]): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap { b =>
      val nBytes = b.payload.length.toLong
      val nFrames = (b.payload.length % 16) + 1
      (0 until 4).map { k =>
        val idx = k * nFrames / 4
        Frame(b.doc_id, k, idx, (idx.toLong * 997L) % math.max(nBytes, 1L),
          math.min(64L, nBytes).toInt)
      }
    }
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q41_multimodal",
      // the oracle replays the deterministic fake decode in SQL; text is
      // ASCII so per-char codepoints == payload bytes
      """WITH f AS (
        |  SELECT doc_id, length(text) AS n,
        |    coalesce(list_sum(list_transform(generate_series(1, length(text)),
        |      i -> ascii(substr(text, i, 1)))), 0) AS byte_sum
        |  FROM documents)
        |SELECT doc_id, 'image' AS media_type,
        |  (n % 640) + 16 AS width,
        |  ((n * 7) % 480) + 16 AS height,
        |  (n % 16) + 1 AS n_frames,
        |  n AS n_bytes,
        |  byte_sum::BIGINT AS byte_sum,
        |  ((byte_sum * 10000) // greatest(n, 1))::BIGINT AS mean_byte_e4
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val blobs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), lit("image").as("media_type"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[MediaBlob]
      extractFeatures(blobs).toDF()
        // mean as a ×10⁴ integer: round(double) is not bit-identical
        // across engines (Spark HALF_UP vs DuckDB's nearest-double), so
        // the derived stat is computed in exact integer arithmetic
        .withColumn("mean_byte_e4", expr("byte_sum * 10000L DIV greatest(n_bytes, 1L)"))
        .orderBy("doc_id")
    },

    QueryDef.sql(
      "q43_frame_sample",
      """WITH f AS (SELECT doc_id, length(text) AS n FROM documents)
        |SELECT doc_id, k,
        |  (k * ((n % 16) + 1)) // 4 AS frame_idx,
        |  (((k * ((n % 16) + 1)) // 4) * 997) % greatest(n, 1) AS frame_off,
        |  least(64, n) AS frame_len
        |FROM f, range(0, 4) t(k)
        |ORDER BY doc_id, k""".stripMargin) { (s, dir) =>
      import s.implicits._
      val blobs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), lit("video").as("media_type"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[MediaBlob]
      sampleFrames(blobs).toDF()
        .select(col("doc_id"), col("k"), col("frame_idx"), col("frame_off"),
          col("frame_len"))
        .orderBy("doc_id", "k")
    })
}
