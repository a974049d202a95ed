package graft.llm

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north star): treat image /
  * audio / video payloads as opaque `binary` columns with typed metadata,
  * and run decode / feature-extraction as **partition-batched typed
  * transforms** (`Dataset.mapPartitions` — the JVM analogue of a
  * Pandas-UDF-over-mapInPandas pipeline: one iterator per partition, so a
  * real decoder would amortize codec/model initialization per batch, not
  * per row).
  *
  * The decode step itself is a STUB by design — no image/audio codecs exist
  * in this environment — implemented as a deterministic pure function of
  * the payload bytes, so the surrounding Spark plumbing (binary schema,
  * partitioning, batch iteration, typed output schema) is fully real and
  * testable, and even SQL-oracle-checkable.
  *
  * Scale: mapPartitions preserves partitioning (no shuffle); binary
  * payloads stream through the parquet reader in columnar batches; at
  * 100 TB the decode stage is a pure map — bounded-memory per partition,
  * trivially parallel across executors.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, fingerprint: String)

  /** Build a media table from documents: payload = UTF-8 bytes of the text
    * (stand-in for real image/audio/video bytes), modality assigned
    * deterministically.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("media"))

  /** STUBBED decoder: deterministic fake metadata from the payload bytes.
    * A real implementation would replace ONLY the body of this function
    * (e.g. javax.imageio / ffmpeg bindings); the signature and the Spark
    * plumbing around it stay as-is.
    */
  def decodeOne(row: MediaRow): MediaMeta = {
    val nBytes = row.media.length.toLong
    val md = MessageDigest.getInstance("MD5")
    val fp = md.digest(row.media).take(4).map("%02x".format(_)).mkString
    val width = (64 + (nBytes * 7) % 512).toInt
    val height = (64 + (nBytes * 13) % 512).toInt
    val frames = row.media_type match {
      case "image" => 1
      case "audio" => (nBytes % 30 + 1).toInt
      case _       => (nBytes % 120 + 1).toInt
    }
    MediaMeta(row.doc_id, row.media_type, nBytes, width, height, frames, fp)
  }

  /** Partition-batched decode: one iterator per partition (batch shape),
    * codec state would be initialized once per partition here.
    */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      // per-partition init would go here (codec handles, model weights…)
      batch.map(decodeOne)
    }
  }

  /** Feature extraction over the binary payload: an 8-dim embedding derived
    * from the payload digest — deterministic, engine-portable (hex-digit
    * arithmetic, no UDF, fully codegen'd), and exactly what a real
    * extractor's *plumbing* looks like (per-row binary → fixed-dim vector).
    * Feature i = (int of md5-hex chars [8i, 8i+8) / 2³²) − 0.5 ∈ [−0.5, 0.5).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val feats = (0 until 4).map { i =>
      val v = expr(s"CAST(conv(substring(md5(media), ${8 * i + 1}, 8), 16, 10) AS BIGINT)")
      (v.cast("double") / lit(4294967296.0) - lit(0.5)).as(s"f$i")
    }
    media.select(col("doc_id") +: feats: _*)
  }

  /** STUBBED resize: deterministic payload re-shaping to a target (w, h) —
    * output byte length is w·h/64 (truncate or cycle-pad), metadata updated.
    * A real implementation swaps only the byte-mapping expression; the
    * schema/partitioning contract stays.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val targetLen = math.max(1, w * h / 64)
    media
      .withColumn("media",
        substr(rpad(col("media").cast("string"), targetLen, "#"), lit(1), lit(targetLen))
          .cast("binary"))
      .withColumn("width", lit(w)).withColumn("height", lit(h))
  }

  /** 32-bit AVERAGE-HASH of the binary payload — the aHash perceptual
    * fingerprint, 1-D: linearly resample 32 bytes at positions
    * p_j = (j·(n−1)) div 31 (the resample-to-fixed-grid step a real
    * image aHash does on an 8×8 gray thumbnail), then bit j is set iff
    * 32·v_j > Σv — the "above average" test in EXACT integer arithmetic
    * (no division, engine-portable). NULL for empty payloads. Byte
    * extraction is substring-on-binary + hex decode — codegen'd scalar
    * expressions, in-scan at any corpus size.
    *
    * Adds `phash` (long) to a frame with a binary `media` column.
    */
  def withAHash32(media: DataFrame): DataFrame = {
    val v = (j: Int) =>
      s"CAST(conv(hex(substring(media, (($j * (_n - 1)) DIV 31) + 1, 1)), 16, 10) AS BIGINT)"
    val sum = (0 until 32).map(v).mkString(" + ")
    val bits = (0 until 32)
      .map(j => s"(CASE WHEN 32 * ${v(j)} > _s THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    media.withColumn("_n", length(col("media")).cast("long"))
      .withColumn("_s", expr(sum))
      .withColumn("phash",
        when(col("_n") > 0, expr(bits).cast("long")).otherwise(lit(null).cast("long")))
      .drop("_n", "_s")
  }

  /** Frame sampling for video-typed rows: every k-th byte-slice stands in
    * for every k-th frame — array output shape matches a real sampler.
    * Empty payloads yield no frames (guards the integer division below —
    * Spark's `/` truncates toward zero, so (0−1)/k would otherwise emit a
    * single empty frame).
    */
  def sampleFrames(media: DataFrame, every: Int = 10): DataFrame =
    media.withColumn("frames",
      when(col("media_type") === "video" && length(col("media")) > 0,
        transform(sequence(lit(0), ((length(col("media")) - 1) / every).cast("int")),
          i => substr(col("media").cast("string"), lit(1) + i * every, lit(4))))
        .otherwise(array().cast("array<string>")))
}
