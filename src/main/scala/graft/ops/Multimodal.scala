package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Multimodal-column plumbing for a training-data pipeline: media
  * (image/audio/video) as opaque BINARY columns with typed metadata,
  * decoded/feature-extracted per partition.
  *
  * The Spark-side plumbing is REAL and tested: schema (binary +
  * metadata struct), deterministic partitioning, typed
  * `Dataset.mapPartitions` with a batch-shaped decode loop (the Scala
  * analog of `mapInPandas` — one iterator per partition, vectorizable
  * batch inside). The decode itself is a STUB: this container ships no
  * image/audio codecs, so `fakeDecode` derives features
  * deterministically from the bytes (clearly marked below). Swapping
  * in a real codec touches ONLY `fakeDecode`.
  *
  * Scale notes: media bytes never shuffle — features are extracted in
  * the scan stage and only the small feature rows move. At 100 TB the
  * binary column lives in its own parquet column chunk; queries that
  * skip `media` never read those pages (columnar pruning).
  */
object Multimodal {

  /** A media row: binary payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])

  /** Extracted features (the stub's deterministic output shape). */
  case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Long,
      width: Long, height: Long, n_frames: Long, head_checksum: Long)

  /** Media table synthesized deterministically from `documents`: the
    * UTF-8 text bytes stand in for an encoded media payload; the type
    * tag cycles by doc_id. (In a real pipeline this IS the stored
    * layout: `binary` + metadata columns alongside.)
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("media"))

  // ================================================================= //
  // STUB DECODE — deterministic fake in place of a real codec.        //
  // A production build replaces this body with e.g. ImageIO/ffmpeg    //
  // calls; signature and the mapPartitions plumbing stay unchanged.   //
  // ================================================================= //
  private[ops] def fakeDecode(r: MediaRow): MediaFeatures = {
    val b = r.media
    val len = b.length.toLong
    // empty payloads decode as all-zero features (convention mirrored
    // in the DuckDB oracle SQL below)
    def byteAt(i: Int): Long =
      if (b.isEmpty) 0L else java.lang.Byte.toUnsignedInt(b(i min (b.length - 1))).toLong
    val first = byteAt(0)
    val second = byteAt(1)
    val head = b.iterator.take(16)
      .map(java.lang.Byte.toUnsignedInt).map(_.toLong).sum
    MediaFeatures(
      doc_id = r.doc_id,
      media_type = r.media_type,
      byte_len = len,
      width = 32 + first % 224,
      height = 32 + second % 224,
      n_frames = if (r.media_type == "video") 1 + len % 30 else 1,
      head_checksum = head)
  }

  /** Decode/feature-extract via typed mapPartitions: one decoder
    * instance per partition (where a real codec would be initialized
    * once), streaming over rows — the Scala analog of a Pandas-UDF
    * `mapInPandas` batch loop.
    */
  def decodeFeatures(s: SparkSession, d: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, d).as[MediaRow].mapPartitions { rows =>
      // per-partition init of the (stubbed) decoder happens here
      rows.map(fakeDecode)
    }
  }

  /** Feature extraction as a driver query, ordered for the oracle.
    * The stub's arithmetic is byte-level and the payload is ASCII, so
    * DuckDB can replay it exactly with ord()/string ops.
    */
  def features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decodeFeatures(s, d).toDF().orderBy("doc_id")
  }

  val featuresSql: String =
    """SELECT doc_id,
      |       ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
      |       CAST(strlen(text) AS BIGINT) AS byte_len,
      |       32 + (CASE WHEN strlen(text) >= 1
      |             THEN ord(substr(text, 1, 1)) ELSE 0 END) % 224 AS width,
      |       32 + (CASE WHEN strlen(text) >= 1
      |             THEN ord(substr(text, LEAST(2, strlen(text)), 1))
      |             ELSE 0 END) % 224 AS height,
      |       CASE WHEN ['image', 'audio', 'video'][(doc_id % 3) + 1] = 'video'
      |            THEN 1 + strlen(text) % 30 ELSE 1 END AS n_frames,
      |       COALESCE(CAST(list_sum(list_transform(string_split(substr(text, 1, 16), ''),
      |                c -> CAST(ord(c) AS BIGINT))) AS BIGINT), 0) AS head_checksum
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Per-type feature stats — grouped agg over extracted features
    * (what a curation job aggregates before filtering).
    */
  def typeStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decodeFeatures(s, d).toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        (sum(col("width").cast("long")) / (lit(1.0) * count(lit(1))))
          .as("avg_width"),
        max(col("n_frames")).as("max_frames"))
      .orderBy("media_type")
  }

  val typeStatsSql: String =
    """WITH f AS (
      |  SELECT ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
      |         CAST(strlen(text) AS BIGINT) AS byte_len,
      |         32 + (CASE WHEN strlen(text) >= 1
      |               THEN ord(substr(text, 1, 1)) ELSE 0 END) % 224 AS width,
      |         CASE WHEN ['image', 'audio', 'video'][(doc_id % 3) + 1] = 'video'
      |              THEN 1 + strlen(text) % 30 ELSE 1 END AS n_frames
      |  FROM documents
      |)
      |SELECT media_type, count(*) AS n,
      |       CAST(sum(byte_len) AS BIGINT) AS total_bytes,
      |       sum(CAST(width AS BIGINT)) / (1.0 * count(*)) AS avg_width,
      |       max(n_frames) AS max_frames
      |FROM f GROUP BY media_type ORDER BY media_type""".stripMargin

  /** One sampled frame (stub: a byte standing in for a decoded frame). */
  case class FrameSample(
      doc_id: Long, frame_idx: Int, byte_off: Int, frame_byte: Long)

  /** Frame sampling over video payloads: up to 4 evenly-spaced frames
    * per video via typed flatMap (0..n rows per input — the shape a
    * real ffmpeg frame sampler has). Only the video rows are decoded;
    * the frame "content" is the payload byte at the sampled offset
    * (same stub convention as fakeDecode — a real build swaps the
    * byte-read for a frame decode, plumbing unchanged).
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).filter(col("media_type") === "video").as[MediaRow]
      .flatMap { r =>
        val len = r.media.length
        if (len == 0) Iterator.empty
        else {
          val nFrames = 1 + len % 30
          val m = math.min(4, nFrames)
          (0 until m).iterator.map { k =>
            val off = k * len / m
            FrameSample(r.doc_id, k, off,
              java.lang.Byte.toUnsignedInt(r.media(off)).toLong)
          }
        }
      }
      .toDF().orderBy("doc_id", "frame_idx")
  }

  val frameSampleSql: String =
    """WITH v AS (
      |  SELECT doc_id, text, strlen(text) AS len,
      |         LEAST(4, 1 + strlen(text) % 30) AS m
      |  FROM documents WHERE doc_id % 3 = 2 AND strlen(text) > 0
      |)
      |SELECT doc_id, CAST(k AS INT) AS frame_idx,
      |       CAST((k * len) // m AS INT) AS byte_off,
      |       CAST(ord(substr(text, CAST((k * len) // m AS INT) + 1, 1))
      |            AS BIGINT) AS frame_byte
      |FROM v, LATERAL (SELECT unnest(generate_series(0, m - 1)) AS k) u
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Resize planning for image rows: aspect-preserving downscale to a
    * 128-px long side, integer arithmetic only (`w*128 div max(w,h)`)
    * so both engines agree exactly. In a real pipeline the computed
    * target dims drive the decoder's scaler (e.g. ffmpeg -vf scale);
    * here they derive from the stubbed decode dims — the plumbing
    * (filter to images → decode → per-row resize policy → summary)
    * is the real part.
    */
  def resizePlan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decodeFeatures(s, d).toDF()
      .filter(col("media_type") === "image")
      .withColumn("long_side", greatest(col("width"), col("height")))
      .withColumn("needs_resize", col("long_side") > 128)
      .withColumn("out_w",
        when(col("needs_resize"),
          expr("width * 128 div long_side")).otherwise(col("width")))
      .withColumn("out_h",
        when(col("needs_resize"),
          expr("height * 128 div long_side")).otherwise(col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        col("needs_resize"), col("out_w"), col("out_h"))
      .orderBy("doc_id")
  }

  val resizePlanSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |         32 + (CASE WHEN strlen(text) >= 1
      |               THEN ord(substr(text, 1, 1)) ELSE 0 END) % 224 AS width,
      |         32 + (CASE WHEN strlen(text) >= 1
      |               THEN ord(substr(text, LEAST(2, strlen(text)), 1))
      |               ELSE 0 END) % 224 AS height
      |  FROM documents WHERE doc_id % 3 = 0
      |), g AS (
      |  SELECT doc_id, width, height,
      |         greatest(width, height) AS long_side,
      |         greatest(width, height) > 128 AS needs_resize
      |  FROM f
      |)
      |SELECT doc_id, width, height, needs_resize,
      |       CASE WHEN needs_resize THEN (width * 128) // long_side
      |            ELSE width END AS out_w,
      |       CASE WHEN needs_resize THEN (height * 128) // long_side
      |            ELSE height END AS out_h
      |FROM g ORDER BY doc_id""".stripMargin

  /** Audio frame-energy extraction: window each audio payload into
    * 64-byte frames and compute per-frame energy (Σ byte²) — the
    * audio analog of frame sampling, where a real build swaps the
    * byte math for PCM decode + RMS. The whole frame sweep is ONE
    * codegen'd expression (graft.functions.FrameEnergyStats) emitting
    * the per-doc rollup directly: no frame rows materialize, no
    * per-doc shuffle, and whole-stage codegen spans the media scan
    * (the former typed mapPartitions severed it). Empty payloads are
    * filtered exactly as the oracle's strlen(text) > 0.
    */
  def audioEnergy(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .filter(col("media_type") === "audio" && length(col("media")) > 0)
      .select(col("doc_id"),
        graft.functions.MediaFunctions
          .frame_energy_stats(col("media"), 64).as("st"))
      .select(col("doc_id"),
        col("st.n_frames").as("n_frames"),
        col("st.sum_energy").as("sum_energy"),
        col("st.max_energy").as("max_energy"))
      .orderBy("doc_id")

  val audioEnergySql: String =
    """WITH audio AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE ['image', 'audio', 'video'][(doc_id % 3) + 1] = 'audio'
      |    AND strlen(text) > 0
      |), fr AS (
      |  SELECT doc_id, i,
      |         list_sum(list_transform(
      |           string_split(substr(text, i * 64 + 1, 64), ''),
      |           c -> CAST(ord(c) AS BIGINT) * ord(c))) AS energy
      |  FROM audio, LATERAL (SELECT unnest(generate_series(0,
      |         CAST(ceil(strlen(text) / 64.0) AS INT) - 1)) AS i) u
      |)
      |SELECT doc_id, count(*) AS n_frames,
      |       CAST(sum(energy) AS BIGINT) AS sum_energy,
      |       CAST(max(energy) AS BIGINT) AS max_energy
      |FROM fr GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_audio_energy"    -> (audioEnergy _),
    "mm_decode_features" -> (features _),
    "mm_type_stats"      -> (typeStats _),
    "mm_frame_sample"    -> (frameSample _),
    "mm_resize"          -> (resizePlan _),
  )

  val oracle: Map[String, String] = Map(
    "mm_audio_energy"    -> audioEnergySql,
    "mm_decode_features" -> featuresSql,
    "mm_type_stats"      -> typeStatsSql,
    "mm_frame_sample"    -> frameSampleSql,
    "mm_resize"          -> resizePlanSql,
  )
}
