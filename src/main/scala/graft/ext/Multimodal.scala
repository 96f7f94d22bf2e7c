package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (U4 north-star): image/audio/video as
  * opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample stages a training
  * pipeline runs over them.
  *
  * The actual codecs are NOT in this container, so the decode kernel is
  * a clearly-marked deterministic stub ([[FakeCodec]]). Everything
  * Spark-side is real and tested: the schema, the binary column
  * handling, the per-partition batching shape (`mapPartitions` over a
  * typed Dataset — the JVM analogue of `mapInPandas`: one iterator per
  * partition, so a real decoder would amortize model/codec init across
  * the partition), and the explode-style frame fan-out.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the layout a 100 TB
    * multimodal store would use (payload in parquet binary, metadata
    * columns for pruning so scans never touch bytes they don't need). */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      feature: Array[Float])

  /** The codec injection seam: a deployment provides the native
    * decode (libjpeg/ffmpeg/…) behind this interface and the pipeline —
    * schema, metadata pruning, per-partition batching, frame fan-out —
    * is untouched. Must be `Serializable`: instances ship inside the
    * `mapPartitions` closure to executors, so implementations should
    * hold config, not native handles — acquire those lazily per
    * partition (the iterator shape exists precisely so init amortizes
    * across a partition). */
  trait Codec extends Serializable {
    def featureDim: Int
    def decode(payload: Array[Byte]): Array[Float]
    def checksum(payload: Array[Byte]): Long
  }

  /** ======== STUB ========
    * Deterministic fake codec standing in for libjpeg/ffmpeg/etc — the
    * default [[Codec]] until real media libraries are available. A
    * real deployment swaps in its own [[Codec]]; the signature (bytes
    * in, fixed-size feature out) and everything around it stays. */
  object FakeCodec extends Codec {
    val FeatureDim = 8
    override def featureDim: Int = FeatureDim
    def decode(payload: Array[Byte]): Array[Float] = {
      // rolling byte statistics as a stand-in for decoded features
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        f(i % FeatureDim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      f
    }
    def checksum(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + (payload(i) & 0xFF); i += 1 }
      h
    }
  }

  /** Build a deterministic media table from `documents` (text bytes as
    * payload): the harness for the plumbing until real media arrives. */
  def syntheticMediaTable(spark: SparkSession, dir: String): DataFrame = {
    graft.store.Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      (col("n_chars") * 40L).as("duration_ms"))
  }

  /** Decode/feature-extract stage: per-partition iterator so codec init
    * happens once per partition, not per row (the mapInPandas batch
    * shape). Metadata-only pruning happens *before* this stage — filter
    * on width/kind/duration first, decode last. The codec is injected
    * ([[Codec]]); [[FakeCodec]] is the container default. */
  def extractFeatures(media: Dataset[MediaRow],
      codec: Codec = FakeCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs initialize here, once per partition
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length,
          codec.checksum(m.payload), codec.decode(m.payload))
      }
    }
  }

  /** Resize-to-fit stage: scale media so the longest side fits `box`,
    * preserving aspect ratio. The METADATA math is real, integer-exact
    * (`w·box div max(w,h)` — no FP, so plans and engines agree bit-for-
    * bit) and runs as plain codegen'd columns, so a `WHERE out_w < …`
    * prunes before any payload is touched.
    * ======== STUB ======== the payload "resample" is a byte-slice
    * proportional to the area ratio — a real deployment swaps it for the
    * codec call, signature and metadata math unchanged. */
  def resizeToFit(media: DataFrame, box: Int): DataFrame = {
    def scaled(side: String) =
      when(greatest(col("width"), col("height")) <= box, col(side).cast("long"))
        .otherwise(greatest(lit(1L), expr(s"CAST($side AS BIGINT) * $box DIV greatest(width, height)")))
    media
      .withColumn("out_w", scaled("width"))
      .withColumn("out_h", scaled("height"))
      .withColumn("out_bytes", expr(
        """least(CAST(octet_length(payload) AS BIGINT),
          |  greatest(1L, CAST(octet_length(payload) AS BIGINT) * out_w * out_h
          |    DIV greatest(CAST(width AS BIGINT) * height, 1L)))""".stripMargin))
      .withColumn("payload", expr("substring(payload, 1, out_bytes)"))
  }

  /** Frame sampling for video rows: fan one row out to ceil(duration/interval)
    * frame stubs (the explode shape; a real pipeline decodes each frame
    * lazily downstream). */
  def sampleFrames(media: DataFrame, intervalMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("duration_ms") > 0) // 0-length → zero frames, not a crash
      .select(col("media_id"), col("duration_ms"),
        posexplode(sequence(lit(0L), col("duration_ms") - 1, lit(intervalMs)))
          .as(Seq("frame_idx", "frame_offset_ms")))
}
