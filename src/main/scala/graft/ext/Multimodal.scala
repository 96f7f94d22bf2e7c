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

  /** REAL image codec backed by the JDK's `javax.imageio` — no native
    * library needed in-container: PNG and JPEG (and BMP/GIF) decode to
    * pixels, features and checksums are computed from the DECODED ARGB
    * raster (so a corrupted payload fails loudly instead of hashing
    * garbage bytes), and resize is an integer-exact nearest-neighbor
    * resample re-encoded as PNG. This closes the gap [[FakeCodec]]
    * stubbed: a production multimodal column over PNG/JPEG payloads
    * runs end-to-end on the JDK alone; swap in libjpeg-turbo/ffmpeg
    * behind the same [[Codec]] seam when throughput demands it.
    *
    * Determinism: PNG decode is lossless (pixels are the payload's),
    * the feature math is fixed-order float arithmetic, and the
    * nearest-neighbor index map `src = floor(dst · in / out)` is pure
    * integer math — ExtSpec pins decoded pixels and features to golden
    * values computed from first principles. */
  object ImageIoCodec extends Codec {
    val FeatureDim = 8
    override def featureDim: Int = FeatureDim

    private def read(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      img
    }

    /** [w, h, aspect, meanR, meanG, meanB, meanLuma, edgeEnergy] over
      * the decoded pixels (means in [0,1]; luma = BT.601; edgeEnergy =
      * mean |luma − right-neighbor luma|, a cheap sharpness proxy). */
    override def decode(payload: Array[Byte]): Array[Float] = {
      val img = read(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb, sl, se) = (0.0, 0.0, 0.0, 0.0, 0.0)
      var y = 0
      while (y < h) {
        var x = 0
        var prevL = 0.0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = ((p >> 16) & 0xFF) / 255.0
          val g = ((p >> 8) & 0xFF) / 255.0
          val b = (p & 0xFF) / 255.0
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += l
          if (x > 0) se += math.abs(l - prevL)
          prevL = l
          x += 1
        }
        y += 1
      }
      val n = (w * h).toDouble
      val ne = (math.max(w - 1, 1) * h).toDouble
      Array(w.toFloat, h.toFloat, (w.toDouble / h).toFloat,
        (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
        (sl / n).toFloat, (se / ne).toFloat)
    }

    /** Rolling hash over the decoded ARGB ints in raster order — a
      * content checksum of the IMAGE, not its container bytes (two
      * encodings of the same pixels collide, as they should). */
    override def checksum(payload: Array[Byte]): Long = {
      val img = read(payload)
      var h = 1125899906842597L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { h = 31 * h + img.getRGB(x, y); x += 1 }
        y += 1
      }
      h
    }

    /** Nearest-neighbor resize so the longest side fits `box` (aspect
      * preserved, same metadata math as [[resizeToFit]]), re-encoded as
      * PNG. `src = dst · in div out` — integer-exact, engine-portable. */
    def resizePayload(payload: Array[Byte], box: Int): Array[Byte] = {
      val img = read(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val longest = math.max(w, h)
      if (longest <= box) return encodePng(img)
      val ow = math.max(1, w * box / longest)
      val oh = math.max(1, h * box / longest)
      val out = new java.awt.image.BufferedImage(ow, oh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < oh) {
        var x = 0
        while (x < ow) {
          out.setRGB(x, y, img.getRGB(x * w / ow, y * h / oh))
          x += 1
        }
        y += 1
      }
      encodePng(out)
    }

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic test-pattern PNG: pixel (x, y) of image `seed` is
      * an RGB gradient keyed by (seed, x, y) — the fixture generator
      * for gates/specs exercising the REAL decode path. */
    def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((seed + x * 7 + y * 13) % 256).toInt
          val g = ((seed * 3 + x * 11 + y * 5) % 256).toInt
          val b = ((seed * 5 + x * 3 + y * 17) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }
  }

  /** REAL audio codec backed by the JDK's `javax.sound.sampled` — WAV
    * (and AIFF/AU) decode to PCM samples with no native library, the
    * audio twin of [[ImageIoCodec]]. Features and checksums come from
    * the DECODED sample stream, so a truncated or mis-headed payload
    * fails loudly. Video remains the one genuinely-unservable-by-JDK
    * modality: its [[Codec]] slot still takes a deployment's ffmpeg
    * binding behind the same seam.
    *
    * Determinism: WAV PCM is lossless; feature math is a fixed-order
    * fold over samples (ExtSpec pins features of a generated tone to
    * closed-form values). */
  object WavCodec extends Codec {
    val FeatureDim = 8
    override def featureDim: Int = FeatureDim

    /** 16-bit PCM samples of the (first channel of the) payload. */
    private def samples(payload: Array[Byte]): (Array[Short], Float) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16, s"expect 16-bit PCM, got $fmt")
        val bytes = in.readAllBytes()
        val ch = fmt.getChannels
        val frame = 2 * ch
        val n = bytes.length / frame
        val out = new Array[Short](n)
        val be = fmt.isBigEndian
        var i = 0
        while (i < n) {
          val o = i * frame
          out(i) = (if (be) ((bytes(o) << 8) | (bytes(o + 1) & 0xFF))
                    else ((bytes(o + 1) << 8) | (bytes(o) & 0xFF))).toShort
          i += 1
        }
        (out, fmt.getSampleRate)
      } finally in.close()
    }

    /** [n_samples, sample_rate, duration_s, rms, peak, zero_cross_rate,
      * mean, dc_offset_abs] over the decoded first-channel samples. */
    override def decode(payload: Array[Byte]): Array[Float] = {
      val (s, rate) = samples(payload)
      val n = s.length
      var (sum, sumSq, peak, zc) = (0.0, 0.0, 0.0, 0L)
      var i = 0
      while (i < n) {
        val v = s(i) / 32768.0
        sum += v; sumSq += v * v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && ((s(i) >= 0) != (s(i - 1) >= 0))) zc += 1
        i += 1
      }
      val nn = math.max(n, 1).toDouble
      Array(n.toFloat, rate, (n / rate.toDouble).toFloat,
        math.sqrt(sumSq / nn).toFloat, peak.toFloat,
        (zc / math.max(n - 1, 1).toDouble).toFloat,
        (sum / nn).toFloat, math.abs(sum / nn).toFloat)
    }

    /** Rolling hash over decoded samples — a content checksum of the
      * AUDIO, not its container bytes. */
    override def checksum(payload: Array[Byte]): Long = {
      val (s, _) = samples(payload)
      var h = 1125899906842597L
      var i = 0
      while (i < s.length) { h = 31 * h + s(i); i += 1 }
      h
    }

    /** Deterministic test-tone WAV: `n` samples of a square-ish wave
      * keyed by `seed` (integer sample math — no trig, portable). */
    def syntheticWav(seed: Long, n: Int, sampleRate: Float = 8000f): Array[Byte] = {
      val period = (8 + seed % 25).toInt
      val amp = (8192 + (seed % 5) * 4096).toInt
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = (if ((i / period) % 2 == 0) amp else -amp).toShort
        pcm(i * 2) = (v & 0xFF).toByte
        pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** A media table of REAL WAV payloads (a deterministic tone per
    * document id) — the fixture for the real audio-decode path. */
  def syntheticAudioTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.store.Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 400 + 100).cast("int").as("n"))
      .as[(Long, Int)]
      .map { case (id, n) =>
        MediaRow(id, "audio", WavCodec.syntheticWav(id, n), 0, 0,
          (n * 1000L) / 8000L)
      }
  }

  /** A media table of REAL PNG payloads (one per document id, sized by
    * the id), generated with [[ImageIoCodec.syntheticPng]] — the
    * fixture for the real-decode path. Payload generation runs
    * distributed (an executor-side map, like any decode). */
  def syntheticImageTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.store.Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 16 + 4).cast("int").as("w"),
        (col("doc_id") % 12 + 4).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) =>
        MediaRow(id, "image", ImageIoCodec.syntheticPng(id, w, h), w, h, 0L)
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
