package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (U4 north-star): image/audio/video as
  * opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample stages a training
  * pipeline runs over them.
  *
  * Three REAL decode paths live in this file, built on JDK standard
  * libraries alone (no native dependency): [[ImageIoCodec]] (PNG/JPEG
  * via `javax.imageio`), [[WavCodec]] (WAV/AIFF/AU PCM via
  * `javax.sound.sampled` + a direct RIFF chunk-walk fast path), and
  * [[AviCodec]] (AVI containers with DIB or MJPEG frames,
  * first-principles RIFF parsing with a frame-index `layout` for
  * selective seek-decode). Each is oracle-anchored (x12/x12c/x12d/
  * x12g) with golden-pixel/sample specs. [[FakeCodec]] remains ONLY as
  * the deterministic fixture default of [[mediaFeatures]] — a seeded
  * stand-in for codecs that genuinely need a native binding
  * (H.264/VP9: see the deployment recipe at [[Codec]]). The Spark-side
  * plumbing is codec-agnostic either way: the schema, the binary
  * column handling, the per-partition batching shape (`mapPartitions`
  * over a typed Dataset — the JVM analogue of `mapInPandas`: one
  * iterator per partition, so decoder init amortizes across the
  * partition), and the explode-style frame fan-out.
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
    // H.264/VP9/AAC deployment recipe (this container has no ffmpeg, so
    // the in-repo proof of the seam is the JDK-pure AviCodec + its
    // hash-exact x12g oracle; compressed-codec support is an
    // environment step, not a design change):
    //  1. Ship `ffmpeg` to every executor (cluster image or
    //     `--archives ffmpeg.tgz#ffmpeg`) — a static build needs no
    //     shared libraries.
    //  2. Implement `Codec` with a lazy per-JVM binary path; in
    //     `decode`, shell out `ffmpeg -i pipe:0 -f rawvideo -pix_fmt
    //     rgb24 pipe:1` (payload → stdin, planar RGB → stdout; two
    //     pumping threads, bounded buffers) and fold the returned pixel
    //     stream with the SAME feature math the JDK codecs use.
    //  3. `checksum` = xxhash64 over the DECODED byte stream (not the
    //     container bytes), matching the in-repo codecs' contract that
    //     a truncated payload fails loudly rather than hashing quietly.
    //  4. Determinism caveat to pin in a spec: a fixed ffmpeg build is
    //     bit-deterministic for a given payload; UPGRADING ffmpeg may
    //     change lossy-decode output, so store the codec build id next
    //     to any persisted features (the model-versioning discipline
    //     the quality classifier already follows).
    def featureDim: Int
    def decode(payload: Array[Byte]): Array[Float]
    def checksum(payload: Array[Byte]): Long
    /** Both outputs from ONE container decode where the codec can share
      * it — the feature-extract stage needs both, and the default
      * (separate calls) decodes every payload twice. */
    def decodeWithChecksum(payload: Array[Byte]): (Array[Float], Long) =
      (decode(payload), checksum(payload))
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
      // explicit in-memory stream: ImageIO's DEFAULT path wraps the
      // InputStream in a DISK-backed cache — a temp file created and
      // deleted per decode, which dominated wall time on these small
      // in-memory payloads (measured: the x12 image family spent more
      // in cache-file churn than in decode+hash). Scoped per call
      // rather than ImageIO.setUseCache(false): that flag is JVM-global
      // and would silently retune every other ImageIO user in the
      // process. Byte-identical output; ImageIO.read closes the stream.
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload)))
      require(img != null, "payload is not a decodable image")
      img
    }

    /** One bulk ARGB grab per image: per-pixel `getRGB(x, y)` pays the
      * color-model conversion dispatch per CALL (PNG/JPEG decode to
      * 3BYTE_BGR rasters, not INT_RGB), which dominated the distributed
      * decode gate; the bulk form converts the raster in one pass and
      * the feature loops walk a primitive int array. Values are
      * identical (same default-ARGB conversion) — the golden-pixel
      * specs pin that. */
    private[ext] def argb(img: java.awt.image.BufferedImage): Array[Int] =
      img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

    /** [w, h, aspect, meanR, meanG, meanB, meanLuma, edgeEnergy] over
      * the decoded pixels (means in [0,1]; luma = BT.601; edgeEnergy =
      * mean |luma − right-neighbor luma|, a cheap sharpness proxy). */
    override def decode(payload: Array[Byte]): Array[Float] = {
      val img = read(payload)
      featuresOf(img.getWidth, img.getHeight, argb(img))
    }

    /** 64-bit DIFFERENCE HASH (dHash — the standard perceptual image
      * fingerprint: Krawetz's "kind of like that" family; LAION-scale
      * image dedup uses exactly this class of hash): decoded pixels →
      * integer BT.601 grayscale → AREA-AVERAGED down to a 9×8 grid
      * (floor cell mapping `x·9 div w`, integer sums and division — no
      * platform scaler, no FP, so the hash is bit-stable across JVMs) →
      * bit (r,c) = cell(r,c+1) > cell(r,c). Invariances by
      * construction: uniform brightness shifts preserve every
      * comparison (hash identical), aspect-preserving resizes
      * approximate the same cell means (small Hamming distance).
      * None for undecodable bytes or degenerate (<2px wide) images —
      * callers DROP those rather than clustering them at distance 0. */
    def dHash(payload: Array[Byte]): Option[Long] =
      try {
        val img = read(payload)
        dHashPixels(img.getWidth, img.getHeight, argb(img))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** [[dHash]]'s pixel-level core — shared with the video frame
      * fingerprints ([[Multimodal.videoFrameDHash]]), which hash
      * already-decoded frames. */
    private[ext] def dHashPixels(w: Int, h: Int, px: Array[Int]): Option[Long] =
      try {
        if (w < 2 || h < 1) None
        else {
          val sums = new Array[Long](9 * 8)
          val counts = new Array[Long](9 * 8)
          var y = 0
          while (y < h) {
            val cy = math.min(y * 8 / h, 7)
            var x = 0
            while (x < w) {
              val cx = math.min(x * 9 / w, 8)
              val p = px(y * w + x)
              val gray = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
                114 * (p & 0xff)) / 1000
              sums(cy * 9 + cx) += gray
              counts(cy * 9 + cx) += 1
              x += 1
            }
            y += 1
          }
          def mean(r: Int, c: Int): Long = {
            val i = r * 9 + c
            if (counts(i) == 0) 0L else sums(i) / counts(i)
          }
          var bits = 0L
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              if (mean(r, c + 1) > mean(r, c)) bits |= 1L << (r * 8 + c)
              c += 1
            }
            r += 1
          }
          Some(bits)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Fixed-point cosine table for the 32-point DCT-II, built once
      * with StrictMath (bit-exact across platforms by spec — Math.cos
      * may differ per JVM/libm, which would make the hash
      * platform-dependent): T(u)(x) = round(cos((2x+1)·u·π/64) · 2¹⁴).
      * All downstream arithmetic is Long — no FP in the hash. */
    private lazy val dctCos: Array[Array[Long]] = Array.tabulate(32, 32) {
      (u, x) => Math.round(
        StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 64.0) * (1L << 14))
    }

    /** 64-bit DCT PERCEPTUAL HASH (pHash — the robustness upgrade over
      * [[dHash]]: dHash compares ADJACENT cell means, so recompression/
      * rescale noise flips exactly the near-tie gradient bits; pHash
      * thresholds the 8×8 LOW-FREQUENCY DCT block against its median,
      * and low-frequency structure is what JPEG quantization preserves
      * by design). Pipeline, all integer: decoded pixels → BT.601 gray
      * → area-averaged 32×32 grid (floor cell map — no platform
      * scaler) → unnormalized 2D DCT-II via the fixed-point cosine
      * table (the scipy/imagehash shape — a global positive scale
      * cancels under thresholding, so the α(u) normalization is
      * unnecessary) → bit(v,u) = 2·coeff > (sorted₃₁ + sorted₃₂)
      * (integer median-of-64 without halving). Bounds: |coeff| ≤
      * 255·32²·2²⁸ < 2⁴⁷ — doubling stays in Long. None for
      * undecodable/empty inputs (callers DROP, the dHash discipline). */
    def pHash(payload: Array[Byte]): Option[Long] =
      try {
        val img = read(payload)
        pHashPixels(img.getWidth, img.getHeight, argb(img))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** [[pHash]]'s pixel-level core — shared with video-frame hashing
      * call sites the way [[dHashPixels]] is. */
    private[ext] def pHashPixels(w: Int, h: Int, px: Array[Int]): Option[Long] =
      try {
        if (w < 1 || h < 1) None
        else {
          val n = 32
          val sums = new Array[Long](n * n)
          val counts = new Array[Long](n * n)
          var y = 0
          while (y < h) {
            val cy = math.min(y * n / h, n - 1)
            var x = 0
            while (x < w) {
              val cx = math.min(x * n / w, n - 1)
              val p = px(y * w + x)
              val gray = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
                114 * (p & 0xff)) / 1000
              sums(cy * n + cx) += gray
              counts(cy * n + cx) += 1
              x += 1
            }
            y += 1
          }
          val grid = new Array[Long](n * n)
          var i = 0
          while (i < n * n) {
            grid(i) = if (counts(i) == 0) 0L else sums(i) / counts(i)
            i += 1
          }
          // separable DCT, only the 8 low frequencies each axis:
          // rows pass tmp(y)(u) = Σ_x grid(y,x)·T(u)(x), then
          // coeff(v)(u) = Σ_y tmp(y)(u)·T(v)(y)
          val tmp = new Array[Long](n * 8)
          var yy = 0
          while (yy < n) {
            var u = 0
            while (u < 8) {
              var s = 0L
              var x = 0
              while (x < n) { s += grid(yy * n + x) * dctCos(u)(x); x += 1 }
              tmp(yy * 8 + u) = s >> 14 // renormalize the fixed point
              u += 1
            }
            yy += 1
          }
          val coeffs = new Array[Long](64)
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              var s = 0L
              var y2 = 0
              while (y2 < n) { s += tmp(y2 * 8 + u) * dctCos(v)(y2); y2 += 1 }
              coeffs(v * 8 + u) = s >> 14
              u += 1
            }
            v += 1
          }
          val sorted = coeffs.clone()
          java.util.Arrays.sort(sorted)
          val med2 = sorted(31) + sorted(32)
          var bits = 0L
          var k = 0
          while (k < 64) {
            if (2 * coeffs(k) > med2) bits |= 1L << k
            k += 1
          }
          Some(bits)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    private def featuresOf(w: Int, h: Int, px: Array[Int]): Array[Float] = {
      var (sr, sg, sb, sl, se) = (0.0, 0.0, 0.0, 0.0, 0.0)
      var y = 0
      while (y < h) {
        var x = 0
        var prevL = 0.0
        val row = y * w
        while (x < w) {
          val p = px(row + x)
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
    override def checksum(payload: Array[Byte]): Long =
      checksumOf(argb(read(payload)))

    private def checksumOf(px: Array[Int]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < px.length) { h = 31 * h + px(i); i += 1 }
      h
    }

    override def decodeWithChecksum(payload: Array[Byte]): (Array[Float], Long) = {
      val img = read(payload)
      val px = argb(img)
      (featuresOf(img.getWidth, img.getHeight, px), checksumOf(px))
    }

    /** Nearest-neighbor resize so the longest side fits `box` (aspect
      * preserved, same metadata math as [[resizeToFit]]), re-encoded as
      * PNG. `src = dst · in div out` — integer-exact, engine-portable. */
    def resizePayload(payload: Array[Byte], box: Int): Array[Byte] =
      resizeWithDims(payload, box)._1

    /** [[resizePayload]] plus the output dimensions (so a pipeline
      * stage updates its metadata columns without re-decoding). */
    def resizeWithDims(payload: Array[Byte], box: Int): (Array[Byte], Int, Int) = {
      val img = read(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val longest = math.max(w, h)
      if (longest <= box) return (encodePng(img), w, h)
      val ow = math.max(1, w * box / longest)
      val oh = math.max(1, h * box / longest)
      val out = new java.awt.image.BufferedImage(ow, oh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val src = argb(img)
      val dst = new Array[Int](ow * oh)
      var y = 0
      while (y < oh) {
        val srow = (y * h / oh) * w
        var x = 0
        while (x < ow) {
          dst(y * ow + x) = src(srow + x * w / ow)
          x += 1
        }
        y += 1
      }
      out.setRGB(0, 0, ow, oh, dst, 0, ow)
      (encodePng(out), ow, oh)
    }

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      // explicit in-memory output stream (see read()'s note — the
      // OutputStream overload would route through the disk cache);
      // close() flushes the cache into bos before toByteArray
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
      bos.toByteArray
    }

    /** Deterministic test-pattern PNG: pixel (x, y) of image `seed` is
      * an RGB gradient keyed by (seed, x, y) — the fixture generator
      * for gates/specs exercising the REAL decode path. */
    private def syntheticPixels(seed: Long, w: Int, h: Int): Array[Int] = {
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((seed + x * 7 + y * 13) % 256).toInt
          val g = ((seed * 3 + x * 11 + y * 5) % 256).toInt
          val b = ((seed * 5 + x * 3 + y * 17) % 256).toInt
          px(y * w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      px
    }

    def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, syntheticPixels(seed, w, h), 0, w)
      encodePng(img)
    }

    /** The content checksum a decoded [[syntheticPng]] yields, computed
      * straight from the closed-form pixels — the EXPECTATION side of a
      * round-trip verify without generating, encoding, and re-decoding
      * a throwaway PNG (the x80 gate's per-row cost, measured ~2× the
      * whole verify). `getRGB` reports TYPE_INT_RGB pixels with an
      * opaque alpha byte, so the formula pixels OR in 0xFF000000. */
    def syntheticChecksum(seed: Long, w: Int, h: Int): Long = {
      val px = syntheticPixels(seed, w, h)
      var i = 0
      while (i < px.length) { px(i) |= 0xFF000000; i += 1 }
      checksumOf(px)
    }
  }

  /** REAL audio codec backed by the JDK's `javax.sound.sampled` — WAV
    * (and AIFF/AU) decode to PCM samples with no native library, the
    * audio twin of [[ImageIoCodec]]. Features and checksums come from
    * the DECODED sample stream, so a truncated or mis-headed payload
    * fails loudly. (Video's JDK path is [[AviCodec]]; H.264-class
    * codecs still take a deployment's ffmpeg binding behind the seam.)
    *
    * Determinism: WAV PCM is lossless; feature math is a fixed-order
    * fold over samples (ExtSpec pins features of a generated tone to
    * closed-form values). */
  object WavCodec extends Codec {
    val FeatureDim = 8
    override def featureDim: Int = FeatureDim

    /** 16-bit PCM samples of the (first channel of the) payload.
      * Canonical RIFF-WAVE PCM16 payloads take a direct chunk-walk fast
      * path (AudioSystem's per-call provider probing dominated the
      * distributed decode gate: 0.82 → ~0.2 s at sf0.1); anything else
      * (AIFF/AU, extensible/float WAVE) falls back to AudioSystem.
      * WavCodecSpec pins both paths sample-identical. */
    private def samples(payload: Array[Byte]): (Array[Short], Float) = {
      if (payload.length > 44 && payload(0) == 'R' && payload(1) == 'I' &&
          payload(2) == 'F' && payload(3) == 'F' && payload(8) == 'W' &&
          payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E')
        riffPcm16(payload).getOrElse(audioSystemSamples(payload))
      else audioSystemSamples(payload)
    }

    /** 64-bit ENERGY-CONTOUR hash — the audio member of the perceptual
      * dedup family ([[ImageIoCodec.dHash]]'s time-domain analogue,
      * the Haitsma-Kalker sign-of-delta idea on frame energies):
      * decoded PCM16 split into 65 equal frames (floor boundaries
      * `i·n div 65`), each frame's EXACT Long sum of squares, bit r =
      * energy(r+1) > energy(r). Pure integer arithmetic — bit-stable
      * across JVMs. GAIN-invariant by construction when scaling is
      * exact (×k multiplies every sum by k²; comparisons unchanged —
      * the spec pins a doubled copy hash-identical); loudness-
      * normalized twins land at distance ≤ a few bits. None for
      * undecodable payloads or clips shorter than 65 samples. */
    def energyHash(payload: Array[Byte]): Option[Long] =
      try {
        val (s, _) = samples(payload)
        if (s.length < 65) None
        else {
          val e = new Array[Long](65)
          var i = 0
          while (i < s.length) {
            val f = math.min((i.toLong * 65 / s.length).toInt, 64)
            val v = s(i).toLong
            e(f) += v * v
            i += 1
          }
          var bits = 0L
          var r = 0
          while (r < 64) {
            if (e(r + 1) > e(r)) bits |= 1L << r
            r += 1
          }
          Some(bits)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Direct RIFF-WAVE walk: returns None unless the payload is plain
      * PCM (fmt tag 1) 16-bit — exactly the subset where the byte layout
      * is unambiguous and equals what AudioSystem would decode. */
    private def riffPcm16(payload: Array[Byte]): Option[(Array[Short], Float)] = {
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.position(12)
      var (tag, ch, rate, bits) = (0, 0, 0f, 0)
      var dataOff = -1
      var dataLen = 0
      while (bb.remaining() >= 8 && dataOff < 0) {
        val id = {
          val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
        }
        val sz = bb.getInt
        // a NEGATIVE declared size would step the cursor backwards and
        // re-read the same chunk forever (executor hang), and a data
        // chunk longer than the remaining payload is a truncated file —
        // the fail-loudly contract says neither may decode quietly
        if (sz < 0) return None // malformed → fallback
        val next = bb.position() + sz + (sz & 1)
        if (id == "fmt " && sz >= 16) {
          tag = bb.getShort & 0xFFFF
          ch = bb.getShort & 0xFFFF
          rate = bb.getInt.toFloat
          bb.getInt; bb.getShort // byte rate, block align
          bits = bb.getShort & 0xFFFF
        } else if (id == "data") {
          dataOff = bb.position()
          if (sz > payload.length - dataOff) return None // truncated data
          dataLen = sz
        }
        if (dataOff < 0) {
          if (next > payload.length) return None // malformed → fallback
          bb.position(next)
        }
      }
      if (tag != 1 || bits != 16 || ch < 1 || dataOff < 0) return None
      val frame = 2 * ch
      val n = dataLen / frame
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        val o = dataOff + i * frame
        out(i) = ((payload(o + 1) << 8) | (payload(o) & 0xFF)).toShort
        i += 1
      }
      Some((out, rate))
    }

    private def audioSystemSamples(payload: Array[Byte]): (Array[Short], Float) = {
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
      featuresOf(s, rate)
    }

    private def featuresOf(s: Array[Short], rate: Float): Array[Float] = {
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
    override def checksum(payload: Array[Byte]): Long =
      checksumOf(samples(payload)._1)

    private def checksumOf(s: Array[Short]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < s.length) { h = 31 * h + s(i); i += 1 }
      h
    }

    override def decodeWithChecksum(payload: Array[Byte]): (Array[Float], Long) = {
      val (s, rate) = samples(payload)
      (featuresOf(s, rate), checksumOf(s))
    }

    /** Deterministic test-tone WAV: `n` samples of a square-ish wave
      * keyed by `seed` (integer sample math — no trig, portable). The
      * canonical 44-byte RIFF header is written directly (an
      * `AudioSystem.write` per generated row dominated the distributed
      * gate); ExtSpec decodes the result through AudioSystem to pin the
      * layout as a real WAV. */
    def syntheticWav(seed: Long, n: Int, sampleRate: Float = 8000f): Array[Byte] = {
      val period = (8 + seed % 25).toInt
      val amp = (8192 + (seed % 5) * 4096).toInt
      val out = new Array[Byte](44 + n * 2)
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val rate = sampleRate.toInt
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(n * 2)
      var i = 0
      while (i < n) {
        bb.putShort((if ((i / period) % 2 == 0) amp else -amp).toShort)
        i += 1
      }
      out
    }
  }

  /** REAL video codec over the AVI container, backed entirely by the
    * JDK — the RIFF/AVI layout is plain byte parsing and the two
    * standard frame encodings both decode JDK-natively: uncompressed
    * DIB frames (`00db`, bottom-up BGR — pure integer unpacking) and
    * MJPEG frames (`00dc` — each frame is a JFIF payload `javax.imageio`
    * reads directly). This retires the last "video needs ffmpeg" gap:
    * a production deployment still swaps in ffmpeg behind the same
    * [[Codec]] seam for H.264-class codecs, but the container walk,
    * per-frame fan-out, and feature math below are the real pipeline.
    *
    * Determinism: DIB frames are lossless, so decoded pixels equal the
    * generator's closed-form pattern exactly — the x12g gate emits
    * per-frame INTEGER channel sums that DuckDB re-derives from first
    * principles (hash-exact oracle over a real container decode).
    * MJPEG decode is pinned by self-consistency in ExtSpec (extracted
    * frame bytes decode identically to the JPEG they wrap). */
  object AviCodec extends Codec {
    val FeatureDim = 8
    override def featureDim: Int = FeatureDim

    // ---- RIFF writing ----------------------------------------------------
    private def le32(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fcc(id) ++ le32(body.length.toLong) ++ body ++ pad
    }
    private def list(typ: String, bodies: Array[Byte]*): Array[Byte] =
      chunk("LIST", fcc(typ) ++ bodies.flatten)

    /** The closed-form test pattern shared by the generator, the specs,
      * and the DuckDB oracle: frame `f`, pixel (x, y) of video `seed`. */
    def patR(seed: Long, f: Int, x: Int, y: Int): Int = ((seed + f * 19 + x * 7 + y * 13) % 256).toInt
    def patG(seed: Long, f: Int, x: Int, y: Int): Int = ((seed * 3 + f * 23 + x * 11 + y * 5) % 256).toInt
    def patB(seed: Long, f: Int, x: Int, y: Int): Int = ((seed * 5 + f * 29 + x * 3 + y * 17) % 256).toInt

    private def patternFrame(seed: Long, f: Int, w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = (patR(seed, f, x, y) << 16) | (patG(seed, f, x, y) << 8) | patB(seed, f, x, y)
          x += 1
        }
        y += 1
      }
      img.setRGB(0, 0, w, h, px, 0, w)
      img
    }

    /** Bottom-up padded-stride BGR DIB bytes of an image — the `00db`
      * frame payload (BI_RGB, 24-bit). */
    private def dibBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val stride = (w * 3 + 3) / 4 * 4
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * stride // bottom-up
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          out(row + x * 3) = (p & 0xFF).toByte // B
          out(row + x * 3 + 1) = ((p >> 8) & 0xFF).toByte // G
          out(row + x * 3 + 2) = ((p >> 16) & 0xFF).toByte // R
          x += 1
        }
        y += 1
      }
      out
    }

    private def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      // explicit in-memory output stream (see [[ImageIoCodec]] — the
      // OutputStream overload would route through ImageIO's disk cache)
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try javax.imageio.ImageIO.write(img, "jpg", ios) finally ios.close()
      bos.toByteArray
    }

    /** Deterministic test-pattern AVI: `frames` frames of the closed-form
      * pattern, written as uncompressed DIB (`mjpeg = false`, lossless —
      * oracle-able) or MJPEG (`mjpeg = true`, real JFIF frames). */
    def syntheticAvi(seed: Long, frames: Int, w: Int, h: Int, fps: Int,
        mjpeg: Boolean = false, withIndex: Boolean = true): Array[Byte] = {
      val frameBodies = (0 until frames).map { f =>
        val img = patternFrame(seed, f, w, h)
        if (mjpeg) encodeJpeg(img) else dibBytes(img)
      }
      val frameChunks = frameBodies.map(b =>
        chunk(if (mjpeg) "00dc" else "00db", b))
      val usPerFrame = 1000000L / fps
      val avih = chunk("avih",
        le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0x10) ++ // AVIF_HASINDEX
        le32(frames.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w.toLong) ++ le32(h.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      val strh = chunk("strh",
        fcc("vids") ++ (if (mjpeg) fcc("MJPG") else le32(0)) ++
        le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
        le32(1) ++ le32(fps.toLong) ++ // scale, rate: fps = rate/scale
        le32(0) ++ le32(frames.toLong) ++ le32(0) ++ le32(0xFFFFFFFFL) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
      val strf = chunk("strf",
        le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++ le16(24) ++
        (if (mjpeg) fcc("MJPG") else le32(0)) ++
        le32(((w * 3 + 3) / 4 * 4 * h).toLong) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      val hdrl = list("hdrl", avih, list("strl", strh, strf))
      val movi = list("movi", frameChunks: _*)
      // idx1: one entry per frame (id, AVIIF_KEYFRAME, offset-from-movi-type, size)
      var off = 4L
      val idxBody = frameChunks.zip(frameBodies).map { case (c, b) =>
        val e = fcc(new String(c.take(4), "US-ASCII")) ++ le32(0x10) ++ le32(off) ++
          le32(b.length.toLong)
        off += c.length
        e
      }
      val idx1 =
        if (withIndex) chunk("idx1", idxBody.toArray.flatten)
        else Array.empty[Byte] // unindexed clip: seeks fall back to the chunk walk
      val body = fcc("AVI ") ++ hdrl ++ movi ++ idx1
      fcc("RIFF") ++ le32(body.length.toLong) ++ body
    }

    // ---- RIFF parsing ----------------------------------------------------
    final case class Avi(width: Int, height: Int, usPerFrame: Long,
        frames: Array[java.awt.image.BufferedImage])

    /** Walk the RIFF tree: `avih` gives dims/timing, the `movi` LIST's
      * `##db`/`##dc` chunks are the frames (LIST `rec ` groupings are
      * descended — interleaved files use them). */
    def parse(payload: Array[Byte]): Avi = {
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def four(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      require(four() == "RIFF", "not a RIFF container")
      bb.getInt // riff size
      require(four() == "AVI ", "not an AVI")
      var (w, h, us) = (0, 0, 0L)
      var bitCount = 24
      val frames = scala.collection.mutable.ArrayBuffer[java.awt.image.BufferedImage]()
      def walk(end: Int): Unit = {
        while (bb.position() + 8 <= end) {
          val id = four()
          val sz = bb.getInt
          // a negative declared size would move the cursor BACKWARDS and
          // re-read the same chunk forever — one corrupt row must fail
          // the task loudly, not hang it
          require(sz >= 0, s"malformed AVI: chunk '$id' declares size $sz")
          val next = bb.position() + sz + (sz & 1)
          id match {
            case "LIST" =>
              val typ = four()
              if (typ == "hdrl" || typ == "strl" || typ == "movi" || typ == "rec ")
                walk(bb.position() + sz - 4)
            case "avih" =>
              us = bb.getInt.toLong & 0xFFFFFFFFL
              bb.position(bb.position() + 28) // skip to dwWidth
              w = bb.getInt; h = bb.getInt
            case "strf" =>
              bb.position(bb.position() + 14)
              bitCount = bb.getShort.toInt
            case s if s.length == 4 && s.endsWith("db") =>
              val bytes = new Array[Byte](sz); bb.get(bytes)
              frames += decodeDib(bytes, w, h, bitCount)
            case s if s.length == 4 && s.endsWith("dc") =>
              val bytes = new Array[Byte](sz); bb.get(bytes)
              // in-memory stream per frame (see [[ImageIoCodec]].read —
              // the default path pays a temp file per MJPEG frame)
              val img = javax.imageio.ImageIO.read(
                new javax.imageio.stream.MemoryCacheImageInputStream(
                  new java.io.ByteArrayInputStream(bytes)))
              require(img != null, "undecodable compressed frame")
              frames += img
            case _ => // strh/idx1/JUNK/vedt…: skip
          }
          bb.position(math.min(next, end))
        }
      }
      walk(payload.length)
      require(w > 0 && h > 0, "missing avih header")
      Avi(w, h, us, frames.toArray)
    }

    /** Container metadata + the frame chunks' absolute positions WITHOUT
      * decoding any frame: header fields from `avih`/`strf`, positions
      * from `idx1` when present (one arithmetic jump per frame — the
      * seek path), else a linear chunk walk that skips frame BYTES
      * (still no decode). The selective-decode primitive: sampling k
      * frames of an n-frame clip decodes k. */
    final case class AviLayout(width: Int, height: Int, usPerFrame: Long,
        bitCount: Int, framePos: Array[Int]) // position of each frame chunk's fourcc

    def layout(payload: Array[Byte]): AviLayout = {
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def four(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      require(four() == "RIFF", "not a RIFF container")
      bb.getInt
      require(four() == "AVI ", "not an AVI")
      var (w, h, us) = (0, 0, 0L)
      var bitCount = 24
      var moviPos = -1 // position of the "movi" fourcc
      var moviEnd = -1
      val idxPos = scala.collection.mutable.ArrayBuffer[Int]()
      var sawIdx1 = false
      def walk(end: Int): Unit = {
        while (bb.position() + 8 <= end) {
          val id = four()
          val sz = bb.getInt
          require(sz >= 0, s"malformed AVI: chunk '$id' declares size $sz") // see parse()
          val next = bb.position() + sz + (sz & 1)
          id match {
            case "LIST" =>
              val typ = four()
              if (typ == "movi") { moviPos = bb.position() - 4; moviEnd = bb.position() + sz - 4 }
              else if (typ == "hdrl" || typ == "strl") walk(bb.position() + sz - 4)
            case "avih" =>
              us = bb.getInt.toLong & 0xFFFFFFFFL
              bb.position(bb.position() + 28)
              w = bb.getInt; h = bb.getInt
            case "strf" =>
              bb.position(bb.position() + 14)
              bitCount = bb.getShort.toInt
            case "idx1" =>
              sawIdx1 = true
              var p = bb.position()
              // idx1 offsets are movi-relative per spec, but a known
              // encoder family writes ABSOLUTE file offsets; players
              // sniff by probing whether the first entry's bytes name
              // the entry's own chunk. Same here: resolve per entry,
              // preferring movi-relative, falling back to absolute.
              def resolves(at: Int, tag: String): Boolean =
                at >= 0 && at + 4 <= payload.length &&
                  new String(payload.slice(at, at + 4), "US-ASCII") == tag
              while (p + 16 <= bb.position() + sz) {
                val tag = new String(payload.slice(p, p + 4), "US-ASCII")
                if (tag.endsWith("db") || tag.endsWith("dc")) {
                  val off = java.nio.ByteBuffer.wrap(payload, p + 8, 4)
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
                  val rel = moviPos + off
                  if (resolves(rel, tag)) idxPos += rel
                  else if (resolves(off, tag)) idxPos += off // absolute variant
                  else require(false,
                    s"malformed AVI: idx1 entry for '$tag' resolves neither " +
                      s"movi-relative ($rel) nor absolute ($off)")
                }
                p += 16
              }
            case _ =>
          }
          bb.position(math.min(next, end))
        }
      }
      walk(payload.length)
      require(w > 0 && h > 0 && moviPos >= 0, "missing avih/movi")
      val pos =
        if (sawIdx1 && idxPos.nonEmpty) idxPos.toArray
        else {
          // no index: linear walk of movi, skipping frame bytes. LIST
          // 'rec ' groupings (standard for interleaved clips — parse()
          // descends them) are entered, not skipped: only the 12-byte
          // LIST header is stepped over, so wrapped frame chunks are
          // still found. Negative sizes fail loudly (see the walks).
          val out = scala.collection.mutable.ArrayBuffer[Int]()
          var p = moviPos + 4
          while (p + 8 <= moviEnd) {
            val tag = new String(payload.slice(p, p + 4), "US-ASCII")
            val sz = java.nio.ByteBuffer.wrap(payload, p + 4, 4)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
            require(sz >= 0, s"malformed AVI: chunk '$tag' declares size $sz")
            if (tag.endsWith("db") || tag.endsWith("dc")) { out += p; p += 8 + sz + (sz & 1) }
            else if (tag == "LIST") p += 12 // descend into the grouping
            else p += 8 + sz + (sz & 1)
          }
          out.toArray
        }
      AviLayout(w, h, us, bitCount, pos)
    }

    /** Decode ONLY the requested frame indices (deduped, in-range),
      * seeking each chunk through [[layout]] — the per-frame twin of
      * [[parse]], bit-identical on the frames both decode. */
    def decodeFramesAt(payload: Array[Byte], idxs: Seq[Int]): Seq[(Int, java.awt.image.BufferedImage)] = {
      val lay = layout(payload)
      idxs.distinct.sorted.filter(i => i >= 0 && i < lay.framePos.length).map { i =>
        val p = lay.framePos(i)
        val tag = new String(payload.slice(p, p + 4), "US-ASCII")
        val sz = java.nio.ByteBuffer.wrap(payload, p + 4, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        val bytes = payload.slice(p + 8, p + 8 + sz)
        val img =
          if (tag.endsWith("db")) decodeDib(bytes, lay.width, lay.height, lay.bitCount)
          else {
            // in-memory stream (see [[ImageIoCodec]].read)
            val im = javax.imageio.ImageIO.read(
              new javax.imageio.stream.MemoryCacheImageInputStream(
                new java.io.ByteArrayInputStream(bytes)))
            require(im != null, "undecodable compressed frame")
            im
          }
        (i, img)
      }
    }

    private def decodeDib(bytes: Array[Byte], w: Int, h: Int,
        bitCount: Int): java.awt.image.BufferedImage = {
      require(bitCount == 24, s"only 24-bit DIB frames supported, got $bitCount")
      val stride = (w * 3 + 3) / 4 * 4
      require(bytes.length >= stride * h, "truncated DIB frame")
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * stride
        var x = 0
        while (x < w) {
          val b = bytes(row + x * 3) & 0xFF
          val g = bytes(row + x * 3 + 1) & 0xFF
          val r = bytes(row + x * 3 + 2) & 0xFF
          px(y * w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      img.setRGB(0, 0, w, h, px, 0, w)
      img
    }

    private def luma(p: Int): Double =
      0.299 * ((p >> 16) & 0xFF) / 255.0 +
        0.587 * ((p >> 8) & 0xFF) / 255.0 + 0.114 * (p & 0xFF) / 255.0

    /** [n_frames, w, h, fps, mean_luma, motion, first_luma, last_luma]
      * over the decoded frames; motion = mean per-pixel |luma delta|
      * between consecutive frames (0 for single-frame clips). Pixel
      * loops walk one bulk-grabbed int array per frame (the
      * [[ImageIoCodec.argb]] rationale). */
    override def decode(payload: Array[Byte]): Array[Float] = {
      val avi = parse(payload)
      featuresOf(avi, avi.frames.map(ImageIoCodec.argb))
    }

    private def featuresOf(avi: Avi, pxs: Array[Array[Int]]): Array[Float] = {
      val n = pxs.length
      require(n > 0, "no frames")
      val lumas = pxs.map { px =>
        var s = 0.0; var i = 0
        while (i < px.length) { s += luma(px(i)); i += 1 }
        s / px.length
      }
      var motion = 0.0
      var f = 1
      while (f < n) {
        val (a, b) = (pxs(f - 1), pxs(f))
        var d = 0.0; var i = 0
        while (i < a.length) { d += math.abs(luma(b(i)) - luma(a(i))); i += 1 }
        motion += d / a.length
        f += 1
      }
      Array(n.toFloat, avi.width.toFloat, avi.height.toFloat,
        (1000000.0 / avi.usPerFrame).toFloat, (lumas.sum / n).toFloat,
        (if (n > 1) motion / (n - 1) else 0.0).toFloat,
        lumas.head.toFloat, lumas.last.toFloat)
    }

    /** Rolling hash over decoded frame pixels in (frame, raster) order —
      * a content checksum of the VIDEO, not its container bytes. */
    override def checksum(payload: Array[Byte]): Long =
      checksumOf(parse(payload).frames.map(ImageIoCodec.argb))

    private def checksumOf(pxs: Array[Array[Int]]): Long = {
      var h = 1125899906842597L
      pxs.foreach { px =>
        var i = 0
        while (i < px.length) { h = 31 * h + px(i); i += 1 }
      }
      h
    }

    override def decodeWithChecksum(payload: Array[Byte]): (Array[Float], Long) = {
      val avi = parse(payload)
      val pxs = avi.frames.map(ImageIoCodec.argb)
      (featuresOf(avi, pxs), checksumOf(pxs))
    }
  }

  /** One decoded video frame: exact integer channel sums (the oracle-
    * bearing columns — order-independent, no FP) plus the FP features
    * specs pin. */
  final case class VideoFrame(
      media_id: Long, frame_idx: Int, frame_ms: Long,
      width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, luma: Double)

  /** A media table of REAL AVI payloads (deterministic DIB test
    * patterns, generated executor-side) — the fixture for the real
    * video-decode path. */
  def syntheticVideoTable(spark: SparkSession, dir: String,
      mjpeg: Boolean = false): Dataset[MediaRow] = {
    import spark.implicits._
    graft.store.Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 6 + 2).cast("int").as("nf"),
        (col("doc_id") % 8 + 4).cast("int").as("w"),
        (col("doc_id") % 6 + 4).cast("int").as("h"))
      .as[(Long, Int, Int, Int)]
      .map { case (id, nf, w, h) =>
        MediaRow(id, "video", AviCodec.syntheticAvi(id, nf, w, h, fps = 10, mjpeg),
          w, h, nf * 100L)
      }
  }

  /** Exact integer channel sums + mean luma of one decoded frame — the
    * single definition both frame tables emit (the x12g/x12h oracles
    * pin these integers; a drift between the full fan-out and the
    * sampled path would break their documented agreement). */
  private def channelSums(px: Array[Int]): (Long, Long, Long, Double) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var lum = 0.0
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val (r, g, b) = ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
      sr += r; sg += g; sb += b
      lum += 0.299 * r / 255.0 + 0.587 * g / 255.0 + 0.114 * b / 255.0
      i += 1
    }
    (sr, sg, sb, lum / px.length)
  }

  /** Per-frame fan-out with REAL decode: each video row explodes to its
    * decoded frames (the x12c frame-sampling stub made real). Runs in
    * the same per-partition batch shape as [[extractFeatures]]. */
  def videoFrameTable(media: Dataset[MediaRow]): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val avi = AviCodec.parse(m.payload)
        avi.frames.iterator.zipWithIndex.map { case (img, f) =>
          val (sr, sg, sb, meanLum) = channelSums(ImageIoCodec.argb(img))
          VideoFrame(m.media_id, f, f * avi.usPerFrame / 1000,
            avi.width, avi.height, sr, sg, sb, meanLum)
        }
      }
    }
  }

  /** Time-sampled frame decode with REAL seeks: each video row fans out
    * to the frames its duration samples at `intervalMs`, and ONLY those
    * frames are decoded — [[AviCodec.layout]] jumps to the chunk through
    * the container's idx1 index (or a byte-skipping walk when
    * unindexed). The 100-TB shape of frame sampling: a 24 fps corpus
    * sampled at 1 fps decodes 1/24th of its frames, not all of them
    * behind a filter. Emits the same exact integer channel sums as
    * [[videoFrameTable]] for the frames it touches. */
  def sampleFramesDecoded(media: Dataset[MediaRow], intervalMs: Long): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val lay = AviCodec.layout(m.payload)
        // EXACT frame arithmetic, shared with videoFrameTable: frame f
        // starts at f·usPerFrame/1000 ms, and time `off` lands in frame
        // floor(off·1000/usPerFrame). The truncated per-frame-ms form
        // (off / (usPerFrame/1000)) drifts ~1% at any fps that does not
        // divide 1000 — e.g. 30 fps truncates 33333 µs to 33 ms and
        // samples frame 303 where 300 is correct — and disagreed with
        // videoFrameTable on the same frame's frame_ms.
        val usPf = math.max(1L, lay.usPerFrame)
        val n = lay.framePos.length
        val idxs = (0L until m.duration_ms by intervalMs)
          .map(off => (off * 1000 / usPf).toInt).distinct.filter(_ < n)
        AviCodec.decodeFramesAt(m.payload, idxs).iterator.map { case (f, img) =>
          val (sr, sg, sb, meanLum) = channelSums(ImageIoCodec.argb(img))
          VideoFrame(m.media_id, f, f * usPf / 1000, lay.width, lay.height,
            sr, sg, sb, meanLum)
        }
      }
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
        val (feat, sum) = codec.decodeWithChecksum(m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length, sum, feat)
      }
    }
  }

  /** Resize-to-fit METADATA stage: scale media so the longest side fits
    * `box`, preserving aspect ratio. The metadata math is integer-exact
    * (`w·box div max(w,h)` — no FP, so plans and engines agree bit-for-
    * bit) and runs as plain codegen'd columns, so a `WHERE out_w < …`
    * prunes before any payload is touched. The payload column here is a
    * size-proportional byte-slice STAND-IN kept for the generic-media
    * (FakeCodec-class) path; the REAL pixel resample is
    * [[resizeMediaDecoded]] — run this form first to prune, that form
    * on the survivors to produce pixels. */
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

  /** REAL decoded resize as a distributed stage: image payloads in,
    * aspect-fit PNG payloads out ([[ImageIoCodec.resizeWithDims]] per
    * row in the per-partition batch shape), metadata columns updated
    * from the DECODED dimensions. This is the production body of
    * [[resizeToFit]] — that form keeps the integer-exact columnar
    * metadata math the oracle gate checks (and prunes on, BEFORE any
    * payload is touched); this one produces the actual pixels. */
  def resizeMediaDecoded(media: Dataset[MediaRow], box: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (payload, ow, oh) = ImageIoCodec.resizeWithDims(m.payload, box)
        MediaRow(m.media_id, m.kind, payload, ow, oh, m.duration_ms)
      }
    }
  }

  /** Frame sampling for video rows: fan one row out to ceil(duration/interval)
    * frame stubs (the explode shape; a real pipeline decodes each frame
    * lazily downstream). */
  def sampleFrames(media: DataFrame, intervalMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("duration_ms") > 0) // 0-length → zero frames, not a crash
      .select(col("media_id"), col("duration_ms"),
        posexplode(sequence(lit(0L), col("duration_ms") - 1, lit(intervalMs)))
          .as(Seq("frame_idx", "frame_offset_ms")))

  /** Perceptual image fingerprints: (media_id, dhash) for every
    * DECODABLE image row ([[ImageIoCodec.dHash]] in the per-partition
    * batch shape); undecodable or degenerate payloads are DROPPED —
    * hashing them to a sentinel would cluster every broken image at
    * Hamming distance 0. One narrow map stage; 8 bytes per image
    * downstream. */
  def imageDHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image").as[MediaRow]
      .mapPartitions { it =>
        it.flatMap(m => ImageIoCodec.dHash(m.payload).map(h => (m.media_id, h)))
      }
      .toDF("media_id", "dhash")
  }

  /** Image NEAR-DUP pairs — the multimodal member of the dedup family
    * (LAION-class corpora dedup images exactly this way): perceptual
    * dHash per image, then the signature-agnostic Hamming banding
    * engine ([[Dedup.signatureNearDups]] — pairs meet only inside a
    * 16-bit-quarter bucket, never all-pairs). Brightness-shifted
    * copies land at distance 0 by construction; resized copies at
    * small distance. Returns (id1, id2, hamming). */
  def imageNearDups(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    Dedup.signatureNearDups(imageDHash(media), "media_id", "dhash", maxHamming)

  /** DCT perceptual fingerprints: (media_id, phash) for every decodable
    * image row ([[ImageIoCodec.pHash]]) — the recompression-robust
    * sibling of [[imageDHash]]; same drop-undecodable discipline, same
    * 8 bytes per image downstream. */
  def imagePHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image").as[MediaRow]
      .mapPartitions { it =>
        it.flatMap(m => ImageIoCodec.pHash(m.payload).map(h => (m.media_id, h)))
      }
      .toDF("media_id", "phash")
  }

  /** Image near-dup pairs over the DCT pHash — the standard robustness
    * upgrade when corpora mix encodings: dHash's adjacent-gradient
    * bits flip under recompression/rescale combinations (JPEG noise
    * lands exactly on near-tie cell comparisons), while the 8×8
    * low-frequency DCT block is what JPEG quantization preserves by
    * design. Same banding engine, same cost shape ([[Dedup
    * .signatureNearDups]] — pairs meet only inside banded buckets). */
  def imageNearDupsPhash(media: Dataset[MediaRow], maxHamming: Int = 6): DataFrame =
    Dedup.signatureNearDups(imagePHash(media), "media_id", "phash", maxHamming)

  /** Audio fingerprints: (media_id, ehash) for every decodable audio
    * row ([[WavCodec.energyHash]]); undecodable/too-short payloads
    * DROP (the [[imageDHash]] discipline). */
  def audioEnergyHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "audio").as[MediaRow]
      .mapPartitions { it =>
        it.flatMap(m => WavCodec.energyHash(m.payload).map(h => (m.media_id, h)))
      }
      .toDF("media_id", "ehash")
  }

  /** Audio NEAR-DUP pairs: energy-contour hash + the same Hamming
    * banding engine — gain-scaled re-encodes of a clip land at
    * distance 0 (exact scaling) or a few bits (normalized). */
  def audioNearDups(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    Dedup.signatureNearDups(audioEnergyHash(media), "media_id", "ehash", maxHamming)

  /** Per-sampled-frame perceptual fingerprints for video rows:
    * (media_id, frame_idx, dhash) — the [[sampleFramesDecoded]] frame
    * selection (exact µs-per-frame arithmetic) hashed through
    * [[ImageIoCodec.dHashPixels]]. Selective decode: only the sampled
    * frames' bytes are touched (idx1-index seeks), 12 bytes per
    * sampled frame downstream. */
  def videoFrameDHash(media: Dataset[MediaRow], intervalMs: Long): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { m =>
          val lay = AviCodec.layout(m.payload)
          val usPf = math.max(1L, lay.usPerFrame)
          val n = lay.framePos.length
          val idxs = (0L until m.duration_ms by intervalMs)
            .map(off => (off * 1000 / usPf).toInt).distinct.filter(_ < n)
          AviCodec.decodeFramesAt(m.payload, idxs).iterator.flatMap {
            case (f, img) =>
              ImageIoCodec.dHashPixels(img.getWidth, img.getHeight,
                ImageIoCodec.argb(img)).map(h => (m.media_id, f, h))
          }
        }
      }
      .toDF("media_id", "frame_idx", "dhash")
  }

  /** Video NEAR-DUP pairs by SHARED FRAME FINGERPRINTS — the standard
    * content-based video dedup baseline: two videos pair when ≥
    * `minShared` of their sampled frames hash identically. Degenerate
    * frame hashes (all-zero / all-one — flat or monotone frames, the
    * black-frame problem) are dropped as non-discriminative BEFORE the
    * join, per-video hashes dedup first, and — the
    * [[Dedup.windowDupPairs]] df-cap discipline — fingerprints carried
    * by more than `maxFreq` videos are dropped too: a real (non-flat)
    * intro/outro card shared by N videos would otherwise fan out N²
    * pairs inside its bucket, and a frame that common is as
    * non-discriminative as a black frame. The equi-join on the 8-byte
    * hash therefore meets only inside a BOUNDED fingerprint bucket —
    * never all-pairs, never a skew key. Returns (id1, id2, shared)
    * where `shared` counts only the discriminative (≤ maxFreq) frames. */
  def videoNearDups(media: Dataset[MediaRow], intervalMs: Long,
      minShared: Int = 2, maxFreq: Int = 1000): DataFrame = {
    val fh = videoFrameDHash(media, intervalMs)
      .filter(col("dhash") =!= 0L && col("dhash") =!= -1L)
      .select(col("media_id"), col("dhash")).distinct()
    // df cap BEFORE the pair join: one hash agg sized by distinct
    // (video, hash) rows bounds every bucket the self-join can see
    val rare = fh.groupBy("dhash").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxFreq).select("dhash")
    val kept = fh.join(rare, Seq("dhash"), "left_semi")
    val a = kept.select(col("dhash"), col("media_id").as("id1"))
    val b = kept.select(col("dhash"), col("media_id").as("id2"))
    a.join(b, "dhash").filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
