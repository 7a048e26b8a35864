package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video travel as opaque `binary`
 * columns with typed metadata. The Spark-side shape — schema, partition-
 * preserving batch transform, deterministic stub decoder — is real and
 * tested; the actual codec call is the single stub point
 * ([[StubDecoder.decode]]) since no media libraries ship in this
 * environment. On a real cluster the stub is replaced by a JNI/Pandas-UDF
 * decoder with the identical batch signature.
 */
object Multimodal {

  /** Typed media record (binary payload + metadata). */
  final case class MediaRecord(doc_id: Long, media_type: String, bytes: Array[Byte])

  /** Typed decode output (what a real image decode would yield). */
  final case class DecodedMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      content_hash: String)

  /** The one stubbed call: a real implementation would invoke an image
    * codec here. The stub derives deterministic pseudo-dimensions from the
    * payload so the pipeline shape is fully testable. */
  object StubDecoder {
    def decode(r: MediaRecord): DecodedMeta = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(r.bytes).map("%02x".format(_)).mkString
      DecodedMeta(
        doc_id = r.doc_id,
        media_type = r.media_type,
        n_bytes = r.bytes.length.toLong,
        width = 64 + (math.floorMod(r.bytes.length, 64)),
        height = 64 + (math.floorMod(r.bytes.length / 7, 64)),
        content_hash = hash)
    }
  }

  /**
   * The REAL image codec behind the same batch signature: JDK-bundled
   * `javax.imageio` PNG/JPEG/BMP/GIF decode — no external library. The
   * stub remains the oracle-parity path (the `documents` fixtures carry
   * text bytes, not images); this is what a training-data user swaps in
   * when the binary column holds actual image payloads. `content_hash`
   * is the MD5 of the decoded ARGB raster (row-major), so two encodings
   * of the same pixels hash identically — a content-level near-dup key
   * the encoded-byte hash can't give.
   */
  object ImageIoDecoder {
    def decode(r: MediaRecord): Option[DecodedMeta] = {
      // NonFatal, not just IOException: ImageIO decoders throw
      // RuntimeExceptions (CMMException, IndexOutOfBounds, IAE) on
      // malformed payloads, and dropCorrupt must hold for all of them.
      val img = try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.bytes)))
      } catch { case scala.util.control.NonFatal(_) => None }
      img.map { im =>
        DecodedMeta(r.doc_id, r.media_type, r.bytes.length.toLong,
          im.getWidth, im.getHeight, pixelMd5(im))
      }
    }

    /** MD5 over row-major ARGB ints — encoding-independent content hash. */
    def pixelMd5(im: java.awt.image.BufferedImage): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val buf = java.nio.ByteBuffer.allocate(4 * im.getWidth)
      var y = 0
      while (y < im.getHeight) {
        buf.clear()
        var x = 0
        while (x < im.getWidth) { buf.putInt(im.getRGB(x, y)); x += 1 }
        md.update(buf.array, 0, 4 * im.getWidth)
        y += 1
      }
      md.digest().map("%02x".format(_)).mkString
    }

    /** Encode a BufferedImage as PNG bytes — the image twin of
      * [[WavDecoder.encode16]]. PNG stores 24-bit RGB losslessly, so
      * whatever pixels go in come back bit-exactly from [[decode]]
      * regardless of encoder internals — which is what lets the REAL
      * image path be oracle-certified: a fixture paints images from a
      * known integer pixel formula, the engine decodes them with the
      * production ImageIO path, and the oracle replays the pixel
      * arithmetic from the same formula. */
    def encodePng(im: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ok = javax.imageio.ImageIO.write(im, "png", bos)
      require(ok, "no PNG writer available in this JVM")
      bos.toByteArray
    }

    /** Deterministic nearest-neighbor resize (no Graphics2D rendering
      * pipeline, whose interpolation can differ across JVM builds). */
    def resize(im: java.awt.image.BufferedImage, dstW: Int,
        dstH: Int): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(dstW, dstH,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      var y = 0
      while (y < dstH) {
        val sy = math.min(im.getHeight - 1, y.toLong * im.getHeight / dstH).toInt
        var x = 0
        while (x < dstW) {
          val sx = math.min(im.getWidth - 1, x.toLong * im.getWidth / dstW).toInt
          out.setRGB(x, y, im.getRGB(sx, sy))
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /**
   * [[decodeMeta]] with the real codec: same partition-preserving
   * mapPartitions shape, actual pixels. Corrupt/undecodable payloads
   * FAIL the job by default (silent loss is the wrong default for a
   * training corpus); `dropCorrupt = true` drops them instead — the
   * web-scale setting, where a tolerable fraction of crawl images is
   * always broken.
   */
  def decodeReal(spark: SparkSession, media: DataFrame,
      dropCorrupt: Boolean = false): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("media_bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, mt, bytes) =>
          ImageIoDecoder.decode(MediaRecord(id, mt, bytes)) match {
            case some @ Some(_) => some
            case None if dropCorrupt => None
            case None => throw new IllegalArgumentException(
              s"doc_id=$id: payload (${bytes.length} bytes, $mt) is not a " +
                "decodable image; use dropCorrupt=true to skip corrupt media")
          }
        }
      }
  }

  /** Real resize: decode → deterministic nearest-neighbor scale → ARGB
    * raster hash of the RESIZED image. Same output schema as
    * [[resizeStub]]. */
  def resizeReal(spark: SparkSession, media: DataFrame,
      dstW: Int = 224, dstH: Int = 224,
      dropCorrupt: Boolean = false): Dataset[ResizedMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img = try {
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
          } catch { case scala.util.control.NonFatal(_) => None }
          img match {
            case Some(im) =>
              val resized = ImageIoDecoder.resize(im, dstW, dstH)
              Some(ResizedMeta(id, im.getWidth, im.getHeight, dstW, dstH,
                round6(dstW.toDouble / im.getWidth),
                round6(dstH.toDouble / im.getHeight),
                ImageIoDecoder.pixelMd5(resized)))
            case None if dropCorrupt => None
            case None => throw new IllegalArgumentException(
              s"doc_id=$id: payload is not a decodable image")
          }
        }
      }
  }

  /** Attach a binary media column (payload = utf-8 bytes of the text in
    * tests; on a real pipeline this is the raw image/audio blob). */
  def withMediaColumn(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("media_bytes", encode(col(textCol), "UTF-8").cast("binary"))
      .withColumn("media_type",
        when(length(col(textCol)) % 3 === 0, "image/jpeg")
          .when(length(col(textCol)) % 3 === 1, "image/png")
          .otherwise("audio/wav"))

  /** Batch decode: partition-preserving `mapPartitions` (the Scala analog
    * of `mapInPandas`) — no shuffle, codec state amortized per partition. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("media_bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec handles, etc.)
        it.map { case (id, mt, bytes) =>
          StubDecoder.decode(MediaRecord(id, mt, bytes))
        }
      }
  }

  /** Typed resize output: source dims, target dims, scale factors, and a
    * content hash of the (stubbed) resized payload. */
  final case class ResizedMeta(
      doc_id: Long,
      src_w: Int, src_h: Int,
      dst_w: Int, dst_h: Int,
      scale_x: Double, scale_y: Double,
      resized_hash: String)

  /** Scalar feature extraction output (a real extractor yields an
    * embedding; scalars here keep the result oracle-hashable). */
  final case class MediaFeatures(
      doc_id: Long,
      f_bytes: Long,
      f_aspect: Double,
      f_fill: Double,
      feat_hash: String)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Batch resize: same partition-preserving `mapPartitions` shape as
    * [[decodeMeta]] — a real implementation swaps the stub for an image
    * library call with the identical (bytes → bytes + dims) signature. */
  def resizeStub(spark: SparkSession, media: DataFrame,
      dstW: Int = 224, dstH: Int = 224): Dataset[ResizedMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val w = 64 + math.floorMod(n, 64)
          val h = 64 + math.floorMod(n / 7, 64)
          ResizedMeta(id, w, h, dstW, dstH,
            round6(dstW.toDouble / w), round6(dstH.toDouble / h),
            md5hex(s"$id:${dstW}x$dstH"))
        }
      }
  }

  /** Batch feature extraction: per-partition extractor state (a model
    * handle in a real pipeline), deterministic stub features here. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val w = 64 + math.floorMod(n, 64)
          val h = 64 + math.floorMod(n / 7, 64)
          MediaFeatures(id, n.toLong,
            round6(w.toDouble / h),
            round6((n % 255).toDouble / 255.0),
            md5hex(s"$id:$n"))
        }
      }
  }

  /** Frame sampling: one row per sampled frame index, stub frame hash.
    * Pure generate (explode) — distributes with the documents. */
  def sampleFrames(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
        explode(sequence(lit(0L), (octet_length(col("media_bytes")) % 5).cast("long")))
          .as("frame_idx"))
      .withColumn("frame_hash",
        md5(concat(col("doc_id").cast("string"), lit(":"),
          col("frame_idx").cast("string"))))

  /**
   * Perceptual-hash-style signature over the binary media column: a
   * 32-bit SimHash over the payload's distinct 4-byte shingles (stride
   * 1), sharing [[Dedup]]'s vote core. Near-identical payloads —
   * re-encodes with small deltas, trailing-metadata variants — land at
   * small hamming distance, which is the property a REAL perceptual
   * hash (pHash DCT over decoded pixels) provides for images; with no
   * media codecs in this environment the byte-shingle form is the
   * deterministic stand-in (the [[StubDecoder]] discipline), and a real
   * decoder would swap in at the feature-extraction step only — the
   * signature, banding, and verify plumbing are the production shape.
   *
   * Payloads shorter than 4 bytes have no shingles and drop out (no
   * signature — mirrored by the oracle's empty generate_series).
   */
  def phash(media: DataFrame, idCol: String = "doc_id",
      bytesCol: String = "media_bytes"): DataFrame = {
    val nBytes = octet_length(col(bytesCol))
    Dedup.simhashFromFeatures(
      // spread first: the byte-4-gram explode + per-gram md5 below is
      // the query's whole cost, and a single-row-group media table
      // would otherwise run it on one core (Dedup.spread is a no-op
      // when the input already scans at session width)
      Dedup.spread(media, col(idCol))
        .select(col(idCol).as("doc_id"),
          hex(col(bytesCol)).as("hx"), nBytes.as("nb"))
        .select(col("doc_id"),
          explode(array_distinct(
            when(col("nb") >= 4,
              transform(sequence(lit(0), col("nb") - 4),
                i => col("hx").substr(i * 2 + 1, lit(8))))
              .otherwise(array().cast("array<string>")))).as("tok")),
      nBits = 32)
      .withColumnRenamed("simhash", "phash")
  }

  /**
   * Fixed-window audio chunking with integer energy gating: sample j
   * is the CODEPOINT PAIR `cp(2j) + 256·cp(2j+1)` of the payload
   * DECODED AS UTF-8 TEXT (a trailing odd codepoint is ignored,
   * sub-2-codepoint payloads drop out), split into `windowSamples`-
   * sample chunks; each chunk reports exact integer acoustics —
   * `sum_sq` (Σ s², the energy numerator), `peak`, and an
   * `is_silence` flag from the floor-div mean square. Silence-gated
   * chunking is the first stage of every speech-data pipeline
   * (VAD-lite). This is the deterministic TEXT STAND-IN for PCM (the
   * [[StubDecoder]] discipline — the oracle does the same codepoint
   * math): on ASCII fixtures a codepoint pair coincides with a 16-bit
   * LE byte pair, but non-ASCII codepoints exceed 255 (a "sample" can
   * land far above 65535) and genuinely binary payloads are invalid
   * UTF-8 whose bytes decode to replacement characters — do NOT read
   * this as a byte-level PCM decoder. [[audioChunksReal]] is the real
   * one ([[WavDecoder]], actual WAV payloads); it replaces the sample
   * EXTRACTION only, while the chunk shapes, the integer energy
   * algebra, and the gating survive unchanged.
   *
   * Scale shape: samples materialize per document as one codegen'd
   * `transform` array + `posexplode` (no per-sample string carry),
   * then one grouped aggregate with map-side partials on
   * (doc, chunk). All arithmetic is BIGINT — partitioning-invariant
   * and oracle-replayable (`mm_audio_chunks`).
   */
  def audioChunks(media: DataFrame, windowSamples: Int = 256,
      idCol: String = "doc_id",
      bytesCol: String = "media_bytes"): DataFrame = {
    require(windowSamples >= 4 && windowSamples <= 65536,
      s"windowSamples must be in [4, 65536], got $windowSamples")
    // spread before the per-sample explode (the chunker's whole cost;
    // single-row-group media ran it on one core — no-op at scale)
    // Dedup.unpushable pins the __n filter ABOVE the spread exchange —
    // pushed below, it re-inlines the UTF-8 decode into the scan-side
    // predicate and runs it twice (once single-task)
    Dedup.spread(media, col(idCol))
      .select(col(idCol).as("doc_id"),
        Dedup.unpushable(decode(col(bytesCol), "UTF-8")).as("__s"))
      .withColumn("__n", expr("length(__s) div 2"))
      .filter(col("__n") >= 1)
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0L, __n - 1),
          |  j -> ascii(substring(__s, cast(2*j+1 as int), 1))
          |     + 256 * ascii(substring(__s, cast(2*j+2 as int), 1)))"""
          .stripMargin)).as(Seq("j", "s")))
      .groupBy(col("doc_id"),
        expr(s"cast(j as bigint) div $windowSamples").as("chunk_idx"))
      .agg(count(lit(1)).as("n_samples"),
        sum(expr("cast(s as bigint) * cast(s as bigint)")).as("sum_sq"),
        max(col("s")).as("peak"))
      .withColumn("is_silence",
        (expr("sum_sq div n_samples") < 250000000L).cast("int"))
  }

  /**
   * The REAL audio codec behind the same chunk signature: JDK-bundled
   * `javax.sound.sampled` WAV decode — the audio twin of
   * [[ImageIoDecoder]] (no external library). The text-stand-in
   * [[audioChunks]] remains the oracle-parity path (the fixtures carry
   * text bytes, not audio); this is what a training-data user swaps in
   * when the binary column holds actual WAV payloads. Any input format
   * the JDK can open converts to 16-bit signed PCM before sampling
   * (8-bit unsigned and big-endian WAVs included), so `samples` are
   * always signed 16-bit values in frame order, channel-interleaved.
   */
  object WavDecoder {

    /** Decoded audio: format metadata + interleaved signed samples. */
    final case class WavAudio(sampleRate: Float, channels: Int,
        samples: Array[Int])

    /** None on anything the JDK cannot parse as audio — the
      * [[ImageIoDecoder.decode]] NonFatal discipline (malformed RIFF
      * headers throw unchecked exceptions from deep inside the SPI). */
    def decode(bytes: Array[Byte]): Option[WavAudio] =
      try {
        val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val f = raw.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
          f.getSampleRate, false)
        val in = javax.sound.sampled.AudioSystem
          .getAudioInputStream(target, raw)
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        val b = buf.toByteArray
        val samples = new Array[Int](b.length / 2)
        var i = 0
        while (i < samples.length) {
          samples(i) = ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort
            .toInt
          i += 1
        }
        Some(WavAudio(f.getSampleRate, f.getChannels, samples))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Encode signed 16-bit samples as a mono PCM WAV payload (RIFF
      * header + little-endian data) — the inverse of [[decode]] for
      * the 16-bit case, which round-trips bit-exactly (the JDK's
      * PCM_SIGNED 16-bit LE target is a passthrough). This is what
      * lets the REAL codec path be oracle-certified: a fixture
      * generates payloads from a known integer sample table, the
      * engine decodes them with the production [[WavDecoder]], and
      * the oracle replays the acoustics from the same table — a hash
      * match proves encode → JDK decode → chunk is exact end to end.
      * Samples clamp to the signed-16 range. */
    def encode16(samples: Array[Int], sampleRate: Int): Array[Byte] = {
      require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
      val dataLen = 2 * samples.length
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16) // block align, bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(s => bb.putShort(
        math.max(-32768, math.min(32767, s)).toShort))
      bb.array()
    }
  }

  /**
   * [[audioChunks]] with the real codec: decode each payload as WAV
   * ([[WavDecoder]]), fold channels to per-frame mean (integer floor —
   * mono analysis view), chunk by `windowSamples`, and report the same
   * exact integer acoustics per chunk — `sum_sq`, `peak` (of |s| now:
   * real PCM is signed), `is_silence` from the floor-div mean square
   * against `silenceMeanSq` (default (0.05·full-scale)² ≈ a −26 dBFS
   * gate). Same partition-preserving mapPartitions shape as
   * [[decodeReal]]; undecodable payloads FAIL the job by default,
   * `dropCorrupt = true` drops them (the web-scale setting).
   *
   * Output schema matches [[audioChunks]] exactly —
   * `(doc_id, chunk_idx, n_samples, sum_sq, peak, is_silence)` — so
   * swapping decoders never touches downstream plans.
   */
  def audioChunksReal(spark: SparkSession, media: DataFrame,
      windowSamples: Int = 256, silenceMeanSq: Long = 2683044L,
      dropCorrupt: Boolean = false): DataFrame = {
    require(windowSamples >= 4 && windowSamples <= 65536,
      s"windowSamples must be in [4, 65536], got $windowSamples")
    require(silenceMeanSq >= 0,
      s"silenceMeanSq must be >= 0, got $silenceMeanSq")
    import spark.implicits._
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          WavDecoder.decode(bytes) match {
            case Some(a) =>
              val ch = a.channels
              val nFrames = a.samples.length / ch
              (0 until nFrames).iterator.map { j =>
                var s = 0L
                var c = 0
                while (c < ch) { s += a.samples(j * ch + c); c += 1 }
                // floorDiv: the mean of signed samples can be negative
                (id, j.toLong / windowSamples, Math.floorDiv(s, ch))
              }
            case None if dropCorrupt => Iterator.empty
            case None => throw new IllegalArgumentException(
              s"doc_id=$id: payload is not decodable audio")
          }
        }
      }
      .toDF("doc_id", "chunk_idx", "s")
      .groupBy("doc_id", "chunk_idx")
      .agg(count(lit(1)).as("n_samples"),
        sum(expr("s * s")).as("sum_sq"),
        max(abs(col("s"))).as("peak"))
      .withColumn("is_silence",
        (expr("sum_sq div n_samples") < silenceMeanSq).cast("int"))
  }

  /**
   * REAL-codec per-image integer pixel statistics — the image
   * analogue of [[audioChunksReal]]'s exact acoustics: decode each
   * payload with the production ImageIO path, then one pass over the
   * raster reporting `(doc_id, width, height, n_px, sum_r, sum_g,
   * sum_b, peak_lum, is_flat)` — channel sums, the peak integer
   * luminance (`2126·r + 7152·g + 722·b`, the Rec.709 weights scaled
   * ×10000 to stay in exact BIGINT arithmetic), and a flat-image flag
   * (every pixel identical — the blank/placeholder screen a crawl
   * image pipeline gates on). All integers, so the line is
   * hash-certifiable end to end (`mm_image_real`): generated PNG →
   * JDK decode → pixel fold, replayed by the oracle from the same
   * pixel table. Same partition-preserving mapPartitions shape as
   * [[decodeReal]]; undecodable payloads fail loudly by default,
   * `dropCorrupt = true` drops them.
   */
  def imageStatsReal(spark: SparkSession, media: DataFrame,
      dropCorrupt: Boolean = false): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img = try {
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
          } catch { case scala.util.control.NonFatal(_) => None }
          img match {
            case Some(im) =>
              val w = im.getWidth
              val h = im.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              var peak = 0L
              var first = -1; var flat = 1
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = im.getRGB(x, y) & 0xffffff
                  if (first < 0) first = rgb
                  else if (rgb != first) flat = 0
                  val r = (rgb >> 16) & 0xff
                  val g = (rgb >> 8) & 0xff
                  val b = rgb & 0xff
                  sr += r; sg += g; sb += b
                  val lum = 2126L * r + 7152L * g + 722L * b
                  if (lum > peak) peak = lum
                  x += 1
                }
                y += 1
              }
              Some((id, w.toLong, h.toLong, w.toLong * h, sr, sg, sb,
                peak, flat))
            case None if dropCorrupt => None
            case None => throw new IllegalArgumentException(
              s"doc_id=$id: payload is not a decodable image")
          }
        }
      }
      .toDF("doc_id", "width", "height", "n_px", "sum_r", "sum_g",
        "sum_b", "peak_lum", "is_flat")
      .withColumn("is_flat", col("is_flat").cast("int"))
  }

  /** Near-dup media pairs: [[phash]] signatures through the same
    * pigeonhole-lossless 4×8-bit band join + hamming-≤3 verify as text
    * SimHash — shuffle volume O(n·bands), never a cross join. */
  def phashPairs(media: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id",
      bytesCol: String = "media_bytes"): DataFrame =
    Dedup.simhashPairsFromSigs(
      Dedup.persistInternal("phash_sig",
        phash(media, idCol, bytesCol)
          .withColumnRenamed("phash", "simhash")),
      maxHamming)
}
