package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.pipeline.Multimodal

/** Real-codec multimodal path: actual PNG/JPEG bytes through the same
  * mapPartitions plumbing the stubbed oracle queries exercise. Fixtures
  * are deterministic synthetic images built in-memory — no files, no
  * randomness. */
class MultimodalSpec extends TestBase {
  import spark.implicits._

  /** w×h image with a fixed per-pixel pattern (full alpha so JPEG's
    * alpha-less round trip can't zero pixels). */
  private def patternImage(w: Int, h: Int): BufferedImage = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, ((x * 7 + y * 13) % 255) << 16 | ((x * 3) % 255) << 8
        | ((y * 5) % 255))
    im
  }

  private def encoded(im: BufferedImage, fmt: String): Array[Byte] = {
    val os = new ByteArrayOutputStream()
    assert(ImageIO.write(im, fmt, os), s"no $fmt writer available")
    os.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, String, Array[Byte])]) =
    rows.toDF("doc_id", "media_type", "media_bytes").repartition(3)

  test("decodeReal: real PNG/JPEG bytes yield true dims and a pixel-level hash") {
    val png = encoded(patternImage(37, 23), "png")
    val jpg = encoded(patternImage(64, 48), "jpg")
    val out = Multimodal.decodeReal(spark,
        mediaDf(Seq((1L, "image/png", png), (2L, "image/jpeg", jpg))))
      .collect().map(d => d.doc_id -> d).toMap
    assert(out(1L).width == 37 && out(1L).height == 23)
    assert(out(2L).width == 64 && out(2L).height == 48)
    assert(out(1L).n_bytes == png.length)
    // PNG is lossless: the raster hash equals the source image's
    assert(out(1L).content_hash ==
      Multimodal.ImageIoDecoder.pixelMd5(patternImage(37, 23)))
  }

  test("content hash is encoding-independent: PNG and BMP of one image collide") {
    val im = patternImage(16, 16)
    val out = Multimodal.decodeReal(spark,
        mediaDf(Seq((1L, "image/png", encoded(im, "png")),
          (2L, "image/bmp", encoded(im, "bmp")))))
      .collect().map(d => d.doc_id -> d.content_hash).toMap
    // same pixels, different container bytes — the content-level dedup key
    assert(out(1L) == out(2L))
  }

  test("corrupt payloads fail loudly by default, drop under dropCorrupt") {
    val png = encoded(patternImage(8, 8), "png")
    val junk = "not an image".getBytes("UTF-8")
    val df = mediaDf(Seq((1L, "image/png", png), (2L, "image/png", junk)))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeReal(spark, df).collect()
    }
    assert(e.getMessage != null)
    val kept = Multimodal.decodeReal(spark, df, dropCorrupt = true)
      .collect().map(_.doc_id).toSeq
    assert(kept == Seq(1L))
  }

  test("resizeReal: true source dims, exact scale factors, deterministic raster") {
    val im = patternImage(100, 50)
    val out = Multimodal.resizeReal(spark,
        mediaDf(Seq((1L, "image/png", encoded(im, "png")))), 224, 224)
      .collect().head
    assert(out.src_w == 100 && out.src_h == 50)
    assert(out.dst_w == 224 && out.dst_h == 224)
    assert(out.scale_x == 2.24 && out.scale_y == 4.48)
    // the nearest-neighbor resize is pure integer math — replayable exactly
    assert(out.resized_hash == Multimodal.ImageIoDecoder.pixelMd5(
      Multimodal.ImageIoDecoder.resize(im, 224, 224)))
  }

  test("audioChunks: hand-checked PCM windows, odd trailing byte " +
      "ignored, silence gate fires on low-energy chunks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, encode}
    // "AB" -> sample 65 + 66*256 = 16961; "  " -> 32 + 32*256 = 8224
    val loud = "AB" * 6 + "Z" // 6 samples + 1 ignored trailing byte
    val quiet = "  " * 4      // 4 samples, mean sq 8224^2 ~ 6.8e7
    val df = Seq((1L, loud), (2L, quiet), (3L, "x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media_bytes"))
    val got = Multimodal.audioChunks(df, windowSamples = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5))))
      .toMap
    val s1 = 65L + 66L * 256L
    assert(got((1L, 0L)) == ((4L, 4L * s1 * s1, s1.toInt, 0)),
      "first full window of the loud doc")
    assert(got((1L, 1L)) == ((2L, 2L * s1 * s1, s1.toInt, 0)),
      "tail window holds the remaining 2 samples; odd byte ignored")
    val s2 = 32L + 32L * 256L
    assert(got((2L, 0L)) == ((4L, 4L * s2 * s2, s2.toInt, 1)),
      "all-space chunk is silence (mean sq ~6.8e7 < 2.5e8)")
    assert(!got.keySet.exists(_._1 == 3L),
      "sub-2-byte payloads have no samples and drop out")
  }
}
