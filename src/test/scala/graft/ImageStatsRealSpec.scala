package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/**
 * Real image codec certification plumbing ([[Multimodal.encodePng]] →
 * ImageIO decode → [[Multimodal.imageStatsReal]]): PNG round-trips
 * 24-bit RGB losslessly, so the decoded pixel fold must reproduce the
 * painted pixel table exactly; flat images flag; corrupt payloads are
 * loud by default and droppable in the web-scale setting.
 */
class ImageStatsRealSpec extends TestBase {

  import spark.implicits._

  private def paint(w: Int, h: Int)(
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val (r, g, b) = px(x, y)
        im.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
    }
    Multimodal.ImageIoDecoder.encodePng(im)
  }

  test("png encode -> production decode -> pixel fold is bit-exact") {
    val bytes = paint(3, 2)((x, y) => (10 * x + 1, 20 * y + 2, x + y))
    val rows = Multimodal.imageStatsReal(spark,
      Seq((1L, bytes)).toDF("doc_id", "media_bytes")).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(1) == 3 && r.getLong(2) == 2 && r.getLong(3) == 6)
    // sum_r over x in 0..2 twice: 2*(1+11+21) = 66
    assert(r.getLong(4) == 66)
    // sum_g over y in 0..1 three times: 3*(2+22) = 72
    assert(r.getLong(5) == 72)
    // sum_b = (0+1+2)+(1+2+3) = 9
    assert(r.getLong(6) == 9)
    // peak lum at (2,1): r=21 g=22 b=3 -> 2126*21+7152*22+722*3
    assert(r.getLong(7) == 2126L * 21 + 7152L * 22 + 722L * 3)
    assert(r.getInt(8) == 0)
  }

  test("flat image flags; corrupt payloads loud by default, " +
      "droppable on demand") {
    val flat = paint(4, 4)((_, _) => (7, 8, 9))
    val df = Seq((1L, flat), (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "media_bytes")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.imageStatsReal(spark, df).collect()
    }
    assert(e.getMessage.contains("doc_id=2") ||
      String.valueOf(e.getCause).contains("doc_id=2"))
    val ok = Multimodal.imageStatsReal(spark, df, dropCorrupt = true)
      .collect()
    assert(ok.length == 1 && ok(0).getInt(8) == 1,
      "flat image must flag is_flat = 1")
    assert(ok(0).getLong(7) == 2126L * 7 + 7152L * 8 + 722L * 9)
  }
}
