package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/**
 * Real WAV decode twin ([[Multimodal.WavDecoder]] /
 * [[Multimodal.audioChunksReal]]): bit-exact sample recovery from
 * hand-built RIFF bytes, 8-bit→16-bit conversion via the JDK chain,
 * stereo channel folding, hand-checked chunk acoustics, determinism
 * (the raster-hash discipline applied to sample frames), and the
 * corrupt-payload fail/drop contract.
 */
class WavDecoderSpec extends TestBase {

  import spark.implicits._

  /** Minimal PCM WAV bytes: 44-byte RIFF header + LE samples. */
  private def wav16(samples: Seq[Int], rate: Int = 8000,
      channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array
  }

  private def wav8(samples: Seq[Int], rate: Int = 8000): Array[Byte] = {
    val bb = ByteBuffer.allocate(44 + samples.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(rate).putInt(rate).putShort(1).putShort(8)
    bb.put("data".getBytes("US-ASCII")).putInt(samples.length)
    samples.foreach(s => bb.put(s.toByte))
    bb.array
  }

  test("16-bit PCM round-trips bit-exactly, including negatives and " +
      "full-scale edges") {
    val src = Seq(0, 1, -1, 32767, -32768, 12345, -12345)
    val got = Multimodal.WavDecoder.decode(wav16(src)).get
    assert(got.channels == 1 && got.sampleRate == 8000f)
    assert(got.samples.toSeq == src)
  }

  test("encode16 is decode's exact inverse (the mm_audio_real fixture " +
      "path): byte-identical to the hand-built RIFF, bit-exact " +
      "through the production decoder, out-of-range samples clamp") {
    val src = Seq(0, 7, -9, 32767, -32768, 500, -501)
    assert(Multimodal.WavDecoder.encode16(src.toArray, 8000).toSeq
      == wav16(src).toSeq, "encoder must emit the canonical RIFF bytes")
    val got = Multimodal.WavDecoder.decode(
      Multimodal.WavDecoder.encode16(src.toArray, 8000)).get
    assert(got.samples.toSeq == src)
    assert(Multimodal.WavDecoder.decode(Multimodal.WavDecoder.encode16(
      Array(40000, -40000), 8000)).get.samples.toSeq == Seq(32767, -32768))
  }

  test("8-bit unsigned WAV converts through the JDK chain to signed " +
      "16-bit (midpoint 128 -> 0, full-scale edges, order-preserving; " +
      "the exact scale factor is the JDK SPI's)") {
    val got = Multimodal.WavDecoder.decode(wav8(Seq(128, 255, 0, 200))).get
    val Seq(mid, hi, lo, x) = got.samples.toSeq
    assert(mid == 0 && hi > 32000 && lo == -32768)
    assert(x > 0 && x < hi, "200 lands strictly between midpoint and max")
  }

  test("corrupt payloads: decode is None; audioChunksReal fails loudly " +
      "by default and drops under dropCorrupt") {
    assert(Multimodal.WavDecoder.decode("not audio".getBytes).isEmpty)
    assert(Multimodal.WavDecoder.decode(Array.empty[Byte]).isEmpty)
    // truncated header (RIFF magic only)
    assert(Multimodal.WavDecoder.decode(
      "RIFF\u0000\u0000\u0000\u0000WAVE".getBytes("US-ASCII")).isEmpty)
    val mixed = Seq(
      (1L, wav16(Seq.fill(8)(3000))),
      (2L, "junk".getBytes)).toDF("doc_id", "media_bytes")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.audioChunksReal(spark, mixed, windowSamples = 4).count()
    }
    assert(e.getMessage.contains("doc_id=2") ||
      String.valueOf(e.getCause).contains("doc_id=2"))
    val kept = Multimodal.audioChunksReal(spark, mixed,
      windowSamples = 4, dropCorrupt = true)
    assert(kept.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("hand-checked chunk acoustics: energy, |peak|, tail chunk, " +
      "silence gate on both sides") {
    // 10 samples: 8 loud (+-3000) then 2 quiet (+-100); window 4
    val src = Seq(3000, -3000, 3000, -3000, 3000, -3000, 3000, -3000,
      100, -100)
    val media = Seq((7L, wav16(src))).toDF("doc_id", "media_bytes")
    val rows = Multimodal.audioChunksReal(spark, media, windowSamples = 4)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSeq
    assert(rows == Seq(
      (0L, 4L, 4L * 9000000L, 3000L, 0),
      (1L, 4L, 4L * 9000000L, 3000L, 0),
      // mean square 10000 < the 2683044 default gate -> silence
      (2L, 2L, 2L * 10000L, 100L, 1)))
  }

  test("stereo folds to the per-frame floor mean before chunking") {
    // frames: (1000, 2000) -> 1500; (-1000, -2000) -> -1500;
    // (3, -4) -> floorDiv(-1, 2) = -1 (floor, not truncation)
    val inter = Seq(1000, 2000, -1000, -2000, 3, -4)
    val media = Seq((9L, wav16(inter, channels = 2)))
      .toDF("doc_id", "media_bytes")
    val r = Multimodal.audioChunksReal(spark, media, windowSamples = 4)
      .head()
    assert(r.getLong(2) == 3L, "3 frames from 6 interleaved samples")
    assert(r.getLong(3) == 1500L * 1500 * 2 + 1L, "sum_sq of folded frames")
    assert(r.getLong(4) == 1500L)
  }

  test("determinism: identical bytes give identical chunk frames " +
      "across partitionings (the raster-hash discipline)") {
    val src = (0 until 1000).map(i => ((i * 2654435761L) % 8191).toInt - 4096)
    val media1 = Seq((1L, wav16(src))).toDF("doc_id", "media_bytes")
      .repartition(1)
    val media8 = Seq((1L, wav16(src))).toDF("doc_id", "media_bytes")
      .repartition(8)
    def fp(df: org.apache.spark.sql.DataFrame): Seq[String] =
      Multimodal.audioChunksReal(spark, df, windowSamples = 64)
        .orderBy("chunk_idx")
        .select(md5(concat_ws(":", col("chunk_idx"), col("n_samples"),
          col("sum_sq"), col("peak"), col("is_silence"))))
        .collect().map(_.getString(0)).toSeq
    assert(fp(media1) == fp(media8))
  }
}
