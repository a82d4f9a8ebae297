package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.{Fixtures, MediaCodec}

/** Golden tests for the REAL media decoders: the fixture bytes in the
  * first two tests are HAND-ASSEMBLED from the public BMP/RIFF layout
  * specs (independent of the repo's encoders), with expected features
  * computed by hand — so an encoder/decoder pair that agreed on a
  * shared misreading of the format would still fail here.
  */
class MultimodalSpec extends AnyFunSuite {

  test("hand-crafted 2x2 24-bit BMP decodes to the hand-computed luma") {
    // w=2, h=2, rowSize=8 (2 pad bytes), bottom-up rows, BGR order.
    // Top-down pixels: (0,0) R10 G20 B30, (1,0) R40 G50 B60,
    //                  (0,1) R70 G80 B90, (1,1) R110 G120 B130
    val bytes = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, // info: size, w, h
      1, 0, 24, 0, 0, 0, 0, 0, 16, 0, 0, 0, // planes, bpp, comp, imgsz
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, // ppm, colors
      90, 80, 70, 130, 120, 110, 0, 0, // stored row 0 = image row y=1
      30, 20, 10, 60, 50, 40, 0, 0 // stored row 1 = image row y=0
    ).map(_.toByte)
    val d = MediaCodec.decodeBmp(7L, bytes)
    assert(d.n_bytes == 70L && d.width.contains(2L) && d.height.contains(2L))
    // luma sum = 299*(10+40+70+110) + 587*(20+50+80+120)
    //          + 114*(30+60+90+130) = 262600; /4000 = 65.65
    assert(d.mean_luma.contains(65.65))
    assert(d.n_samples.isEmpty && d.mean_abs.isEmpty)
  }

  test("hand-crafted 3-sample PCM WAV decodes to the hand-computed stats; chunk walk skips foreign chunks") {
    def wav(extraChunk: Boolean): Array[Byte] = {
      val extra = if (extraChunk)
        Array[Int]('j', 'u', 'n', 'k', 4, 0, 0, 0, 9, 9, 9, 9) else Array[Int]()
      (Array[Int](
        'R', 'I', 'F', 'F', 42 + extra.length, 0, 0, 0, 'W', 'A', 'V', 'E',
        'f', 'm', 't', ' ', 16, 0, 0, 0,
        1, 0, 1, 0, // PCM, mono
        0x40, 0x1f, 0, 0, // 8000 Hz
        0x80, 0x3e, 0, 0, // byte rate 16000
        2, 0, 16, 0) ++ // block align, bits
        extra ++
        Array[Int]('d', 'a', 't', 'a', 6, 0, 0, 0,
          0xe8, 0x03, // +1000
          0x30, 0xf8, // -2000
          0xff, 0x7f) // +32767
      ).map(_.toByte)
    }
    for (withJunk <- Seq(false, true)) {
      val d = MediaCodec.decodeWav(9L, wav(withJunk))
      assert(d.n_samples.contains(3L) && d.duration_ms.contains(0L))
      // mean |s| = (1000 + 2000 + 32767) / 3 = 11922.333333 (6 dp)
      assert(d.mean_abs.contains(11922.333333), s"junk=$withJunk: $d")
      assert(d.width.isEmpty && d.mean_luma.isEmpty)
    }
  }

  test("fixture round-trip matches the closed-form content for a sample of ids") {
    for (id <- Seq(0L, 1L, 2L, 17L, 100L, 12345L)) {
      if (id % 2 == 0) {
        val d = MediaCodec.decodeBmp(id, Fixtures.bmpBytes(id))
        val w = 4 + id % 5
        val h = 3 + id % 4
        assert(d.width.contains(w) && d.height.contains(h))
        var lsum = 0L
        for (y <- 0L until h; x <- 0L until w)
          lsum += 299 * ((id + x + 11 * y) % 256) +
            587 * ((id + 5 * x + y) % 256) + 114 * ((id + 3 * x + 7 * y) % 256)
        assert(d.mean_luma.contains(
          math.floor(lsum / (1000.0 * w * h) * 1e6 + 0.5) / 1e6))
      } else {
        val d = MediaCodec.decodeWav(id, Fixtures.wavBytes(id))
        val n = 64 + id % 129
        assert(d.n_samples.contains(n) && d.duration_ms.contains(n * 1000 / 8000))
        val asum = (0L until n)
          .map(i => math.abs((id * 31 + i * 17) % 65536 - 32768)).sum
        assert(d.mean_abs.contains(
          math.floor(asum / n.toDouble * 1e6 + 0.5) / 1e6))
      }
    }
  }

  test("malformed media fails with a named error, not garbage features") {
    val e1 = intercept[IllegalArgumentException] {
      MediaCodec.decodeBmp(1L, Array.fill[Byte](60)(0))
    }
    assert(e1.getMessage.contains("not a BMP"))
    val e2 = intercept[IllegalArgumentException] {
      MediaCodec.decodeWav(2L, "RIFFxxxxNOPE".getBytes("US-ASCII"))
    }
    assert(e2.getMessage.contains("not a WAV"))
  }

  test("adversarial headers fail named: truncated BMP, zero width, hostile WAV chunk sizes") {
    // a valid BMP truncated mid-pixel-data: named, not AIOOBE
    val whole = Fixtures.bmpBytes(2L)
    val e1 = intercept[IllegalArgumentException] {
      MediaCodec.decodeBmp(2L, whole.take(whole.length - 4))
    }
    assert(e1.getMessage.contains("out of bounds"))
    // width 0 passes no-op pixel loops if unchecked → would emit NaN
    val zeroW = Fixtures.bmpBytes(2L).clone()
    zeroW(18) = 0; zeroW(19) = 0; zeroW(20) = 0; zeroW(21) = 0
    val e2 = intercept[IllegalArgumentException] {
      MediaCodec.decodeBmp(2L, zeroW)
    }
    assert(e2.getMessage.contains("non-positive BMP width"))
    // WAV chunk with NEGATIVE declared size: unchecked, the walk
    // offset never advances → infinite loop inside the executor
    val negChunk = Fixtures.wavBytes(3L).clone()
    negChunk(16) = -1; negChunk(17) = -1; negChunk(18) = -1; negChunk(19) = -1
    val e3 = intercept[IllegalArgumentException] {
      MediaCodec.decodeWav(3L, negChunk)
    }
    assert(e3.getMessage.contains("out of bounds"))
    // data chunk declaring more samples than the buffer holds
    val wav = Fixtures.wavBytes(3L)
    val e4 = intercept[IllegalArgumentException] {
      MediaCodec.decodeWav(3L, wav.take(wav.length - 10))
    }
    assert(e4.getMessage.contains("out of bounds"))
  }
}
