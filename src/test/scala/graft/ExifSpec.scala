package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.{Fixtures, MediaCodec}

/** Hand-pinned goldens for the Exif walker and GPS stripper
  * (MediaCodec.exifInfo / stripGps over Fixtures.exifJpegBytes):
  * both TIFF byte orders, the no-GPS and no-Exif branches, exact
  * planted values, byte-size closed forms, raster identity after the
  * strip, and the named sub-IFD refusal.
  */
class ExifSpec extends AnyFunSuite {

  test("exifInfo surfaces the planted tags — little-endian (even id)") {
    val id = 6L // even → II; 6%3=0 → GPS present
    val info = MediaCodec.exifInfo(id, Fixtures.exifJpegBytes(id))
    assert(info.orientation.contains(7)) // 1 + 6%8
    assert(info.dateTime.contains("2024:01:07 10:30:00"))
    assert(info.hasGps)
    assert(info.latRef.contains("N") && info.lonRef.contains("W")) // 6%4=2
    assert(info.latDms.contains((6L, 6L, 6L * 31 % 60)))
    assert(info.lonDms.contains((6L, 42L, 6L * 13 % 60)))
  }

  test("exifInfo surfaces the planted tags — big-endian (odd id)") {
    val id = 3L // odd → MM; 3%3=0 → GPS; 3%2=1 → S; 3%4=3 → W
    val info = MediaCodec.exifInfo(id, Fixtures.exifJpegBytes(id))
    assert(info.orientation.contains(4))
    assert(info.dateTime.contains("2024:01:04 10:30:00"))
    assert(info.latRef.contains("S") && info.lonRef.contains("W"))
    assert(info.latDms.contains((3L, 3L, 33L)))
  }

  test("no-GPS and no-Exif inputs: facts absent, strip is the identity") {
    val noGps = Fixtures.exifJpegBytes(4L) // 4%3=1 → no GPS pointer
    val i1 = MediaCodec.exifInfo(4L, noGps)
    assert(i1.orientation.contains(5) && !i1.hasGps && i1.latDms.isEmpty)
    assert(MediaCodec.stripGps(4L, noGps) eq noGps)
    val plain = Fixtures.jpegBytes(4L) // no APP1 at all
    val i0 = MediaCodec.exifInfo(4L, plain)
    assert(i0.orientation.isEmpty && i0.dateTime.isEmpty && !i0.hasGps)
    assert(MediaCodec.stripGps(4L, plain) eq plain)
  }

  test("stripGps: closed-form sizes, survivors intact, GPS gone, raster byte-identical") {
    for (id <- 0L until 12L) {
      val bytes = Fixtures.exifJpegBytes(id)
      val n = 2 * (2 + id % 3)
      val hasGps = id % 3 != 1
      assert(bytes.length == 148 + 3 * n + (if (hasGps) 182 else 68),
        s"pre-size: id $id")
      val stripped = MediaCodec.stripGps(id, bytes)
      assert(stripped.length == 148 + 3 * n + 68, s"post-size: id $id")
      val after = MediaCodec.exifInfo(id, stripped)
      assert(!after.hasGps && after.latDms.isEmpty, s"GPS residue: id $id")
      assert(after.orientation.contains((1 + id % 8).toInt) &&
        after.dateTime == MediaCodec.exifInfo(id, bytes).dateTime,
        s"survivor tags damaged: id $id")
      assert(java.util.Arrays.equals(
        MediaCodec.pixelsJpeg(id, bytes)._3,
        MediaCodec.pixelsJpeg(id, stripped)._3),
        s"raster disturbed: id $id")
    }
  }

  test("a non-GPS sub-IFD pointer refuses by name ONLY when a rebuild would dangle it") {
    // GPS present + a foreign pointer (Orientation tag at IFD0 entry 1,
    // file offset 22 in II, patched to the Exif IFD 0x8769): a rebuild
    // WOULD dangle it → named refusal
    val id = 6L
    val withGps = Fixtures.exifJpegBytes(id).clone()
    withGps(22) = 0x69.toByte // 0x0112 (12 01 in II) → 0x8769
    withGps(23) = 0x87.toByte
    val e = intercept[IllegalArgumentException] {
      MediaCodec.stripGps(id, withGps)
    }
    assert(e.getMessage.contains("sub-IFD pointer"))
    // NO GPS + the same foreign pointer: nothing to strip, nothing can
    // dangle → identity, not refusal (the review fix: the refusal used
    // to fire before the no-op check)
    val noGps = Fixtures.exifJpegBytes(4L).clone() // 4%3=1 → no GPS
    noGps(22) = 0x69.toByte
    noGps(23) = 0x87.toByte
    assert(MediaCodec.stripGps(4L, noGps) eq noGps)
  }
}
