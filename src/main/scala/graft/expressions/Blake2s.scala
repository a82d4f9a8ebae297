package graft.expressions

/** BLAKE2s (32-bit BLAKE2) — clean-room implementation from the public
  * RFC 7693 specification. Supports keyed mode and truncated digests,
  * which the reference uses for event-key v2 (20-byte keyed digest,
  * /root/reference api/events.py:472-528) and topic hashes (6-byte
  * digest, api/events.py:313-341). The JDK has no BLAKE2, so this backs
  * the [[Blake2sHash]] Catalyst expression.
  */
object Blake2s {

  private val IV: Array[Int] = Array(
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)

  private val SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  @inline private def rotr(x: Int, n: Int): Int = (x >>> n) | (x << (32 - n))

  @inline private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def g(v: Array[Int], a: Int, b: Int, c: Int, d: Int,
      x: Int, y: Int): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = rotr(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 12)
    v(a) = v(a) + v(b) + y
    v(d) = rotr(v(d) ^ v(a), 8)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 7)
  }

  private def compress(h: Array[Int], block: Array[Byte], off: Int,
      t: Long, last: Boolean): Unit = {
    val m = new Array[Int](16)
    var i = 0
    while (i < 16) { m(i) = le32(block, off + 4 * i); i += 1 }
    val v = new Array[Int](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t.toInt
    v(13) ^= (t >>> 32).toInt
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 10) {
      val s = SIGMA(r)
      g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** Core digest: optional key (≤32 bytes), output 1..32 bytes. */
  def digest(msg: Array[Byte], key: Array[Byte], outLen: Int): Array[Byte] = {
    require(outLen >= 1 && outLen <= 32, s"blake2s outLen $outLen")
    require(key.length <= 32, "blake2s key must be <= 32 bytes")
    val h = IV.clone()
    h(0) ^= 0x01010000 ^ (key.length << 8) ^ outLen
    var t = 0L
    if (key.nonEmpty) {
      val keyBlock = new Array[Byte](64)
      System.arraycopy(key, 0, keyBlock, 0, key.length)
      if (msg.isEmpty) {
        compress(h, keyBlock, 0, 64L, last = true)
        return out(h, outLen)
      }
      t = 64L
      compress(h, keyBlock, 0, t, last = false)
    }
    if (msg.isEmpty) {
      compress(h, new Array[Byte](64), 0, 0L, last = true)
      return out(h, outLen)
    }
    var off = 0
    while (msg.length - off > 64) {
      t += 64
      compress(h, msg, off, t, last = false)
      off += 64
    }
    val rem = msg.length - off
    val lastBlock = new Array[Byte](64)
    System.arraycopy(msg, off, lastBlock, 0, rem)
    compress(h, lastBlock, 0, t + rem, last = true)
    out(h, outLen)
  }

  private def out(h: Array[Int], outLen: Int): Array[Byte] = {
    val full = new Array[Byte](32)
    var i = 0
    while (i < 8) {
      full(4 * i) = h(i).toByte
      full(4 * i + 1) = (h(i) >>> 8).toByte
      full(4 * i + 2) = (h(i) >>> 16).toByte
      full(4 * i + 3) = (h(i) >>> 24).toByte
      i += 1
    }
    java.util.Arrays.copyOf(full, outLen)
  }

  private val HexChars = "0123456789abcdef".toCharArray

  def toHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(HexChars((bytes(i) >> 4) & 0xf)).append(HexChars(bytes(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** Codegen entry point: UTF8String in → hex UTF8String out. */
  def hexDigestUtf8(input: org.apache.spark.unsafe.types.UTF8String,
      key: Array[Byte], outLen: Int): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      toHex(digest(input.getBytes, key, outLen)))
}
