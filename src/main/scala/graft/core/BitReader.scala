package graft.core

/**
 * MSB-first bitstream reader over a byte array.
 *
 * Mirrors the reference decoder's input handling (reference: src/golomb.h:442-625):
 * bits are consumed MSB-first from each byte; zero runs are counted a whole buffered
 * window at a time via bit-width, not bit-by-bit (src/golomb.h:527-542).
 */
final class BitReader(bytes: Array[Byte], offset: Int, length: Int) {
  def this(bytes: Array[Byte]) = this(bytes, 0, bytes.length)

  private var pos = offset           // next byte to load
  private val end = offset + length
  private var acc = 0L               // low `navail` bits valid; next bit is highest of those
  private var navail = 0

  @inline private def maskL(n: Int): Long = if (n == 0) 0L else -1L >>> (64 - n)

  /** Refill the accumulator; returns false when no bits remain at all.
    * r7: whole-word big-endian bulk loads while 8+ bytes remain (the
    * byte-at-a-time append showed in the decode profile); byte loop only for
    * the input tail. Low-aligned accumulator: new bytes shift in from the
    * right, so a bulk chunk lands as one shift+or. */
  @inline private def fill(): Boolean = {
    if (end - pos >= 8) {
      val m = (64 - navail) >>> 3
      if (m == 8) { // JVM shifts are mod 64: `acc << 64` would keep stale bits
        acc = graft.codec.BytePack.loadLongBE(bytes, pos)
        navail = 64
        pos += 8
      } else if (m > 0) {
        val mb = m << 3
        acc = (acc << mb) | (graft.codec.BytePack.loadLongBE(bytes, pos) >>> (64 - mb))
        navail += mb
        pos += m
      }
    } else {
      while (navail <= 56 && pos < end) {
        acc = (acc << 8) | (bytes(pos) & 0xffL)
        navail += 8
        pos += 1
      }
    }
    navail > 0
  }

  /** True while bits remain buffered or unread input remains (src/golomb.h:621-624). */
  def hasData: Boolean = navail > 0 || pos < end

  /**
   * Count zeros up to and including the terminating 1 bit, which is consumed.
   * Returns the zero count, or -1 when input is exhausted first ("done" — trailing
   * flush padding takes this path, src/golomb.h:527-542 with :476-491).
   */
  def scanZeros(): Long = {
    var zeros = 0L
    while (true) {
      if (!fill()) return -1L
      val window = acc & maskL(navail)
      if (window == 0L) {
        zeros += navail
        navail = 0
      } else {
        val bw = 64 - java.lang.Long.numberOfLeadingZeros(window)
        zeros += navail - bw
        navail = bw - 1 // also consumes the terminating 1 (src/golomb.h:544-546)
        return zeros
      }
    }
    -1L // unreachable
  }

  /**
   * Read `n` bits (0 <= n <= 64) MSB-first into the low bits of the result.
   * Returns false when input runs out before `n` bits are available ("done"
   * mid-value, src/golomb.h:557-563); the partial read is discarded by callers.
   */
  private var readValue: Long = 0L
  def readBits(n: Int): Boolean = {
    var left = n
    var res = 0L
    while (left > 0) {
      if (navail == 0 && !fill()) return false
      val t = if (left < navail) left else navail
      val bits = (acc >>> (navail - t)) & maskL(t)
      res = (res << t) | bits
      navail -= t
      left -= t
    }
    readValue = res
    true
  }
  @inline def lastRead: Long = readValue
}
