package graft.core

import java.util.Arrays

/**
 * MSB-first bitstream writer emitting bytes.
 *
 * Reproduces the reference encoder's word packing for the default u8 word type
 * (reference: src/golomb.h:167-355): bits fill each output byte MSB-first; the final
 * partial byte is zero-padded on flush (src/golomb.h:344-354). Because the reference
 * serializes multi-byte words big-endian (src/golomb.h:76-101), this byte stream is
 * also the canonical serialization for ANY word width, modulo flush padding to the
 * word size — see [[BitWriter.padToWordBytes]].
 *
 * A 64-bit accumulator keeps at most 7 pending bits between public calls, so a single
 * `writeBits` of up to 56 bits never overflows; wider writes split internally.
 */
final class BitWriter(initialCapacity: Int = 1 << 10) {
  private var buf = new Array[Byte](math.max(initialCapacity, 16))
  private var len = 0
  private var acc = 0L   // low `nbits` bits are pending, first-written bit highest
  private var nbits = 0  // invariant: 0 <= nbits < 8 between public calls

  @inline private def ensure(extraBytes: Int): Unit = {
    if (len + extraBytes > buf.length) {
      buf = Arrays.copyOf(buf, math.max(buf.length * 2, len + extraBytes))
    }
  }

  @inline private def drain(): Unit = {
    while (nbits >= 8) {
      nbits -= 8
      buf(len) = (acc >>> nbits).toByte
      len += 1
    }
  }

  /** Write the low `n` bits of `v`, MSB-first. 0 <= n <= 64. */
  def writeBits(v: Long, n: Int): Unit = {
    if (n > 56) {
      // Split so `acc << n` can never shift meaningful bits out.
      val hi = n - 32
      writeBits(v >>> 32, hi)
      writeBits(v, 32)
    } else if (n > 0) {
      ensure((nbits + n + 7) >>> 3)
      val mask = if (n == 64) -1L else (1L << n) - 1L
      acc = (acc << n) | (v & mask)
      nbits += n
      drain()
    }
  }

  /** Write `n` zero bits. `n` may exceed 64 (zero runs can reach the type width). */
  def writeZeros(n: Int): Unit = {
    var left = n
    while (left > 56) { writeBits(0L, 56); left -= 56 }
    writeBits(0L, left)
  }

  @inline def writeBit1(): Unit = writeBits(1L, 1)

  /** Total bits written so far (before flush padding). */
  def bitLength: Long = len.toLong * 8 + nbits

  /**
   * Zero-pad the final partial byte and return the byte stream
   * (reference flush: src/golomb.h:344-354).
   */
  def toByteArray: Array[Byte] = {
    val out = new Array[Byte](len + (if (nbits > 0) 1 else 0))
    System.arraycopy(buf, 0, out, 0, len)
    if (nbits > 0) out(len) = (acc << (8 - nbits)).toByte
    out
  }

  /** Reset for reuse without reallocating. */
  def reset(): Unit = { len = 0; acc = 0L; nbits = 0 }
}

object BitWriter {
  /**
   * Pad a flushed byte stream to a multiple of `wordBytes`, matching what the
   * reference produces when its `OutputDataT` is a multi-byte word
   * (src/golomb.h:167, serialized big-endian per src/golomb.h:103-108).
   */
  def padToWordBytes(bytes: Array[Byte], wordBytes: Int): Array[Byte] = {
    val rem = bytes.length % wordBytes
    if (rem == 0) bytes else Arrays.copyOf(bytes, bytes.length + (wordBytes - rem))
  }
}
