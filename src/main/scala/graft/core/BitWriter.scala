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
 * r7: pending bits live in the TOP of a 64-bit accumulator and flush as ONE
 * big-endian 8-byte store per full word, instead of the previous byte-at-a-time
 * drain (one array store per output byte, measured as half the exp-Golomb
 * encode profile). The emitted byte stream is identical bit for bit.
 */
final class BitWriter(initialCapacity: Int = 1 << 10) {
  private var buf = new Array[Byte](math.max(initialCapacity, 16))
  private var len = 0    // committed bytes
  private var acc = 0L   // top `nbits` bits pending, first-written bit highest; rest 0
  private var nbits = 0  // invariant: 0 <= nbits < 64 between public calls

  @inline private def flushWord(): Unit = {
    if (len + 8 > buf.length) buf = Arrays.copyOf(buf, math.max(buf.length * 2, len + 8))
    graft.codec.BytePack.storeLongBE(buf, len, acc)
    len += 8
    acc = 0L
    nbits = 0
  }

  /** Write the low `n` bits of `v`, MSB-first. 0 <= n <= 64. */
  def writeBits(v: Long, n: Int): Unit = {
    if (n <= 0) return
    val vv = if (n >= 64) v else v & ((1L << n) - 1L)
    val free = 64 - nbits // >= 1 (nbits < 64 invariant)
    if (n <= free) {
      // n == free == 64 only when nbits == 0: shift by 0 is correct there
      acc |= vv << (free - n)
      nbits += n
      if (nbits == 64) flushWord()
    } else {
      acc |= vv >>> (n - free) // top `free` bits of the value complete the word
      flushWord()
      val rem = n - free       // 1..63 remaining low bits start the next word
      acc = vv << (64 - rem)
      nbits = rem
    }
  }

  /** Write `n` zero bits. `n` may exceed 64 (zero runs can reach the type width). */
  def writeZeros(n: Int): Unit = {
    var left = n
    while (left > 0) {
      val free = 64 - nbits
      val t = if (left < free) left else free
      nbits += t
      if (nbits == 64) flushWord()
      left -= t
    }
  }

  @inline def writeBit1(): Unit = writeBits(1L, 1)

  /** Total bits written so far (before flush padding). */
  def bitLength: Long = len.toLong * 8 + nbits

  /**
   * Zero-pad the final partial byte and return the byte stream
   * (reference flush: src/golomb.h:344-354).
   */
  def toByteArray: Array[Byte] = {
    val extra = (nbits + 7) >>> 3
    val out = new Array[Byte](len + extra)
    System.arraycopy(buf, 0, out, 0, len)
    // acc is top-aligned with zeros below nbits, so whole bytes off the top
    // are already zero-padded
    var i = 0
    while (i < extra) { out(len + i) = (acc >>> (56 - 8 * i)).toByte; i += 1 }
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
