package graft.core

import scala.collection.mutable.ArrayBuilder

/**
 * Exponential-Golomb order-k codec, bit-identical to the reference
 * (reference: src/golomb.h — encoder :167-355, decoder :442-625, free fns :367-408,
 * :644-680), over logical values carried in `Long` per [[PhysicalIntType]].
 *
 * Encoding one unsigned value `u` of width `w` at order `k` (k clamped to w-1,
 * src/golomb.h:177-196):
 *  - `data = (u + 2^k) mod 2^w`
 *  - no wrap: emit `bitWidth(data)-k-1` zeros then the `bitWidth(data)` bits of data
 *    (src/golomb.h:228-236)
 *  - wrap ("top-of-range overflow", src/golomb.h:234-251): emit `w-k` zeros, an
 *    explicit 1, then all `w` bits of the wrapped data — total `2w-k+1` bits.
 *
 * Decoding (src/golomb.h:517-595): count `z` zeros, consume the 1; `digits = z+k`;
 * if `digits > w` → zero_overflow (skipped by the stream decoder, src/golomb.h:653-659);
 * else read `digits` bits into `buffer`, value = `(buffer + ((2^z-1)<<k)) mod 2^w`.
 */
object GolombCodec {

  @inline private def maskL(n: Int): Long = if (n == 0) 0L else -1L >>> (64 - n)

  /** The reference clamps k to width-1 (src/golomb.h:177-196, :455-474). */
  @inline def clampK(k: Int, width: Int): Int =
    if (k < 0) 0 else if (k > width - 1) width - 1 else k

  /** Encode one already-unsigned w-bit value at (clamped) order k. */
  @inline def pushUnsigned(out: BitWriter, u: Long, k: Int, t: PhysicalIntType): Unit = {
    val w = t.width
    val data = (u + (1L << k)) & t.widthMask
    val overflowed =
      if (w == 64) java.lang.Long.compareUnsigned(data, u) < 0
      else data < u
    if (overflowed) {
      out.writeZeros(w - k)
      out.writeBit1()
      out.writeBits(data, w)
    } else {
      val nb = 64 - java.lang.Long.numberOfLeadingZeros(data) // data >= 2^k >= 1
      // the code word is (nb-k-1) zeros then the nb bits of data, whose leading bit
      // is 1 — for total width <= 64 that is ONE field write of data
      val total = 2 * nb - k - 1
      if (total <= 64) out.writeBits(data, total)
      else { out.writeZeros(nb - k - 1); out.writeBits(data, nb) }
    }
  }

  /** Encoded bit cost of unsigned `u` at order k — the chooser's cost model. */
  @inline def bitCost(u: Long, k: Int, t: PhysicalIntType): Int = {
    val w = t.width
    val data = (u + (1L << k)) & t.widthMask
    val overflowed =
      if (w == 64) java.lang.Long.compareUnsigned(data, u) < 0
      else data < u
    if (overflowed) 2 * w - k + 1
    else 2 * (64 - java.lang.Long.numberOfLeadingZeros(data)) - k - 1
  }

  /** Encode a slice of logical values into `out` (no flush — caller flushes).
    * Two specialized loops (w == 64 vs narrower) with the type parameters hoisted
    * to locals, so the hot path carries no per-value dispatch or redundant masks. */
  def encodeInto(out: BitWriter, values: Array[Long], from: Int, until: Int,
                 k0: Int, t: PhysicalIntType): Unit = {
    val w = t.width
    val k = clampK(k0, w)
    val widthMask = t.widthMask
    val signed = t.signed
    val twoK = 1L << k
    var i = from
    if (w == 64) {
      while (i < until) {
        val v = values(i)
        val u = if (signed) (v << 1) ^ (v >> 63) else v
        val data = u + twoK
        if (java.lang.Long.compareUnsigned(data, u) < 0) {
          out.writeZeros(64 - k); out.writeBit1(); out.writeBits(data, 64)
        } else {
          val nb = 64 - java.lang.Long.numberOfLeadingZeros(data)
          val total = 2 * nb - k - 1
          if (total <= 64) out.writeBits(data, total)
          else { out.writeZeros(nb - k - 1); out.writeBits(data, nb) }
        }
        i += 1
      }
    } else {
      while (i < until) {
        val v = values(i)
        val u = (if (signed) (v << 1) ^ (v >> 63) else v) & widthMask
        val data = (u + twoK) & widthMask
        if (data < u) {
          out.writeZeros(w - k); out.writeBit1(); out.writeBits(data, w)
        } else {
          val nb = 64 - java.lang.Long.numberOfLeadingZeros(data)
          val total = 2 * nb - k - 1
          // narrow widths: 2w-1 <= 63, always a single field write
          out.writeBits(data, total)
        }
        i += 1
      }
    }
  }

  /** Encode logical values to the canonical u8-word byte stream. */
  def encode(values: Array[Long], k: Int, t: PhysicalIntType): Array[Byte] = {
    val out = new BitWriter(values.length + 16)
    encodeInto(out, values, 0, values.length, k, t)
    out.toByteArray
  }

  /**
   * Encode with a multi-byte output word (the reference's `OutputDataT` = u16/u32/u64,
   * src/golomb.h:167): bits pack into words MSB-first and words serialize big-endian
   * (src/golomb.h:76-114), so the byte stream equals the canonical u8 stream with the
   * flush zero-padding extended to the word size (verified against tests/test.cpp:93-182
   * word literals in GolombGoldenSpec). Decode is [[decode]] unchanged — trailing pad
   * zeros yield `done` and are dropped regardless of word width.
   */
  def encodeWords(values: Array[Long], k: Int, t: PhysicalIntType, wordBytes: Int): Array[Byte] = {
    require(wordBytes == 1 || wordBytes == 2 || wordBytes == 4 || wordBytes == 8,
      s"word width must be 1/2/4/8 bytes, got $wordBytes")
    BitWriter.padToWordBytes(encode(values, k, t), wordBytes)
  }

  /**
   * Decode a byte stream to logical values. Trailing pad zeros yield "done" and are
   * dropped; zero_overflow results are skipped (reference: src/golomb.h:644-662).
   */
  def decode(bytes: Array[Byte], k0: Int, t: PhysicalIntType): Array[Long] = {
    decodeRange(bytes, 0, bytes.length, k0, t, -1)
  }

  /**
   * Decode at most `limit` values (limit < 0 = no limit) from a byte range.
   * Fused hot loop over an MSB-ALIGNED accumulator: the next unread bits live in
   * the TOP of `acc` (bits below `navail` are always zero), so the zero scan is a
   * bare numberOfLeadingZeros with no masking, and consuming bits is a shift.
   * Same semantics as the reference decoder incl. zero_overflow skip and
   * done-mid-value truncation (src/golomb.h:517-595, :644-662).
   */
  def decodeRange(bytes: Array[Byte], offset: Int, length: Int,
                  k0: Int, t: PhysicalIntType, limit: Int): Array[Long] = {
    val w = t.width
    val k = clampK(k0, w)
    val widthMask = t.widthMask
    val end = offset + length
    var pos = offset
    var acc = 0L    // unread bits left-aligned; bits below navail are 0
    var navail = 0
    // unknown-count decode grows a local array manually (ArrayBuilder's per-add
    // bookkeeping measured on the hot path). Initial guess 1 value/byte: codes are
    // >= 1 bit so never more than 8x under, and doubling copies stay rare — a
    // small initial cap cost ~25% throughput in copy+zero traffic on long streams
    var outArr: Array[Long] =
      if (limit >= 0) new Array[Long](limit)
      else new Array[Long](math.max(math.min(length.toLong, Int.MaxValue - 8L), 64L).toInt)
    var n = 0
    var running = true
    while (running && (limit < 0 || n < limit)) {
      // refill: only once the window is half drained (m >= 4 bytes), as ONE
      // big-endian bulk load — r7: the previous top-up-every-value byte loop
      // was a top frame of the decode profile, and an 8-byte load is only a
      // win when it appends several bytes. The zero-scan and payload paths
      // refill themselves when they drain the window completely.
      if (navail <= 32) {
        if (end - pos >= 8) {
          val m = (64 - navail) >>> 3 // >= 4
          val mb = m << 3
          acc |= (graft.codec.BytePack.loadLongBE(bytes, pos) >>> (64 - mb)) << (64 - navail - mb)
          navail += mb; pos += m
        } else {
          while (navail <= 56 && pos < end) {
            acc |= (bytes(pos) & 0xffL) << (56 - navail); navail += 8; pos += 1
          }
        }
      }
      if (navail == 0) running = false
      else {
        // zero-scan whole windows at a time (src/golomb.h:527-542); acc == 0 means
        // every available bit is zero (low bits are zero by invariant)
        var zeros = 0L
        var exhausted = false
        while (acc == 0L && !exhausted) {
          zeros += navail
          navail = 0
          if (end - pos >= 8) {
            acc = graft.codec.BytePack.loadLongBE(bytes, pos); navail = 64; pos += 8
          } else {
            while (navail <= 56 && pos < end) {
              acc |= (bytes(pos) & 0xffL) << (56 - navail); navail += 8; pos += 1
            }
          }
          if (navail == 0) exhausted = true
        }
        if (exhausted) running = false // trailing pad zeros -> done
        else {
          val z = java.lang.Long.numberOfLeadingZeros(acc) // < navail (bit is in window)
          zeros += z
          acc = (acc << z) << 1 // consume zeros + terminating 1 (two shifts: z+1 can be 64)
          navail -= z + 1
          val digits = zeros + k
          if (digits > w) {
            // zero_overflow (src/golomb.h:548-554): skip; stream stays aligned
          } else {
            var buf = 0L
            var ok = true
            var d = digits.toInt
            if (d <= navail) { // fast path: whole payload already buffered
              if (d > 0) {
                buf = acc >>> (64 - d)
                acc = (acc << (d - 1)) << 1
                navail -= d
              }
            } else {
              while (d > 0 && ok) {
                if (navail == 0) {
                  if (end - pos >= 8) {
                    acc = graft.codec.BytePack.loadLongBE(bytes, pos); navail = 64; pos += 8
                  } else {
                    while (navail <= 56 && pos < end) {
                      acc |= (bytes(pos) & 0xffL) << (56 - navail); navail += 8; pos += 1
                    }
                  }
                  if (navail == 0) ok = false
                }
                if (ok) {
                  val tb = if (d < navail) d else navail
                  buf = (buf << tb) | (acc >>> (64 - tb))
                  acc = (acc << (tb - 1)) << 1
                  navail -= tb
                  d -= tb
                }
              }
            }
            if (!ok) running = false // done mid-value: value dropped
            else {
              val base = (maskL(zeros.toInt) << k) & widthMask
              val u = (buf + base) & widthMask
              val v = t.toIntegral(u)
              if (n == outArr.length) { // only reachable on the unknown-count path
                // guarded doubling: int-arithmetic `len * 2` overflows negative past
                // Int.MaxValue/2 and threw NegativeArraySizeException at callers
                val grown = math.min(outArr.length.toLong * 2, (Int.MaxValue - 8).toLong).toInt
                if (grown <= outArr.length)
                  // IllegalArgumentException, not IllegalStateException: only a
                  // corrupt/adversarial stream reaches this on the unknown-count
                  // path, and IntBlockCodec.corruptWrapped maps IAE onto the
                  // documented CorruptBlockException (an ISE would escape untyped)
                  throw new IllegalArgumentException(
                    s"decoded value count exceeds max array size (${outArr.length})")
                outArr = java.util.Arrays.copyOf(outArr, grown)
              }
              outArr(n) = v
              n += 1
            }
          }
        }
      }
    }
    if (n == outArr.length) outArr else java.util.Arrays.copyOf(outArr, n)
  }

  /**
   * Adaptive-k encode (reference: util/golomb.cpp:432-462): the value is zigzagged
   * FIRST, pushed at the current k, then `k = k - (k>>a) + (bitWidth(u)>>a)` where
   * `u` is the zigzagged value (util/golomb.cpp:454-458). `a >= w` is invalid
   * (util/golomb.cpp:438-442).
   */
  def adaptiveEncode(values: Array[Long], k0: Int, a: Int, t: PhysicalIntType): Array[Byte] = {
    require(a >= 0 && a < t.width, s"adaptive factor $a out of range for ${t.name}")
    val out = new BitWriter(values.length + 16)
    var k = k0.toLong
    var i = 0
    while (i < values.length) {
      val u = t.toUnsigned(values(i))
      pushUnsigned(out, u, clampK(math.min(k, Int.MaxValue).toInt, t.width), t)
      val bw = 64 - java.lang.Long.numberOfLeadingZeros(u)
      k = k - (k >>> a) + (bw.toLong >>> a)
      i += 1
    }
    out.toByteArray
  }

  /**
   * Adaptive-k decode (reference: util/golomb.cpp:516-544): k is updated from the
   * decoded unsigned value BEFORE un-zigzagging (util/golomb.cpp:537-541).
   */
  def adaptiveDecode(bytes: Array[Byte], k0: Int, a: Int, t: PhysicalIntType): Array[Long] = {
    require(a >= 0 && a < t.width, s"adaptive factor $a out of range for ${t.name}")
    val w = t.width
    val in = new BitReader(bytes)
    val out = new ArrayBuilder.ofLong
    var k = k0.toLong
    while (in.hasData) {
      val kc = clampK(math.min(k, Int.MaxValue).toInt, w)
      val zeros = in.scanZeros()
      if (zeros >= 0) {
        val digits = zeros + kc
        if (digits > w) {
          // zero_overflow: skipped; adaptive k not updated (no successful value)
        } else if (in.readBits(digits.toInt)) {
          val base = (maskL(zeros.toInt) << kc) & t.widthMask
          val u = (in.lastRead + base) & t.widthMask
          val bw = 64 - java.lang.Long.numberOfLeadingZeros(u)
          k = k - (k >>> a) + (bw.toLong >>> a)
          out += t.toIntegral(u)
        }
      }
    }
    out.result()
  }
}
