package graft.codec

import graft.core.{BitReader, BitWriter, GolombCodec, LittleEndianIO, PhysicalIntType}
import CodecSpec._

/**
 * Self-describing encoded block for one integer column slice.
 *
 * The reference bitstream carries no framing — type, k and length are caller-supplied
 * out-of-band (reference: README.md:26-31, util/golomb.cpp:310-321). At engine scale
 * blocks must be self-describing, so we add a header:
 *
 *   magic 'G','1' | typeId u8 | nValues i32 | codec tree
 *
 * where a codec-tree node is `codecId u8 | params | body` — leaf bodies are
 * int32-length-prefixed payloads, wrapper bodies are child nodes. The exp-Golomb leaf
 * payload is byte-identical to the reference CLI output for the same (type, k) stream.
 *
 * Nullability: the reference is null-free by design (src/golomb.h:43-57 accepts only
 * integrals), but real Spark columns are nullable. When a block contains nulls the
 * typeId byte carries flag 0x80 and an int32-sized validity bitmap (LSB-first, bit i
 * = value i is non-null) follows `nValues`; the codec tree then encodes ONLY the
 * non-null values. All-valid blocks stay byte-identical to the null-free format.
 */
object IntBlockCodec {

  private val MAGIC0: Byte = 'G'
  private val MAGIC1: Byte = '1'

  private val ID_PLAIN = 0
  private val ID_EG = 1
  private val ID_EG_ADAPTIVE = 2
  private val ID_BITPACK = 3
  private val ID_FOR = 4
  private val ID_DELTA = 5
  private val ID_RLE = 6
  private val ID_DICT = 7
  private val ID_CONST = 8

  /** Unsigned-aware less-than in a type's logical domain (u64 rides raw in Long). */
  @inline private def lt(a: Long, b: Long, t: PhysicalIntType): Boolean =
    if (t.signed || t.width < 64) a < b
    else java.lang.Long.compareUnsigned(a, b) < 0

  @inline private def bitWidth(u: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(u)

  // ---------------------------------------------------------------- encode

  /** Encode with an explicit codec tree. */
  def encodeAs(values: Array[Long], t: PhysicalIntType, spec: CodecSpec): Array[Byte] = {
    val out = new ByteWriter(values.length / 2 + 64)
    out.u8(MAGIC0); out.u8(MAGIC1)
    out.u8(t.id)
    out.i32(values.length)
    encodeNode(out, values, t, spec)
    out.toByteArray
  }

  /** Encode with the stats-driven auto-chooser. */
  def encode(values: Array[Long], t: PhysicalIntType): Array[Byte] =
    encodeAs(values, t, CodecChooser.choose(values, t))

  private[codec] val NullableFlag = 0x80

  private[codec] def packValidity(valid: Array[Boolean]): Array[Byte] = {
    val out = new Array[Byte]((valid.length + 7) / 8)
    var i = 0
    while (i < valid.length) {
      if (valid(i)) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  /**
   * Encode a nullable column slice: `valid(i)` marks non-null positions; the value
   * at a null position is ignored. All-valid input produces the exact null-free
   * block bytes (no flag, no bitmap).
   */
  def encodeNullable(values: Array[Long], valid: Array[Boolean], t: PhysicalIntType): Array[Byte] = {
    require(values.length == valid.length, "values/valid length mismatch")
    var nValid = 0
    var i = 0
    while (i < valid.length) { if (valid(i)) nValid += 1; i += 1 }
    if (nValid == values.length) return encode(values, t)
    val compact = new Array[Long](nValid)
    var j = 0
    i = 0
    while (i < values.length) { if (valid(i)) { compact(j) = values(i); j += 1 }; i += 1 }
    val out = new ByteWriter(compact.length / 2 + 64)
    out.u8(MAGIC0); out.u8(MAGIC1)
    out.u8(t.id | NullableFlag)
    out.i32(values.length)
    out.sized(packValidity(valid))
    encodeNode(out, compact, t, CodecChooser.choose(compact, t))
    out.toByteArray
  }

  /**
   * Decode any block (nullable or not): returns n values (0 at null positions) and
   * the validity mask.
   */
  /** Map the raw failure modes of parsing attacker-controlled bytes onto the
    * typed corrupt-block error (shared by every read-side entry point). */
  private def corruptWrapped[T](block: Array[Byte])(f: => T): T =
    try f catch {
      case e: CorruptBlockException => throw e
      case e: ArrayIndexOutOfBoundsException =>
        throw new CorruptBlockException(s"truncated or corrupt block (${block.length} bytes)", e)
      case e: NegativeArraySizeException =>
        throw new CorruptBlockException(s"corrupt block lengths (${block.length} bytes)", e)
      case e: IllegalArgumentException =>
        throw new CorruptBlockException(s"corrupt block: ${e.getMessage}", e)
    }

  /** A corrupt payload can decode SHORT with intact headers (e.g. a bit flip
    * creating a long zero run the eg decoder treats as end-of-stream); callers
    * zip decoded columns by the header count, so short must throw, not truncate. */
  private def checkCount(decoded: Array[Long], expected: Int): Array[Long] = {
    if (decoded.length != expected)
      throw new CorruptBlockException(
        s"block decoded ${decoded.length} of $expected values", null)
    decoded
  }

  def decodeNullable(block: Array[Byte]): (Array[Long], Array[Boolean]) =
    corruptWrapped(block) {
      val h = readHeader(block)
      val compact = checkCount(decodeNode(h.c, h.nValid, h.t), h.nValid)
      if (h.valid == null) {
        val v = new Array[Boolean](h.n) // not Array.fill: closure-per-element
        java.util.Arrays.fill(v, true)
        (compact, v)
      } else {
        val out = new Array[Long](h.n)
        var j = 0
        var i = 0
        while (i < h.n) { if (h.valid(i)) { out(i) = compact(j); j += 1 }; i += 1 }
        (out, h.valid)
      }
    }

  private def encodeNode(out: ByteWriter, values: Array[Long], t: PhysicalIntType,
                         spec: CodecSpec): Unit = spec match {
    case Plain =>
      out.u8(ID_PLAIN)
      out.sized(LittleEndianIO.write(values, t))

    case Eg(k) =>
      out.u8(ID_EG); out.u8(GolombCodec.clampK(k, t.width))
      out.sized(GolombCodec.encode(values, k, t))

    case EgAdaptive(k, a) =>
      // clamp BEFORE encoding so the header byte matches the encoder's actual
      // starting k (an unclamped k would truncate to k & 0xFF in the header and
      // desync the decoder's adaptive state)
      val kc = GolombCodec.clampK(k, t.width)
      out.u8(ID_EG_ADAPTIVE); out.u8(kc); out.u8(a)
      out.sized(GolombCodec.adaptiveEncode(values, kc, a, t))

    case BitPack =>
      var bits = 0
      var i = 0
      while (i < values.length) {
        val bw = bitWidth(t.toUnsigned(values(i)))
        if (bw > bits) bits = bw
        i += 1
      }
      out.u8(ID_BITPACK); out.u8(bits)
      val bw = new BitWriter(values.length * bits / 8 + 16)
      i = 0
      while (i < values.length) { bw.writeBits(t.toUnsigned(values(i)), bits); i += 1 }
      out.sized(bw.toByteArray)

    case For(child) =>
      var ref = if (values.isEmpty) 0L else values(0)
      var i = 1
      while (i < values.length) { if (lt(values(i), ref, t)) ref = values(i); i += 1 }
      val residuals = new Array[Long](values.length)
      i = 0
      while (i < values.length) { residuals(i) = values(i) - ref; i += 1 } // wraps into u64 domain
      out.u8(ID_FOR); out.i64(ref)
      encodeNode(out, residuals, PhysicalIntType.U64, child)

    case Delta(child) =>
      val first = if (values.isEmpty) 0L else values(0)
      val deltas = new Array[Long](math.max(values.length - 1, 0))
      var i = 1
      while (i < values.length) { deltas(i - 1) = values(i) - values(i - 1); i += 1 }
      out.u8(ID_DELTA); out.i64(first)
      encodeNode(out, deltas, PhysicalIntType.I64, child)

    case Rle(valSpec, lenSpec) =>
      val runValues = new scala.collection.mutable.ArrayBuilder.ofLong
      val runLens = new scala.collection.mutable.ArrayBuilder.ofLong
      var i = 0
      while (i < values.length) {
        val v = values(i)
        var j = i + 1
        while (j < values.length && values(j) == v) j += 1
        runValues += v
        runLens += (j - i - 1).toLong // store runLen-1: common 1-runs cost 1 bit at eg k0
        i = j
      }
      val rv = runValues.result(); val rl = runLens.result()
      out.u8(ID_RLE); out.i32(rv.length)
      encodeNode(out, rv, t, valSpec)
      encodeNode(out, rl, PhysicalIntType.U64, lenSpec)

    case Dict(dictSpec, idxSpec) =>
      val distinct = values.distinct
      val sorted =
        if (t.signed || t.width < 64) distinct.sorted
        else distinct.sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)
      val index = new java.util.HashMap[java.lang.Long, Integer](sorted.length * 2)
      var i = 0
      while (i < sorted.length) { index.put(sorted(i), i); i += 1 }
      val codes = new Array[Long](values.length)
      i = 0
      while (i < values.length) { codes(i) = index.get(values(i)).toLong; i += 1 }
      out.u8(ID_DICT); out.i32(sorted.length)
      encodeNode(out, sorted, t, dictSpec)
      encodeNode(out, codes, PhysicalIntType.U64, idxSpec)

    case Const =>
      out.u8(ID_CONST)
      out.i64(if (values.isEmpty) 0L else values(0))
  }

  // ---------------------------------------------------------------- decode

  final case class BlockInfo(t: PhysicalIntType, n: Int, codecName: String)

  /** Raised for malformed/truncated blocks instead of raw index errors. */
  final class CorruptBlockException(msg: String, cause: Throwable)
      extends IllegalArgumentException(msg, cause)

  def decode(block: Array[Byte]): Array[Long] =
    corruptWrapped(block) {
      val h = readHeader(block)
      require(h.valid == null, "nullable block: use decodeNullable")
      checkCount(decodeNode(h.c, h.nValid, h.t), h.nValid)
    }

  def physicalType(block: Array[Byte]): PhysicalIntType =
    corruptWrapped(block)(readHeader(block).t)
  def numValues(block: Array[Byte]): Int =
    corruptWrapped(block)(readHeader(block).n)

  def info(block: Array[Byte]): BlockInfo = corruptWrapped(block) {
    val h = readHeader(block)
    BlockInfo(h.t, h.n, describeNode(h.c))
  }

  private final case class Header(t: PhysicalIntType, n: Int, nValid: Int,
                                  valid: Array[Boolean], c: ByteCursor)

  /** Upper bound on values per block: legit blocks hold <= 64Ki rows (EncodeJob)
    * or SQL-array sizes; a corrupt header claiming 2^30 values must throw instead
    * of driving an 8 GB allocation. */
  val MaxBlockValues: Int = 1 << 26

  private def readHeader(block: Array[Byte]): Header = {
    val c = new ByteCursor(block)
    require(c.u8() == MAGIC0 && c.u8() == MAGIC1, "bad block magic")
    val tb = c.u8()
    val t = PhysicalIntType.fromId((tb & 0x7f).toByte)
    val n = c.i32()
    if (n < 0 || n > MaxBlockValues)
      throw new CorruptBlockException(s"implausible block value count $n", null)
    if ((tb & NullableFlag) == 0) Header(t, n, n, null, c)
    else {
      val (off, len) = c.sizedSlice()
      require(len >= (n + 7) / 8, "truncated validity bitmap")
      val valid = new Array[Boolean](n)
      var nValid = 0
      var i = 0
      while (i < n) {
        val v = ((c.buf(off + (i >> 3)) >> (i & 7)) & 1) == 1
        valid(i) = v
        if (v) nValid += 1
        i += 1
      }
      Header(t, n, nValid, valid, c)
    }
  }

  private def describeNode(c: ByteCursor): String = c.u8() match {
    case ID_PLAIN => c.sizedSlice(); "plain"
    case ID_EG => val k = c.u8(); c.sizedSlice(); s"eg(k=$k)"
    case ID_EG_ADAPTIVE => val k = c.u8(); val a = c.u8(); c.sizedSlice(); s"eg_adaptive(k=$k,a=$a)"
    case ID_BITPACK => val b = c.u8(); c.sizedSlice(); s"bitpack($b)"
    case ID_FOR => c.i64(); s"for(${describeNode(c)})"
    case ID_DELTA => c.i64(); s"delta(${describeNode(c)})"
    case ID_RLE => c.i32(); val v = describeNode(c); val l = describeNode(c); s"rle($v,$l)"
    case ID_DICT => val card = c.i32(); val d = describeNode(c); val x = describeNode(c); s"dict[$card]($d,$x)"
    case ID_CONST => c.i64(); "const"
    case other => s"unknown($other)"
  }

  private def decodeNode(c: ByteCursor, n: Int, t: PhysicalIntType): Array[Long] = c.u8() match {
    case ID_PLAIN =>
      val (off, len) = c.sizedSlice()
      LittleEndianIO.read(java.util.Arrays.copyOfRange(c.buf, off, off + len), t)

    case ID_EG =>
      val k = c.u8()
      val (off, len) = c.sizedSlice()
      GolombCodec.decodeRange(c.buf, off, len, k, t, n)

    case ID_EG_ADAPTIVE =>
      val k = c.u8(); val a = c.u8()
      val (off, len) = c.sizedSlice()
      GolombCodec.adaptiveDecode(java.util.Arrays.copyOfRange(c.buf, off, off + len), k, a, t)

    case ID_BITPACK =>
      val bits = c.u8()
      // the encoder never writes bits > width; a larger value is corruption
      // that would otherwise mechanically decode garbage without error
      if (bits > t.width)
        throw new CorruptBlockException(s"corrupt bitpack width $bits for ${t.name}", null)
      val (off, len) = c.sizedSlice()
      val br = new BitReader(c.buf, off, len)
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        // a false read means the sized payload ran short of n*bits — stale
        // lastRead values repeated silently would pass checkCount (pre-sized
        // array), the exact 'short must throw, not truncate' hole
        if (!br.readBits(bits))
          throw new CorruptBlockException(s"bitpack payload truncated at value $i of $n", null)
        out(i) = t.toIntegral(br.lastRead)
        i += 1
      }
      out

    case ID_FOR =>
      val ref = c.i64()
      val residuals = decodeNode(c, n, PhysicalIntType.U64)
      var i = 0
      while (i < residuals.length) { residuals(i) = t.extend(ref + residuals(i)); i += 1 }
      residuals

    case ID_DELTA =>
      val first = c.i64()
      val deltas = decodeNode(c, math.max(n - 1, 0), PhysicalIntType.I64)
      val out = new Array[Long](n)
      if (n > 0) out(0) = first
      var i = 1
      while (i < n) { out(i) = t.extend(out(i - 1) + deltas(i - 1)); i += 1 }
      out

    case ID_RLE =>
      val nRuns = c.i32()
      if (nRuns < 0 || nRuns > n)
        throw new CorruptBlockException(s"corrupt RLE run count $nRuns for $n values", null)
      val rv = decodeNode(c, nRuns, t)
      val rl = decodeNode(c, nRuns, PhysicalIntType.U64)
      val out = new Array[Long](n)
      var i = 0; var o = 0
      while (i < nRuns) {
        val v = rv(i)
        var r = rl(i) + 1
        while (r > 0) { out(o) = v; o += 1; r -= 1 }
        i += 1
      }
      // overrun throws via the array bound above; UNDERRUN would leave a
      // silent zero-filled tail that passes checkCount (pre-sized array)
      if (o != n)
        throw new CorruptBlockException(s"RLE runs cover $o of $n values", null)
      out

    case ID_DICT =>
      val card = c.i32()
      if (card < 0 || card > math.max(n, 1))
        throw new CorruptBlockException(s"corrupt dict cardinality $card for $n values", null)
      val dict = decodeNode(c, card, t)
      val codes = decodeNode(c, n, PhysicalIntType.U64)
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val code = codes(i)
        // bound-check the LONG: .toInt aliased corrupt codes >= 2^32 whose low
        // bits landed in [0, card) onto valid dictionary slots silently
        if (code < 0L || code >= card)
          throw new CorruptBlockException(s"corrupt dict code $code (card $card)", null)
        out(i) = dict(code.toInt)
        i += 1
      }
      out

    case ID_CONST =>
      val v = c.i64()
      val out = new Array[Long](n)
      java.util.Arrays.fill(out, v)
      out

    case other =>
      throw new IllegalArgumentException(s"unknown codec id $other")
  }
}
