package graft.codec

/**
 * Simplified FSST symbol-table string compression (public algorithm: Boncz,
 * Neumann, Leis — "FSST: Fast Random Access String Compression", VLDB 2020).
 *
 * 255 symbols of 1..8 bytes, code 0xFF escapes a literal byte. Strings compress
 * independently (random access preserved). The table is trained greedily on a sample:
 * n-grams scored by freq*(len-1), remaining slots filled with frequent single bytes
 * so escape doubling stays rare.
 */
object FsstLite {

  val Escape = 0xFF
  val MaxSymbolLen = 8
  private val MaxSymbols = 255

  /** A trained table: symbols(code) = byte sequence. */
  final class Table(val symbols: Array[Array[Byte]]) extends Serializable {
    // lookup maps per length: packed big-endian bytes -> code
    private[FsstLite] val byLen: Array[java.util.HashMap[java.lang.Long, Integer]] = {
      val m = Array.fill(MaxSymbolLen + 1)(new java.util.HashMap[java.lang.Long, Integer]())
      var c = 0
      while (c < symbols.length) {
        val s = symbols(c)
        m(s.length).put(pack(s, 0, s.length), c)
        c += 1
      }
      m
    }
    val maxLen: Int = if (symbols.isEmpty) 0 else symbols.map(_.length).max

    def serialize(out: ByteWriter): Unit = {
      out.u8(symbols.length)
      symbols.foreach { s => out.u8(s.length); out.bytes(s) }
    }
  }

  def deserializeTable(c: ByteCursor): Table = {
    val n = c.u8()
    val syms = Array.tabulate(n) { _ => val len = c.u8(); c.bytes(len) }
    new Table(syms)
  }

  @inline private def pack(bs: Array[Byte], off: Int, len: Int): Long = {
    // keys live in per-length maps, so the raw bytes alone are a unique key;
    // a length tag would corrupt len==8 keys (all 64 bits already used)
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (bs(off + i) & 0xffL); i += 1 }
    v
  }

  /** Train a table on sample strings (uses up to ~64KB of bytes). */
  def train(sample: Iterator[Array[Byte]]): Table = {
    val budget = 64 * 1024
    var used = 0
    val buf = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    while (sample.hasNext && used < budget) {
      val s = sample.next()
      buf += s
      used += s.length
    }
    val gramFreq = new java.util.HashMap[String, Integer]()
    val byteFreq = new Array[Long](256)
    for (s <- buf) {
      var i = 0
      while (i < s.length) {
        byteFreq(s(i) & 0xff) += 1
        var len = 2
        while (len <= MaxSymbolLen && i + len <= s.length) {
          // count only at even strides for longer grams to bound map size
          if (len <= 3 || (i % 2 == 0)) {
            val key = new String(s, i, len, java.nio.charset.StandardCharsets.ISO_8859_1)
            gramFreq.merge(key, 1, (a, b) => a + b)
          }
          len += 1
        }
        i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val grams = gramFreq.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue.toLong * (e.getKey.length - 1)))
      .filter(_._2 > 16) // must beat its own table entry cost
      .sortBy { case (g, gain) => (-gain, g) }
      .take(160)
      .map(_._1.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val singles = (0 until 256)
      .filter(b => byteFreq(b) > 0)
      .sortBy(b => (-byteFreq(b), b))
      .take(MaxSymbols - grams.length)
      .map(b => Array(b.toByte))
    new Table((grams ++ singles).take(MaxSymbols).toArray)
  }

  /** Compress one string with longest-match against the table. */
  def compress(table: Table, s: Array[Byte], out: ByteWriter): Unit = {
    val maxLen = math.max(table.maxLen, 1)
    var i = 0
    while (i < s.length) {
      var len = math.min(maxLen, s.length - i)
      var code = -1
      while (len >= 1 && code < 0) {
        val hit = table.byLen(len).get(pack(s, i, len))
        if (hit != null) code = hit else len -= 1
      }
      if (code >= 0) { out.u8(code); i += len }
      else { out.u8(Escape); out.u8(s(i) & 0xff); i += 1 }
    }
  }

  /** Decompress `compressedLen` bytes at `off` into a fresh array. */
  def decompress(table: Table, buf: Array[Byte], off: Int, compressedLen: Int): Array[Byte] = {
    val out = new ByteWriter(compressedLen * 3)
    var i = off
    val end = off + compressedLen
    while (i < end) {
      val b = buf(i) & 0xff
      if (b == Escape) { out.u8(buf(i + 1) & 0xff); i += 2 }
      else { out.bytes(table.symbols(b)); i += 1 }
      // note: codes >= symbols.length cannot occur in well-formed streams
    }
    out.toByteArray
  }
}
