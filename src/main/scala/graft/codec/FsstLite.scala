package graft.codec

/**
 * Simplified FSST symbol-table string compression (public algorithm: Boncz,
 * Neumann, Leis — "FSST: Fast Random Access String Compression", VLDB 2020).
 *
 * 255 symbols of 1..8 bytes, code 0xFF escapes a literal byte. Strings compress
 * independently (random access preserved). The table is trained greedily on a sample
 * (n-grams scored by freq*(len-1), remaining slots filled with frequent single bytes
 * so escape doubling stays rare).
 *
 * Encode dispatch is array-based, FSST-style: a 256-entry single-byte code table, a
 * 65536-entry two-byte code table, and per-two-byte-prefix candidate lists for longer
 * symbols (checked longest-first) — no hashing or boxing in the hot loop.
 */
object FsstLite {

  val Escape = 0xFF
  val MaxSymbolLen = 8
  private val MaxSymbols = 255

  /** A trained table: symbols(code) = byte sequence. */
  final class Table(val symbols: Array[Array[Byte]]) extends Serializable {
    private[FsstLite] val code1 = Array.fill[Int](256)(-1)
    private[FsstLite] val code2 = Array.fill[Int](65536)(-1)
    // codes of symbols with len >= 3, grouped by their first-2-byte prefix,
    // each group sorted longest-first for greedy longest match
    private[FsstLite] val longCands: Array[Array[Int]] = {
      val groups = new java.util.HashMap[Integer, java.util.ArrayList[Integer]]()
      var c = 0
      while (c < symbols.length) {
        val s = symbols(c)
        s.length match {
          case 1 => code1(s(0) & 0xff) = c
          case 2 => code2(((s(0) & 0xff) << 8) | (s(1) & 0xff)) = c
          case _ =>
            val p = ((s(0) & 0xff) << 8) | (s(1) & 0xff)
            groups.computeIfAbsent(p, _ => new java.util.ArrayList[Integer]()).add(c)
        }
        c += 1
      }
      val arr = new Array[Array[Int]](65536)
      groups.forEach { (p, list) =>
        val codes = new Array[Int](list.size())
        var i = 0
        while (i < codes.length) { codes(i) = list.get(i); i += 1 }
        arr(p) = codes.sortBy(cc => -symbols(cc).length)
      }
      arr
    }

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

  /** Train a table on sample strings (bounded byte budget). */
  def train(sample: Iterator[Array[Byte]]): Table = {
    val budget = 16 * 1024
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
          // longer grams sampled at stride 2 to bound the counting map
          if (len <= 3 || (i & 1) == 0) {
            val key = new String(s, i, len, java.nio.charset.StandardCharsets.ISO_8859_1)
            gramFreq.merge(key, 1, (a, b) => a + b)
          }
          len += 1
        }
        i += 1
      }
    }
    // bounded top-k selection (full sort of the gram map showed up hot in profiles)
    val topK = 160
    val heap = new java.util.PriorityQueue[(String, Long)](topK + 1,
      (a: (String, Long), b: (String, Long)) => {
        val c = java.lang.Long.compare(a._2, b._2)
        if (c != 0) c else b._1.compareTo(a._1)
      })
    gramFreq.forEach { (g, f) =>
      val gain = f.toLong * (g.length - 1)
      if (gain > 16) {
        heap.offer((g, gain))
        if (heap.size() > topK) heap.poll()
      }
    }
    val grams = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    while (!heap.isEmpty) grams += heap.poll()
    val gramBytes = grams.sortBy { case (g, gain) => (-gain, g) }
      .map(_._1.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)).toSeq
    val singles = (0 until 256)
      .filter(b => byteFreq(b) > 0)
      .sortBy(b => (-byteFreq(b), b))
      .take(MaxSymbols - gramBytes.length)
      .map(b => Array(b.toByte))
    new Table((gramBytes ++ singles).take(MaxSymbols).toArray)
  }

  @inline private def matches(s: Array[Byte], i: Int, sym: Array[Byte]): Boolean = {
    // first two bytes already matched via the prefix index
    var j = 2
    while (j < sym.length) {
      if (s(i + j) != sym(j)) return false
      j += 1
    }
    true
  }

  /** Compress one string with longest-match against the table. */
  def compress(table: Table, s: Array[Byte], out: ByteWriter): Unit = {
    val symbols = table.symbols
    val code1 = table.code1
    val code2 = table.code2
    val longCands = table.longCands
    val n = s.length
    var i = 0
    while (i < n) {
      val b0 = s(i) & 0xff
      var emitted = false
      if (i + 1 < n) {
        val p = (b0 << 8) | (s(i + 1) & 0xff)
        val cands = longCands(p)
        if (cands != null && i + 2 < n) {
          var ci = 0
          while (!emitted && ci < cands.length) {
            val c = cands(ci)
            val sym = symbols(c)
            if (i + sym.length <= n && matches(s, i, sym)) {
              out.u8(c)
              i += sym.length
              emitted = true
            }
            ci += 1
          }
        }
        if (!emitted && code2(p) >= 0) {
          out.u8(code2(p))
          i += 2
          emitted = true
        }
      }
      if (!emitted) {
        val c1 = code1(b0)
        if (c1 >= 0) out.u8(c1)
        else { out.u8(Escape); out.u8(b0) }
        i += 1
      }
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
    }
    out.toByteArray
  }
}
