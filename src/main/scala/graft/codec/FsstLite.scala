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

  private val LongBE = java.lang.invoke.MethodHandles.byteArrayViewVarHandle(
    classOf[Array[Long]], java.nio.ByteOrder.BIG_ENDIAN)

  /** A trained table: symbols(code) = byte sequence. */
  final class Table(val symbols: Array[Array[Byte]]) extends Serializable {
    private[FsstLite] val code1 = Array.fill[Int](256)(-1)
    private[FsstLite] val code2 = Array.fill[Int](65536)(-1)
    // symbol bytes left-aligned into a big-endian long + a length mask, so one
    // XOR+AND compares a whole candidate against 8 loaded input bytes (the
    // byte-at-a-time `matches` loop was a top-3 encode hotspot)
    private[FsstLite] val symPacked: Array[Long] = symbols.map { s =>
      var v = 0L
      var j = 0
      while (j < s.length) { v |= (s(j) & 0xffL) << (56 - 8 * j); j += 1 }
      v
    }
    private[FsstLite] val symMask: Array[Long] =
      symbols.map(s => -1L << (64 - 8 * s.length))
    private[FsstLite] val symLen: Array[Int] = symbols.map(_.length)
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

  /**
   * Train a table on sample strings (bounded byte budget) with the FSST paper's
   * iterative scheme: start from single bytes, then for a few generations greedily
   * encode the sample with the current table, count symbol usage and adjacent-symbol
   * concatenations, and keep the 255 highest-gain candidates (gain = bytes saved =
   * count * (len - 1); singles gain their escape-avoidance). Longer symbols emerge
   * as concatenations of proven shorter ones instead of raw n-gram guesses.
   */
  def train(sample: Iterator[Array[Byte]]): Table = {
    val budget = 32 * 1024
    var used = 0
    val buf = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    while (sample.hasNext && used < budget) {
      val s = sample.next()
      buf += s
      used += s.length
    }
    val byteFreq = new Array[Long](256)
    for (s <- buf) {
      var i = 0
      while (i < s.length) { byteFreq(s(i) & 0xff) += 1; i += 1 }
    }
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val seenSingles = (0 until 256).filter(byteFreq(_) > 0).map(b => Array(b.toByte))
    var table = new Table(seenSingles.take(MaxSymbols).toArray)

    val generations = 4
    for (_ <- 0 until generations) {
      val symCount = new Array[Long](table.symbols.length)
      val pairCount = new java.util.HashMap[String, Long]()
      for (s <- buf) {
        var prev = -1
        var i = 0
        val n = s.length
        while (i < n) {
          // greedy longest match (same dispatch as compress)
          var code = -1
          var len = 1
          if (i + 1 < n) {
            val p = ((s(i) & 0xff) << 8) | (s(i + 1) & 0xff)
            val cands = table.longCands(p)
            if (cands != null && i + 2 < n) {
              var ci = 0
              while (code < 0 && ci < cands.length) {
                val c = cands(ci)
                val sym = table.symbols(c)
                if (i + sym.length <= n && matches(s, i, sym)) { code = c; len = sym.length }
                ci += 1
              }
            }
            if (code < 0 && table.code2(p) >= 0) { code = table.code2(p); len = 2 }
          }
          if (code < 0) { code = table.code1(s(i) & 0xff); len = 1 }
          if (code >= 0) symCount(code) += 1
          if (prev >= 0 && code >= 0) {
            val concatLen = table.symbols(prev).length + len
            if (concatLen <= MaxSymbolLen) {
              pairCount.merge(new String(s, i - table.symbols(prev).length, concatLen, iso), 1L, _ + _)
            }
          }
          prev = code
          i += len
        }
      }
      // candidates: current symbols + adjacent concatenations, scored by bytes saved
      val cand = new java.util.HashMap[String, Long]()
      var c = 0
      while (c < table.symbols.length) {
        val sym = table.symbols(c)
        val gain =
          if (sym.length == 1) byteFreq(sym(0) & 0xff) // escape avoidance: 1B saved/occurrence
          else symCount(c) * (sym.length - 1)
        if (gain > 0) cand.merge(new String(sym, iso), gain, math.max)
        c += 1
      }
      pairCount.forEach { (g, f) =>
        val gain = f * (g.length - 1)
        if (gain > 8) cand.merge(g, gain, math.max)
      }
      // top 255 by gain (deterministic tiebreak on the bytes)
      val heap = new java.util.PriorityQueue[(String, Long)](MaxSymbols + 1,
        (a: (String, Long), b: (String, Long)) => {
          val cc = java.lang.Long.compare(a._2, b._2)
          if (cc != 0) cc else b._1.compareTo(a._1)
        })
      cand.forEach { (g, gain) =>
        heap.offer((g, gain))
        if (heap.size() > MaxSymbols) heap.poll()
      }
      val chosen = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      while (!heap.isEmpty) chosen += heap.poll()
      table = new Table(chosen.sortBy { case (g, gain) => (-gain, g) }
        .map(_._1.getBytes(iso)).toArray)
    }
    table
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
    val symPacked = table.symPacked
    val symMask = table.symMask
    val symLen = table.symLen
    val n = s.length
    // worst case 2 bytes out per byte in (all escapes): reserve once, write with
    // a local cursor — the per-byte ensure() was measurable in the hot loop
    var o = out.reserve(2 * n)
    val ob = out.rawBuffer
    var i = 0
    while (i < n) {
      val b0 = s(i) & 0xff
      var emitted = false
      if (i + 1 < n) {
        val p = (b0 << 8) | (s(i + 1) & 0xff)
        val cands = longCands(p)
        if (cands != null && i + 2 < n) {
          if (i + 8 <= n) {
            // fast path: one 8-byte load, one XOR+AND per candidate
            val sl = LongBE.get(s, i).asInstanceOf[Long]
            var ci = 0
            while (!emitted && ci < cands.length) {
              val c = cands(ci)
              if (((sl ^ symPacked(c)) & symMask(c)) == 0L) {
                ob(o) = c.toByte; o += 1
                i += symLen(c)
                emitted = true
              }
              ci += 1
            }
          } else {
            var ci = 0
            while (!emitted && ci < cands.length) {
              val c = cands(ci)
              val sym = symbols(c)
              if (i + sym.length <= n && matches(s, i, sym)) {
                ob(o) = c.toByte; o += 1
                i += sym.length
                emitted = true
              }
              ci += 1
            }
          }
        }
        if (!emitted) {
          val c2 = code2(p)
          if (c2 >= 0) {
            ob(o) = c2.toByte; o += 1
            i += 2
            emitted = true
          }
        }
      }
      if (!emitted) {
        val c1 = code1(b0)
        if (c1 >= 0) { ob(o) = c1.toByte; o += 1 }
        else { ob(o) = Escape.toByte; ob(o + 1) = b0.toByte; o += 2 }
        i += 1
      }
    }
    out.advanceTo(o)
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
