package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GolombCodec, PhysicalIntType}
import graft.core.PhysicalIntType._
import CodecSpec._

class CodecFamilySpec extends AnyFunSuite {

  private val intTypes = Seq(I8, U8, I16, U16, I32, U32, I64, U64)

  private def inRange(t: PhysicalIntType, raw: Long): Long =
    if (t.signed) t.extend(raw) else raw & t.widthMask

  private val specs: Seq[CodecSpec] = Seq(
    Plain, Eg(0), Eg(3), EgAdaptive(2, 2), BitPack,
    For(Eg(1)), For(BitPack), Delta(Eg(0)), Delta(BitPack),
    Rle(For(Eg(0)), Eg(0)), Dict(Delta(Eg(0)), BitPack))

  test("every codec round-trips random data for every type") {
    val rnd = new scala.util.Random(42)
    for (t <- intTypes; spec <- specs) {
      val values = Array.tabulate(500) { i =>
        inRange(t, rnd.nextInt(4) match {
          case 0 => rnd.nextLong()
          case 1 => rnd.nextInt(100).toLong
          case 2 => i.toLong * 3 // sorted-ish segment
          case _ => 7L           // repeats
        })
      }
      val block = IntBlockCodec.encodeAs(values, t, spec)
      val decoded = IntBlockCodec.decode(block)
      assert(decoded.toSeq == values.toSeq, s"type=${t.name} spec=${spec.name}")
      assert(IntBlockCodec.numValues(block) == values.length)
      assert(IntBlockCodec.physicalType(block) == t)
    }
  }

  test("extreme values round-trip through every codec") {
    for (t <- intTypes; spec <- specs) {
      val values = Array(0L, 1L, inRange(t, -1L), inRange(t, Long.MinValue),
        inRange(t, Long.MaxValue), 42L, 42L, 42L, 0L)
      val block = IntBlockCodec.encodeAs(values, t, spec)
      assert(IntBlockCodec.decode(block).toSeq == values.toSeq, s"type=${t.name} spec=${spec.name}")
    }
  }

  test("empty and single-value blocks round-trip") {
    for (t <- Seq(I64, U64, I32); spec <- specs) {
      for (values <- Seq(Array.empty[Long], Array(inRange(t, -5L)))) {
        val block = IntBlockCodec.encodeAs(values, t, spec)
        assert(IntBlockCodec.decode(block).toSeq == values.toSeq, s"type=${t.name} spec=${spec.name} n=${values.length}")
      }
    }
  }

  test("property: auto-chosen codec round-trips over 200 random distributions") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 200) {
      val n = rnd.nextInt(301)
      val mode = rnd.nextInt(5)
      val raw = Array.fill(n)(mode match {
        case 0 => rnd.nextLong()
        case 1 => rnd.nextLong(101) - 50
        case 2 => 1L + rnd.nextInt(3)
        case 3 => 1000000L + rnd.nextInt(101)
        case 4 => 99L
      })
      for (t <- Seq(I64, I32, U16, U64)) {
        val values = raw.map(inRange(t, _))
        val block = IntBlockCodec.encode(values, t)
        assert(IntBlockCodec.decode(block).toSeq == values.toSeq,
          s"trial=$trial type=${t.name} codec=${IntBlockCodec.info(block).codecName}")
      }
    }
  }

  test("eg leaf payload is byte-identical to the bare reference stream") {
    val rnd = new scala.util.Random(7)
    val values = Array.fill(1000)(inRange(I32, rnd.nextInt(10000).toLong - 5000))
    val block = IntBlockCodec.encodeAs(values, I32, Eg(2))
    val bare = GolombCodec.encode(values, 2, I32)
    // header: magic(2) type(1) n(4) id(1) k(1) size(4) = 13 bytes, then the raw stream
    assert(block.length == 13 + bare.length)
    assert(block.drop(13).toSeq == bare.toSeq)
  }

  test("chooser picks sensible codecs and never loses to plain by much") {
    val n = 4096
    val constant = Array.fill(n)(7L)
    val lowCard = Array.tabulate(n)(i => (i % 5).toLong * 1000)
    val sortedTs = Array.tabulate(n)(i => 1700000000000000L + i * 1000L + (i % 7))
    val smallNoise = Array.tabulate(n)(i => ((i * 2654435761L) % 100) - 50)
    val randomWide = { val r = new scala.util.Random(1); Array.fill(n)(r.nextLong()) }
    val runs = Array.tabulate(n)(i => (i / 100).toLong)

    def check(values: Array[Long], label: String): String = {
      val block = IntBlockCodec.encode(values, I64)
      assert(IntBlockCodec.decode(block).toSeq == values.toSeq, label)
      val plain = values.length * 8 + 32
      assert(block.length <= plain * 1.05 + 64, s"$label blew past plain: ${block.length} vs $plain")
      IntBlockCodec.info(block).codecName
    }

    assert(check(constant, "constant") == "const")
    val lc = check(lowCard, "lowCard"); assert(lc.startsWith("dict") || lc.startsWith("rle"), lc)
    val st = check(sortedTs, "sortedTs"); assert(st.startsWith("delta"), st)
    check(smallNoise, "smallNoise")
    check(randomWide, "randomWide")
    val rn = check(runs, "runs"); assert(rn.startsWith("rle") || rn.startsWith("delta"), rn)

    // compression actually happens where it should
    assert(IntBlockCodec.encode(constant, I64).length < 64)
    assert(IntBlockCodec.encode(sortedTs, I64).length < n * 8 / 4, "sorted timestamps should compress >4x")
    assert(IntBlockCodec.encode(lowCard, I64).length < n * 8 / 8, "low-cardinality should compress >8x")
  }

  test("chooser auto-picks adaptive exp-Golomb for drifting magnitudes") {
    // magnitude drifts in ~512-value plateaus with mixed signs: a histogram-priced
    // fixed k pays for the whole width range and deltas span two magnitudes,
    // while the adaptive k tracks each plateau
    val drift = Array.tabulate(16384) { i =>
      val mag = ((i * 7919 % 4096) + 4096).toLong << ((i / 512) % 20)
      if (i % 2 == 0) mag else -mag
    }
    val spec = CodecChooser.choose(drift, I64)
    assert(spec.isInstanceOf[EgAdaptive], s"expected adaptive, chose ${spec.name}")
    // the simulated cost is exact: payload bytes match the simulation closely
    val stats = ColumnStats.collect(drift, I64)
    val enc = IntBlockCodec.encode(drift, I64)
    assert(IntBlockCodec.info(enc).codecName.startsWith("eg_adaptive"))
    assert(IntBlockCodec.decode(enc).toSeq == drift.toSeq)
    assert(math.abs(stats.adaptiveBits / 8 - enc.length) <= enc.length / 20 + 64,
      s"simulated ${stats.adaptiveBits / 8}B vs actual ${enc.length}B")
    // stable-width data must NOT flip to adaptive (fixed k is strictly cheaper)
    val flat = Array.tabulate(8192)(i => 4096L + (i * 2654435761L & 4095L))
    assert(!CodecChooser.choose(flat, I64).isInstanceOf[EgAdaptive])
  }

  test("string codecs round-trip") {
    val rnd = new scala.util.Random(3)
    val langs = Array.tabulate(2000)(i => Seq("en", "de", "fr", "zh", "es")(rnd.nextInt(5)))
    val texts = Array.tabulate(300)(i =>
      s"the quick brown fox jumps over the lazy dog $i " * (1 + rnd.nextInt(5)))
    val urls = Array.tabulate(500)(i => s"https://host-${i % 37}.example.com/path/$i?q=${rnd.nextInt(100)}")

    for ((vs, label) <- Seq((langs, "langs"), (texts, "texts"), (urls, "urls"))) {
      val block = StringBlockCodec.encodeStrings(vs)
      assert(StringBlockCodec.decodeStrings(block).toSeq == vs.toSeq, label)
    }
    // low-cardinality strings pick dict; long repetitive text picks fsst and compresses
    assert(StringBlockCodec.codecName(StringBlockCodec.encodeStrings(langs)) == "str_dict")
    val tb = StringBlockCodec.encodeStrings(texts)
    assert(StringBlockCodec.codecName(tb) == "str_fsst")
    val rawBytes = texts.map(_.length).sum
    assert(tb.length < rawBytes / 2, s"fsst should halve repetitive text: ${tb.length} vs $rawBytes")
    // unicode + empty + null handling
    val tricky = Array("", "héllo wörld ünïcode", "日本語テキスト", "a", "")
    assert(StringBlockCodec.decodeStrings(StringBlockCodec.encodeStrings(tricky)).toSeq == tricky.toSeq)
  }

  test("property: string plain/dict/fsst all round-trip arbitrary bytes") {
    val rnd = new scala.util.Random(99L)
    for (trial <- 0 until 100; codecId <- 0 to 2) {
      val arr = Array.fill(rnd.nextInt(80)) {
        val bs = new Array[Byte](rnd.nextInt(120))
        rnd.nextBytes(bs)
        bs
      }
      val block = StringBlockCodec.encodeAs(arr, codecId)
      assert(StringBlockCodec.decode(block).map(_.toSeq).toSeq == arr.map(_.toSeq).toSeq,
        s"trial=$trial codec=$codecId")
    }
  }

  test("nullable int blocks: validity bitmap round-trips, all-valid stays byte-identical") {
    val rnd = new scala.util.Random(7)
    for (t <- intTypes) {
      val n = 300 + rnd.nextInt(200)
      val values = Array.tabulate(n)(i => inRange(t, rnd.nextLong()))
      val valid = Array.tabulate(n)(i => i % 7 != 0 && rnd.nextInt(5) != 0)
      val block = IntBlockCodec.encodeNullable(values, valid, t)
      val (dv, dok) = IntBlockCodec.decodeNullable(block)
      assert(dok.toSeq == valid.toSeq, s"type=${t.name}")
      for (i <- 0 until n if valid(i)) assert(dv(i) == values(i), s"type=${t.name} i=$i")
      // decode() refuses nullable blocks rather than conflating null with 0
      intercept[IllegalArgumentException] { IntBlockCodec.decode(block) }

      // all-valid input must produce the exact null-free bytes (format stability)
      val allValid = IntBlockCodec.encodeNullable(values, Array.fill(n)(true), t)
      assert(allValid.toSeq == IntBlockCodec.encode(values, t).toSeq)
      // edge: every value null
      val (ev, eok) = IntBlockCodec.decodeNullable(
        IntBlockCodec.encodeNullable(values, Array.fill(n)(false), t))
      assert(eok.forall(!_) && ev.length == n)
    }
  }

  test("nullable string blocks: null is preserved and distinct from empty string") {
    val values = Array[String]("a", null, "", "bb", null, "a", "", null)
    val decoded = StringBlockCodec.decodeStrings(StringBlockCodec.encodeStrings(values))
    assert(decoded.toSeq == values.toSeq)
    // all-valid input unchanged vs null-free format
    val dense = Array("x", "", "yy")
    assert(StringBlockCodec.encodeStrings(dense).toSeq ==
      StringBlockCodec.encode(dense.map(_.getBytes("UTF-8"))).toSeq)
    // large mixed block exercises dict/fsst paths under the validity wrapper
    val rnd = new scala.util.Random(11)
    val big = Array.tabulate(5000)(i =>
      if (i % 13 == 0) null else s"lang-${i % 5}")
    val bigDec = StringBlockCodec.decodeStrings(StringBlockCodec.encodeStrings(big))
    assert(bigDec.toSeq == big.toSeq)
    assert(StringBlockCodec.codecName(StringBlockCodec.encodeStrings(big)) == "str_dict")
  }

  test("bit-flip/truncation fuzz: corrupt blocks throw cleanly, bounded allocation") {
    import graft.core.PhysicalIntType
    val rnd = new scala.util.Random(42)
    val vals = Array.tabulate(5000)(i => (i * 7919L) % 100000)
    val blocks = Seq(
      IntBlockCodec.encode(vals, PhysicalIntType.I64),
      IntBlockCodec.encodeAs(vals, PhysicalIntType.I64,
        CodecSpec.Rle(CodecSpec.Eg(2), CodecSpec.Eg(0))),
      StringBlockCodec.encode(Array.tabulate(2000)(i =>
        s"value-$i-${"x" * (i % 32)}".getBytes("UTF-8"))))
    def tryDecode(b: Array[Byte]): Unit =
      try {
        if (b.length > 1 && b(1) == 'S') StringBlockCodec.decode(b)
        else IntBlockCodec.decodeNullable(b)
        ()
      } catch {
        // the ONLY acceptable failure: a typed corruption error (no raw index
        // errors, no negative-size errors, and — by the size bounds — no
        // multi-GB allocations from forged length fields)
        case _: IntBlockCodec.CorruptBlockException => ()
      }
    for (b <- blocks) {
      for (_ <- 0 until 400) { // random bit flips
        val c = b.clone()
        for (_ <- 0 to rnd.nextInt(3)) {
          val p = rnd.nextInt(c.length)
          c(p) = (c(p) ^ (1 << rnd.nextInt(8))).toByte
        }
        tryDecode(c)
      }
      for (_ <- 0 until 100) // random truncations
        tryDecode(java.util.Arrays.copyOf(b, rnd.nextInt(b.length)))
    }
  }

  test("fsst handles 8-byte symbols without key collisions (regression)") {
    // urls with long shared prefixes train 8-byte symbols; a length tag packed into
    // the top bits of the 64-bit key made distinct 8-byte symbols collide
    val urls = Array.tabulate(5000)(i => s"https://host-${i % 97}.example.com/p/${java.lang.Long.toHexString(i * 2654435761L)}/$i")
    val block = StringBlockCodec.encodeAs(urls.map(_.getBytes("UTF-8")), 2)
    val decoded = StringBlockCodec.decode(block).map(new String(_, "UTF-8"))
    assert(decoded.toSeq == urls.toSeq)
  }

  test("fsst training terminates on one huge high-entropy value (regression)") {
    // a single multi-hundred-KB value used to be ingested whole (the 32KB budget
    // was checked before adding), and its distinct <=8-byte pair candidates could
    // fill the fixed-capacity candidate counter — whose linear probe then looped
    // forever on any new key. Training must now (a) truncate the sample to the
    // budget and (b) stop inserting at capacity instead of hanging.
    var x = 0x243F6A8885A308D3L
    val huge = Array.fill[Byte](512 * 1024) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 56).toByte
    }
    val table = FsstLite.train(Iterator(huge))
    // the trained table still round-trips arbitrary data (including the huge value)
    val out = new ByteWriter(huge.length * 2)
    FsstLite.compress(table, huge, out)
    val enc = out.toByteArray
    assert(FsstLite.decompress(table, enc, 0, enc.length).toSeq == huge.toSeq)
    // and the whole block path stays safe when such a value leads the block
    val values = huge +: Array.tabulate(50)(i => s"regular text value $i".getBytes("UTF-8"))
    val block = StringBlockCodec.encode(values)
    assert(StringBlockCodec.decode(block).map(_.toSeq).toSeq == values.map(_.toSeq).toSeq)
  }

  test("corrupt inputs throw TYPED errors: short decode, forged tables, dangling escape") {
    import graft.codec.IntBlockCodec.CorruptBlockException
    // header-intact SHORT decode: bump the count field (i32 at bytes 3..6) past
    // the payload's values — must throw, not silently truncate (callers zip
    // decoded columns by the header count)
    val good = IntBlockCodec.encodeAs(Array.tabulate(100)(_.toLong), I64, Eg(2))
    val forged = good.clone(); forged(6) = 200.toByte
    intercept[CorruptBlockException](IntBlockCodec.decode(forged))
    // metadata entry points map raw index errors onto the typed error too
    intercept[CorruptBlockException](IntBlockCodec.info(Array.emptyByteArray))
    intercept[CorruptBlockException](IntBlockCodec.numValues(Array[Byte](1)))
    intercept[CorruptBlockException](StringBlockCodec.codecName(Array[Byte]('G'.toByte)))
    // adaptive k outside the header byte range clamps BEFORE encoding, so the
    // header matches the encoder's state and the round trip stays exact
    val vs = Array.tabulate(1000)(i => (i * 37 - 500).toLong)
    val ad = IntBlockCodec.encodeAs(vs, I64, EgAdaptive(300, 2))
    assert(IntBlockCodec.decode(ad).toSeq == vs.toSeq)
    // forged FSST table symbol length breaks the packed-symbol invariant -> throw
    intercept[IllegalArgumentException](
      FsstLite.deserializeTable(new ByteCursor(Array(1.toByte, 200.toByte))))
    // dangling escape as the last payload byte would read the NEXT string's bytes
    val t = FsstLite.train(Iterator("hello world hello world".getBytes("UTF-8")))
    intercept[IllegalArgumentException](FsstLite.decompress(t, Array(0xFF.toByte), 0, 1))
  }

  test("fsst decompress: multi-MB value takes the exact-size path and round-trips") {
    // a highly-compressible multi-MB string: compressed length crosses the
    // exact-size threshold, where the scratch must be sized by a counting
    // pre-pass (the 8x ceiling would be ~8x the compressed size)
    val bigText = ("the quick brown fox jumps over the lazy dog " * 60000).getBytes("UTF-8")
    val table = FsstLite.train(Iterator(bigText))
    val w = new ByteWriter(bigText.length)
    FsstLite.compress(table, bigText, w)
    val enc = w.toByteArray
    assert(enc.length > 64 * 1024, s"need a large compressed payload, got ${enc.length}")
    val back = FsstLite.decompress(table, enc, 0, enc.length)
    assert(java.util.Arrays.equals(back, bigText))
  }

  test("inflated header count cannot yield a silent zero/stale tail (RLE/bitpack/dict)") {
    import graft.core.PhysicalIntType
    // header layout: 'G','1' | typeId u8 | n i32 — patch n from 100 to 150; the
    // payload only covers 100 values, so decode MUST throw, never return 150
    // values whose tail is zero-filled (RLE underrun), stale-repeated
    // (bitpack short read), or aliased (dict)
    def patchN(block: Array[Byte], n: Int): Array[Byte] = {
      val c = block.clone()
      c(3) = (n & 0xff).toByte; c(4) = ((n >> 8) & 0xff).toByte
      c(5) = ((n >> 16) & 0xff).toByte; c(6) = ((n >> 24) & 0xff).toByte
      c
    }
    val vals = Array.tabulate(100)(i => (i / 10).toLong) // runs of 10, card 10
    val specs = Seq(
      CodecSpec.Rle(CodecSpec.Eg(2), CodecSpec.Eg(0)),
      CodecSpec.BitPack,
      CodecSpec.Dict(CodecSpec.Eg(1), CodecSpec.BitPack))
    for (spec <- specs) {
      val enc = IntBlockCodec.encodeAs(vals, PhysicalIntType.I64, spec)
      // sanity: the unpatched block decodes exactly
      assert(IntBlockCodec.decode(enc).toSeq == vals.toSeq)
      intercept[IntBlockCodec.CorruptBlockException] {
        IntBlockCodec.decode(patchN(enc, 150))
      }
    }
  }
}
