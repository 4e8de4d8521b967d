package graft.core

import org.scalatest.funsuite.AnyFunSuite
import PhysicalIntType._

/**
 * Ports every golden vector from the reference unit tests
 * (reference: tests/test.cpp:23-335, 14 test functions / 127 assertions).
 *
 * Word-width convention: the reference stores output words byteswapped to big-endian
 * (src/golomb.h:103-108, :76-101), so a test literal word equals the little-endian
 * interpretation of our canonical byte stream grouped per word.
 */
class GolombGoldenSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** Group canonical bytes into little-endian words for comparison with test literals. */
  private def toWords(bs: Array[Byte], wordBytes: Int): Array[Long] = {
    val padded = BitWriter.padToWordBytes(bs, wordBytes)
    padded.grouped(wordBytes).map { g =>
      g.zipWithIndex.map { case (b, i) => (b.toLong & 0xff) << (8 * i) }.sum
    }.toArray
  }

  /** Serialize test literal words to the canonical byte stream (little-endian). */
  private def wordsToBytes(words: Array[Long], wordBytes: Int): Array[Byte] =
    words.flatMap(w => (0 until wordBytes).map(i => ((w >>> (8 * i)) & 0xff).toByte))

  test("encode_all_zeros_k0 (test.cpp:23-46)") {
    val zeros = Array.fill(8)(0L)
    val enc = GolombCodec.encode(zeros, 0, U8)
    assert(enc.toSeq == bytes(0xFF).toSeq)
    assert(GolombCodec.decode(enc, 0, U8).toSeq == zeros.toSeq)
  }

  test("encode_overflow_k0 (test.cpp:48-69)") {
    val ones = Array(0xFFL, 0xFFL)
    val enc = GolombCodec.encode(ones, 0, U8)
    assert(enc.toSeq == bytes(0x00, 0x80, 0x00, 0x40, 0x00).toSeq)
    assert(GolombCodec.decode(enc, 0, U8).toSeq == ones.toSeq)
  }

  test("encode_overflow_k2 (test.cpp:71-91)") {
    val ones = Array(0xFFL, 0xFFL)
    val enc = GolombCodec.encode(ones, 2, U8)
    assert(enc.toSeq == bytes(0x02, 0x06, 0x04, 0x0C).toSeq)
    assert(GolombCodec.decode(enc, 2, U8).toSeq == ones.toSeq)
  }

  test("encode_narrow_to_wide_k0: u8 values into u32 words (test.cpp:93-125)") {
    val values = Array.tabulate(12)(i => if (i % 2 == 0) 0L else 0xFFL)
    val enc = GolombCodec.encode(values, 0, U8)
    assert(toWords(enc, 4).toSeq == Seq(0x10204080L, 0x01020408L, 0x20408000L, 0x00000010L))
    assert(GolombCodec.decode(enc, 0, U8).toSeq == values.toSeq)
    // engine option for OutputDataT = u32 (src/golomb.h:167): word-padded stream,
    // same bits, decode round-trips across the pad
    val enc32 = GolombCodec.encodeWords(values, 0, U8, 4)
    assert(enc32.length % 4 == 0)
    assert(enc32.toSeq == BitWriter.padToWordBytes(enc, 4).toSeq)
    assert(GolombCodec.decode(enc32, 0, U8).toSeq == values.toSeq)
  }

  test("encode_narrow_to_wide_k4: u8 values into u16 words (test.cpp:127-155)") {
    val values = Array.tabulate(8)(i => if (i % 2 == 0) 0L else 0xFFL)
    val enc = GolombCodec.encode(values, 4, U8)
    assert(toWords(enc, 2).toSeq == Seq(0x4380L, 0x10E0L, 0x04F8L, 0x013EL, 0x000FL))
    assert(GolombCodec.decode(enc, 4, U8).toSeq == values.toSeq)
  }

  test("encode_narrow_to_wide_k1: u8 values into u64 words (test.cpp:157-182)") {
    val values = Array.tabulate(8)(i => if (i % 2 == 0) 0L else 0xFFL)
    val enc = GolombCodec.encode(values, 1, U8)
    assert(toWords(enc, 8).toSeq == Seq(0x0106041810604080L, 0x0000000000000001L))
    assert(GolombCodec.decode(enc, 1, U8).toSeq == values.toSeq)
  }

  test("encode_wide_to_narrow_k0: u32 values into u8 words (test.cpp:184-201)") {
    val values = Array(0x00L, 0xFFFFFFFFL)
    val enc = GolombCodec.encode(values, 0, U32)
    assert(enc.toSeq == bytes(0x80, 0x00, 0x00, 0x00, 0x40, 0x00, 0x00, 0x00, 0x00).toSeq)
  }

  test("encode_wide_to_narrow_k3: i32 values into u8 words (test.cpp:203-227)") {
    val values = Array(2147483646L, 2147483647L)
    val enc = GolombCodec.encode(values, 3, I32)
    assert(enc.toSeq == bytes(
      0x00, 0x00, 0x00, 0x04, 0x00, 0x00, 0x00, 0x10,
      0x00, 0x00, 0x00, 0x10, 0x00, 0x00, 0x00, 0x60).toSeq)
  }

  test("decode_all_zeros_k0 (test.cpp:229-245)") {
    assert(GolombCodec.decode(bytes(0xFF), 0, U8).toSeq == Seq.fill(8)(0L))
  }

  test("decode_overflow_k0 (test.cpp:247-257)") {
    val dec = GolombCodec.decode(bytes(0x00, 0x80, 0x00, 0x40, 0x00), 0, U8)
    assert(dec.toSeq == Seq(0xFFL, 0xFFL))
  }

  test("decode_overflow_k2 (test.cpp:259-269)") {
    val dec = GolombCodec.decode(bytes(0x02, 0x06, 0x04, 0x0C), 2, U8)
    assert(dec.toSeq == Seq(0xFFL, 0xFFL))
  }

  test("decode_narrow_to_wide_k0: u8 words to u32 values (test.cpp:271-281)") {
    val in = bytes(0x80, 0x00, 0x00, 0x00, 0x40, 0x00, 0x00, 0x00, 0x00)
    assert(GolombCodec.decode(in, 0, U32).toSeq == Seq(0x00L, 0xFFFFFFFFL))
  }

  test("decode_wide_to_narrow_k0: u32 words to u8 values (test.cpp:283-293)") {
    val in = wordsToBytes(Array(0x00004080L), 4)
    assert(GolombCodec.decode(in, 0, U8).toSeq == Seq(0x00L, 0xFFL))
  }

  test("readme examples (test.cpp:295-335)") {
    val values = Array(0L, 1L, 2L, 3L, 4L, 255L, 0L, 2L)
    val enc = GolombCodec.encode(values, 0, U8)
    assert(enc.length == 5)
    assert(GolombCodec.decode(enc, 0, U8).toSeq == values.toSeq)

    val data = bytes(0xA6, 0x42, 0x80, 0x40, 0x2C)
    val asI16 = GolombCodec.decode(data, 0, I16)
    val asI32 = GolombCodec.decode(data, 0, I32)
    assert(asI16.length == 8)
    assert(asI32.length == 8)
    assert(asI16.toSeq == asI32.toSeq) // cross-type decode agreement
  }

  test("k >= width clamps to width-1 (src/golomb.h:177-196)") {
    val values = Array(0L, 5L, 200L)
    val at7 = GolombCodec.encode(values, 7, U8)
    val at9 = GolombCodec.encode(values, 9, U8)
    assert(at7.toSeq == at9.toSeq)
    assert(GolombCodec.decode(at9, 9, U8).toSeq == values.toSeq)
  }

  test("u64 extremes round-trip at several k") {
    val values = Array(0L, 1L, -1L /* = 2^64-1 */, Long.MinValue, Long.MaxValue, 42L)
    for (k <- Seq(0, 1, 4, 17, 63)) {
      val enc = GolombCodec.encode(values, k, U64)
      assert(GolombCodec.decode(enc, k, U64).toSeq == values.toSeq, s"k=$k")
    }
  }

  test("i64 extremes round-trip at several k") {
    val values = Array(0L, -1L, 1L, Long.MinValue, Long.MaxValue, -123456789L)
    for (k <- Seq(0, 3, 31, 63)) {
      val enc = GolombCodec.encode(values, k, I64)
      assert(GolombCodec.decode(enc, k, I64).toSeq == values.toSeq, s"k=$k")
    }
  }
}
