package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.codec.IntBlockCodec
import graft.core.PhysicalIntType

/** CLI surface + corrupt-block robustness. */
class GolombCliSpec extends AnyFunSuite {

  private def tmp(prefix: String): Path = Files.createTempFile(prefix, ".bin")

  test("cli encode/decode round-trips a file at the reference defaults and with flags") {
    val in = tmp("cli-in")
    val data = Array.tabulate(512)(i => (i % 256).toByte)
    Files.write(in, data)
    val enc = tmp("cli-enc"); val dec = tmp("cli-dec")

    // no options at all = the reference default -eu8 -k0 (util/golomb.cpp:327-329)
    GolombCli.main(Array(in.toString, enc.toString))
    GolombCli.main(Array("-du8", "-k0", enc.toString, dec.toString))
    assert(Files.readAllBytes(dec).toSeq == data.toSeq)

    // i16 adaptive, attached option values
    GolombCli.main(Array("-ei16", "-k2", "-a2", in.toString, enc.toString))
    GolombCli.main(Array("-di16", "-k2", "-a2", enc.toString, dec.toString))
    assert(Files.readAllBytes(dec).toSeq == data.toSeq)
  }

  test("cli option grammar matches the reference options reader (util/golomb.cpp:57-106)") {
    val in = tmp("cli-in2")
    Files.write(in, Array.tabulate(64)(_.toByte))
    val enc = tmp("cli-enc2"); val dec = tmp("cli-dec2")

    // detached option values: '-k 2', '-e i32' consume the next argv element
    GolombCli.main(Array("-e", "i32", "-k", "2", in.toString, enc.toString))
    GolombCli.main(Array("-d", "i32", "-k", "2", enc.toString, dec.toString))
    assert(Files.readAllBytes(dec).toSeq == Files.readAllBytes(in).toSeq)

    // '-e -k0 ...' consumes '-k0' as the FORMAT argument -> invalid (reference quirk)
    intercept[GolombCli.CliArgumentException] {
      GolombCli.main(Array("-e", "-k0", in.toString, enc.toString))
    }
    // unrecognized options are an error, not silently treated as filenames
    intercept[GolombCli.CliArgumentException] {
      GolombCli.main(Array("-x", in.toString, enc.toString))
    }
    // invalid format strings are an error
    intercept[GolombCli.CliArgumentException] {
      GolombCli.main(Array("-ei9", in.toString, enc.toString))
    }
    // reference-faithful tolerant forms (util/golomb.cpp:365-430): tolower'd
    // sign char, from_chars leading zeros, and the overflow quirk where an
    // over-long digit string leaves k at its initial value
    GolombCli.main(Array("-eI16", "-k2", in.toString, enc.toString))
    GolombCli.main(Array("-di16", "-k2", enc.toString, dec.toString))
    assert(Files.readAllBytes(dec).toSeq == Files.readAllBytes(in).toSeq)
    GolombCli.main(Array("-ei08", "-k0", in.toString, enc.toString))
    GolombCli.main(Array("-di8", "-k99999999999999999999", enc.toString, dec.toString))
    // k overflow quirk == k 0: decode of the k0 stream must round-trip
    assert(Files.readAllBytes(dec).toSeq == Files.readAllBytes(in).toSeq)
    // missing operands are an error
    intercept[GolombCli.CliArgumentException] { GolombCli.main(Array(in.toString)) }
    // an empty argv element is an operand terminator, not a crash (reference
    // reads its first byte as '\0'); the empty operand itself is skipped by
    // read_argument, so only one real operand remains -> missing-output error
    intercept[GolombCli.CliArgumentException] { GolombCli.main(Array("", in.toString)) }
    // '--' ends the option list; following operands may start with '-'
    val dashed = java.nio.file.Paths.get(enc.getParent.toString, "-dashed.bin")
    GolombCli.main(Array("-k1", "--", in.toString, dashed.toString))
    GolombCli.main(Array("-du8", "-k1", dashed.toString, dec.toString))
    assert(Files.readAllBytes(dec).toSeq == Files.readAllBytes(in).toSeq)
    Files.deleteIfExists(dashed)
  }

  test("truncated/corrupt blocks raise CorruptBlockException, not raw index errors") {
    val block = IntBlockCodec.encode(Array.tabulate(100)(_.toLong * 3), PhysicalIntType.I64)
    intercept[IntBlockCodec.CorruptBlockException] {
      IntBlockCodec.decode(java.util.Arrays.copyOf(block, 15))
    }
    val bad = block.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException] { IntBlockCodec.decode(bad) }

    // string blocks: same typed failure, including under the validity wrapper
    val sb = graft.codec.StringBlockCodec.encodeStrings(Array("aa", null, "bbb", ""))
    intercept[IntBlockCodec.CorruptBlockException] {
      graft.codec.StringBlockCodec.decode(java.util.Arrays.copyOf(sb, 9))
    }
  }
}
