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

    // default -eu8 -k0 (reference default: util/golomb.cpp:327-329)
    GolombCli.main(Array("-e", "-k0", in.toString, enc.toString))
    GolombCli.main(Array("-d", "-k0", enc.toString, dec.toString))
    assert(Files.readAllBytes(dec).toSeq == data.toSeq)

    // i16 adaptive
    GolombCli.main(Array("-ei16", "-k2", "-a2", in.toString, enc.toString))
    GolombCli.main(Array("-di16", "-k2", "-a2", enc.toString, dec.toString))
    assert(Files.readAllBytes(dec).toSeq == data.toSeq)
  }

  test("truncated/corrupt blocks raise CorruptBlockException, not raw index errors") {
    val block = IntBlockCodec.encode(Array.tabulate(100)(_.toLong * 3), PhysicalIntType.I64)
    intercept[IntBlockCodec.CorruptBlockException] {
      IntBlockCodec.decode(java.util.Arrays.copyOf(block, 15))
    }
    val bad = block.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException] { IntBlockCodec.decode(bad) }
  }
}
