package graft

import java.nio.file.{Files, Paths}
import graft.core.{GolombCodec, LittleEndianIO, PhysicalIntType}

/**
 * CLI mirroring the reference utility's contract
 * (reference: util/golomb.cpp:247-351 help text, :598-678 main):
 *
 *   golomb-cli [-aN] [-e[FORMAT]|-d[FORMAT]] [-kN] input output
 *
 * FORMAT in {i8,u8,i16,u16,i32,u32,i64,u64}; default `-eu8 -k0`
 * (util/golomb.cpp:327-329, :602-605). Used for head-to-head byte-equality checks
 * against the reference binary; the distributed path lives in the Spark jobs.
 */
object GolombCli {
  def main(args: Array[String]): Unit = {
    var encode = true
    var fmt: PhysicalIntType = PhysicalIntType.U8
    var k = 0
    var a = -1
    val files = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      val arg = args(i)
      if (arg.startsWith("-e")) { encode = true;  if (arg.length > 2) fmt = PhysicalIntType.fromName(arg.substring(2)) }
      else if (arg.startsWith("-d")) { encode = false; if (arg.length > 2) fmt = PhysicalIntType.fromName(arg.substring(2)) }
      else if (arg.startsWith("-k")) k = arg.substring(2).toInt
      else if (arg.startsWith("-a")) a = arg.substring(2).toInt
      else files += arg
      i += 1
    }
    require(files.length == 2, "usage: golomb-cli [-aN] [-e[FMT]|-d[FMT]] [-kN] input output")
    val in = Files.readAllBytes(Paths.get(files(0)))
    val out =
      if (encode) {
        val values = LittleEndianIO.read(in, fmt)
        if (a >= 0) GolombCodec.adaptiveEncode(values, k, a, fmt)
        else GolombCodec.encode(values, k, fmt)
      } else {
        val values =
          if (a >= 0) GolombCodec.adaptiveDecode(in, k, a, fmt)
          else GolombCodec.decode(in, k, fmt)
        LittleEndianIO.write(values, fmt)
      }
    Files.write(Paths.get(files(1)), out)
  }
}
