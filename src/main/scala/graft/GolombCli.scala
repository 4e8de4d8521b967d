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
 * (util/golomb.cpp:327-329, :602-605). Option parsing reproduces
 * util/golomb.cpp's `options` reader (:57-106): options may be bundled
 * (`-ei16`), an option with no attached value consumes the NEXT argv element
 * as its argument (`-k 4`), `-` is an operand (stdin/stdout), `--` ends the
 * option list, and unrecognized options are an error. Used for head-to-head
 * byte-equality checks against the reference binary; the distributed path
 * lives in the Spark jobs.
 */
object GolombCli {

  final class CliArgumentException(msg: String) extends IllegalArgumentException(msg)

  /** Faithful port of the reference options reader (util/golomb.cpp:57-106). */
  private final class Options(args: Array[String]) {
    private var index = 0
    private var tok: String = null
    private var pos = 0

    /** Next option char, or '\u0000' at end of options (operands may remain). */
    def readOption(): Char = {
      if (index < args.length && (tok == null || pos >= tok.length)) {
        tok = args(index); index += 1; pos = 0
        // operand (incl. the empty string, whose first byte the reference reads
        // as the terminator, util/golomb.cpp:71-75) or bare "-"
        if (tok.isEmpty || tok.charAt(0) != '-' || tok.length == 1) return '\u0000'
        pos = 1
        if (tok.charAt(1) == '-') { pos = 2; return '\u0000' } // "--" end marker
      }
      if (tok != null && pos < tok.length) { val c = tok.charAt(pos); pos += 1; c }
      else '\u0000'
    }

    /** Rest of the current token if non-empty, else the next argv element ("" at end). */
    def readArgument(): String = {
      var arg = if (tok == null) null else tok.substring(pos)
      if (index < args.length && (arg == null || arg.isEmpty)) { arg = args(index); index += 1 }
      tok = null; pos = 0
      if (arg == null) "" else arg
    }
  }

  /** FORMAT arg: [iu](8|16|32|64); empty selects the u8 default. Faithful to
    * util/golomb.cpp:365-400: the sign char is tolower'd (so 'I16' works), the
    * width goes through from_chars (so 'i08' works), and — a reference quirk
    * kept for contract fidelity — from_chars OVERFLOW is not checked (only the
    * end pointer is), so an absurdly long digit string leaves the width at its
    * initial 8 and parses as [iu]8. */
  private def parseFormat(option: Char, fmt: String): PhysicalIntType = {
    if (fmt.isEmpty) return PhysicalIntType.U8
    val sign = Character.toLowerCase(fmt.charAt(0))
    val ws = fmt.substring(1)
    val width: Int =
      if (ws.isEmpty || !ws.forall(c => c >= '0' && c <= '9')) -1
      else try ws.toInt catch { case _: NumberFormatException => 8 } // overflow quirk
    if (!(sign == 'i' || sign == 'u') || !(width == 8 || width == 16 || width == 32 || width == 64))
      throw new CliArgumentException(s"Invalid argument for option '$option'.")
    PhysicalIntType.fromName(s"$sign$width")
  }

  /** size_t k (util/golomb.cpp:417-430): digits only; overflow past 2^64 leaves
    * k at 0 (same end-pointer-only check). Any k >= width-1 clamps identically
    * in the codec, so values above Int.MaxValue saturate there. */
  private def parseK(s: String): Int = {
    if (s.isEmpty || !s.forall(c => c >= '0' && c <= '9'))
      throw new CliArgumentException("Invalid argument for option 'k'.")
    val v = try java.lang.Long.parseUnsignedLong(s) catch {
      case _: NumberFormatException => 0L // overflow quirk
    }
    if (java.lang.Long.compareUnsigned(v, Int.MaxValue) > 0) Int.MaxValue else v.toInt
  }

  /** int a (util/golomb.cpp:401-415): signed digits; negative rejected AFTER
    * parse, int overflow leaves a at 0 (accepted — same quirk). */
  private def parseA(s: String): Int = {
    val digits = if (s.startsWith("-")) s.substring(1) else s
    if (digits.isEmpty || !digits.forall(c => c >= '0' && c <= '9'))
      throw new CliArgumentException("Invalid argument for option 'a'.")
    val v = try s.toInt catch { case _: NumberFormatException => 0 } // overflow quirk
    if (v < 0) throw new CliArgumentException("Invalid argument for option 'a'.")
    v
  }

  def main(args: Array[String]): Unit = {
    var encode = true
    var fmt: PhysicalIntType = PhysicalIntType.U8
    var k = 0
    var a = -1
    val opts = new Options(args)
    var opt = opts.readOption()
    while (opt != '\u0000') {
      opt match {
        case 'a' => a = parseA(opts.readArgument())
        case 'e' => encode = true; fmt = parseFormat('e', opts.readArgument())
        case 'd' => encode = false; fmt = parseFormat('d', opts.readArgument())
        case 'k' => k = parseK(opts.readArgument())
        case 'h' => println(usage)
        case other => throw new CliArgumentException(s"Unrecognized option '$other'.")
      }
      opt = opts.readOption()
    }
    val input = opts.readArgument()
    val output = opts.readArgument()
    if (input.isEmpty) throw new CliArgumentException("No input parameter provided.")
    if (output.isEmpty) throw new CliArgumentException("No output parameter provided.")

    val in =
      if (input == "-") System.in.readAllBytes()
      else Files.readAllBytes(Paths.get(input))
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
    if (output == "-") { System.out.write(out); System.out.flush() }
    else Files.write(Paths.get(output), out)
  }

  private val usage: String =
    "usage: golomb-cli [-aN] [-e[FORMAT]|-d[FORMAT]] [-kN] input output\n" +
    "  FORMAT: i8 u8 i16 u16 i32 u32 i64 u64 (default u8); '-' = stdin/stdout"
}
