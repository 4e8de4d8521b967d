package graft.codec

/**
 * Codec tree for one encoded block. Leaves carry a payload; wrappers transform the
 * value stream and delegate to a child over a (possibly different) integer domain.
 *
 * The family generalizes the reference's single exp-Golomb codec
 * (reference: src/golomb.h) into the standard lightweight-compression set
 * (dictionary, RLE, bit-packing, frame-of-reference, delta), with exp-Golomb kept as
 * the residual integer coder — the design BASELINE.json's north_star mandates.
 */
sealed trait CodecSpec extends Serializable {
  def name: String
}

object CodecSpec {
  /** Raw little-endian fixed-width values. */
  case object Plain extends CodecSpec { val name = "plain" }

  /** Exp-Golomb order-k, bit-identical to the reference at the same (type, k). */
  final case class Eg(k: Int) extends CodecSpec { def name = s"eg(k=$k)" }

  /** Adaptive-k exp-Golomb (reference: util/golomb.cpp:432-462, :516-544). */
  final case class EgAdaptive(k: Int, a: Int) extends CodecSpec { def name = s"eg_adaptive(k=$k,a=$a)" }

  /** Fixed-width bit-packing of the zigzag/unsigned mapping at max bit-width. */
  case object BitPack extends CodecSpec { val name = "bitpack" }

  /** Frame-of-reference: subtract block min, child encodes unsigned residuals. */
  final case class For(child: CodecSpec) extends CodecSpec { def name = s"for(${child.name})" }

  /** Delta: first value + child-coded signed deltas. */
  final case class Delta(child: CodecSpec) extends CodecSpec { def name = s"delta(${child.name})" }

  /** Run-length: run values via `values` child, (runLen-1) via `lens` child. */
  final case class Rle(values: CodecSpec, lens: CodecSpec) extends CodecSpec {
    def name = s"rle(${values.name},${lens.name})"
  }

  /** Dictionary: sorted distinct values via `dict` child, indices via `idx` child. */
  final case class Dict(dict: CodecSpec, idx: CodecSpec) extends CodecSpec {
    def name = s"dict(${dict.name},${idx.name})"
  }

  /** Single repeated value. */
  case object Const extends CodecSpec { val name = "const" }
}
