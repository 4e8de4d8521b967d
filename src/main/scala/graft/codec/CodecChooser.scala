package graft.codec

import graft.core.{GolombCodec, PhysicalIntType}
import CodecSpec._

/**
 * Per-block column statistics driving codec auto-selection.
 *
 * One pass over the block computes min/max, run count, bounded exact cardinality, and
 * three bit-width histograms (zigzag domain, FoR-residual domain, delta domain). The
 * chooser estimates the encoded size of each candidate codec tree from these and picks
 * the argmin — the "per-partition codec auto-selection driven by sampled
 * cardinality/run-length/entropy statistics" of BASELINE.json's north_star. Exp-Golomb
 * cost uses the reference's length formula `2*bitWidth(u+2^k)-k-1`
 * (reference: src/golomb.h:228-236).
 */
final case class ColumnStats(
    n: Int,
    min: Long,
    max: Long,
    runs: Int,
    /** exact cardinality up to [[ColumnStats.CardCap]], else CardCap+1 */
    cardinality: Int,
    /** hist(b) = #values whose zigzag/unsigned mapping has bit-width b, b in 0..64 */
    zigzagHist: Array[Long],
    /** same for (v - min) residuals (unsigned domain) */
    residualHist: Array[Long],
    /** same for zigzag(v_i - v_{i-1}), n-1 entries */
    deltaHist: Array[Long],
    /** exact payload bits of EgAdaptive(adaptiveK0, AdaptiveA) on this sequence —
      * simulated in the same pass (histograms can't price an order-dependent
      * codec: adaptive wins exactly when bit-widths DRIFT, which a histogram
      * erases). The reference's -a mode (util/golomb.cpp:432-462) thereby
      * becomes auto-choosable, not just explicitly reachable. */
    adaptiveBits: Long,
    /** starting k for the simulated adaptive run: bit-width of the first value */
    adaptiveK0: Int)

object ColumnStats {
  val CardCap = 4096

  /** Adaptation shift used when auto-choosing EgAdaptive (the reference CLI's
    * default-strength smoothing; k converges within ~2^a values). */
  val AdaptiveA = 2

  @inline private def bitWidth(u: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(u)

  def collect(values: Array[Long], t: PhysicalIntType): ColumnStats = {
    val n = values.length
    if (n == 0) return ColumnStats(0, 0L, 0L, 0, 0, new Array[Long](65), new Array[Long](65), new Array[Long](65), 0L, 0)
    val unsignedOrder = !t.signed && t.width == 64
    val w = t.width
    var min = values(0); var max = values(0)
    var runs = 1
    val seen = new java.util.HashSet[java.lang.Long](math.min(n, CardCap) * 2)
    var card = 0
    var i = 0
    val zz = new Array[Long](65)
    val dz = new Array[Long](65)
    // exact adaptive-k cost simulation, mirroring GolombCodec.adaptiveEncode:
    // per-value cost of pushUnsigned at the clamped running k, then
    // k = k - (k>>a) + (bitWidth(u)>>a) on the pre-encode unsigned mapping
    val adK0 = GolombCodec.clampK(bitWidth(t.toUnsigned(values(0))), w)
    var adK = adK0.toLong
    var adBits = 0L
    while (i < n) {
      val v = values(i)
      if (unsignedOrder) {
        if (java.lang.Long.compareUnsigned(v, min) < 0) min = v
        if (java.lang.Long.compareUnsigned(v, max) > 0) max = v
      } else {
        if (v < min) min = v
        if (v > max) max = v
      }
      if (i > 0) {
        if (v != values(i - 1)) runs += 1
        val d = v - values(i - 1)
        dz(bitWidth(((d << 1) ^ (d >> 63)))) += 1
      }
      if (card <= CardCap && seen.add(v)) card += 1
      val u = t.toUnsigned(v)
      val bwU = bitWidth(u)
      zz(bwU) += 1
      val kc = GolombCodec.clampK(math.min(adK, Int.MaxValue).toInt, w)
      val data = (u + (1L << kc)) & t.widthMask
      val overflowed =
        if (w == 64) java.lang.Long.compareUnsigned(data, u) < 0 else data < u
      adBits += (if (overflowed) 2L * w - kc + 1 else 2L * bitWidth(data) - kc - 1)
      adK = adK - (adK >>> AdaptiveA) + (bwU.toLong >>> AdaptiveA)
      i = i + 1
    }
    // residual bit-width histogram needs min — second cheap pass
    val rz = new Array[Long](65)
    i = 0
    while (i < n) { rz(bitWidth(values(i) - min)) += 1; i += 1 }
    ColumnStats(n, min, max, runs, math.min(card, CardCap + 1), zz, rz, dz, adBits, adK0)
  }

  /** Estimated exp-Golomb total bits for a bit-width histogram at order k. */
  def egBitsFromHist(hist: Array[Long], k: Int): Long = {
    var total = 0L
    var b = 0
    while (b <= 64) {
      val c = hist(b)
      if (c > 0) {
        // u with bitWidth b: if b <= k then data=u+2^k has bitWidth k+1 → cost k+1;
        // else data has bitWidth b (or b+1 on carry; ignore the rare +2) → ~2b-k-1
        val cost = if (b <= k) (k + 1).toLong else (2L * b - k - 1)
        total += cost * c
      }
      b += 1
    }
    total
  }

  /** Best k and its estimated bits for a histogram. */
  def bestEg(hist: Array[Long], width: Int): (Int, Long) = {
    var bestK = 0; var bestBits = Long.MaxValue
    var k = 0
    while (k < width) {
      val bits = egBitsFromHist(hist, k)
      if (bits < bestBits) { bestBits = bits; bestK = k }
      k += 1
    }
    (bestK, bestBits)
  }

  @inline def maxBw(hist: Array[Long]): Int = {
    var b = 64
    while (b > 0 && hist(b) == 0) b -= 1
    b
  }
}

object CodecChooser {
  import ColumnStats._

  /** Deterministically pick the estimated-smallest codec tree for a block. */
  def choose(values: Array[Long], t: PhysicalIntType): CodecSpec =
    choose(collect(values, t), t)

  def choose(s: ColumnStats, t: PhysicalIntType): CodecSpec = {
    if (s.n == 0) return Plain
    if (s.cardinality == 1) return Const

    val candidates = scala.collection.mutable.ArrayBuffer[(CodecSpec, Long)]()
    val headerBits = 16L * 8 // approximate per-node framing overhead

    candidates += Plain -> (s.n.toLong * t.width + headerBits)

    val zzBw = maxBw(s.zigzagHist)
    candidates += BitPack -> (s.n.toLong * zzBw + headerBits)

    val resBw = maxBw(s.residualHist)
    candidates += For(BitPack) -> (s.n.toLong * resBw + 64 + 2 * headerBits)

    val (egK, egBits) = bestEg(s.zigzagHist, t.width)
    candidates += Eg(egK) -> (egBits + headerBits)

    // order-dependent candidate: exact simulated cost, not a histogram estimate
    candidates += EgAdaptive(s.adaptiveK0, ColumnStats.AdaptiveA) ->
      (s.adaptiveBits + headerBits)

    val (forEgK, forEgBits) = bestEg(s.residualHist, 64)
    candidates += For(Eg(forEgK)) -> (forEgBits + 64 + 2 * headerBits)

    if (s.n > 1) {
      val (dK, dBits) = bestEg(s.deltaHist, 64)
      candidates += Delta(Eg(dK)) -> (dBits + 64 + 2 * headerBits)
      val dBw = maxBw(s.deltaHist)
      candidates += Delta(BitPack) -> ((s.n - 1).toLong * dBw + 64 + 2 * headerBits)
    }

    if (s.runs.toLong * 3 <= s.n) {
      // value stream ~ FoR+eg over run values, length stream ~ eg(k0) of (len-1)
      val avgLen = s.n.toLong / s.runs
      val lenBits = 2L * (64 - java.lang.Long.numberOfLeadingZeros(avgLen)) + 1
      candidates += Rle(For(Eg(forEgK)), Eg(0)) ->
        (s.runs.toLong * (resBw + lenBits) + 64 + 3 * headerBits)
    }

    if (s.cardinality <= CardCap && s.cardinality.toLong * 4 <= s.n) {
      val idxBits = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(s.cardinality.toLong - 1))
      // sorted dict delta-compresses well; assume ~resBw bits per entry
      candidates += Dict(Delta(Eg(0)), BitPack) ->
        (s.cardinality.toLong * math.max(resBw, 8) + s.n.toLong * idxBits + 3 * headerBits)
    }

    candidates.minBy(c => (c._2, c._1.name))._1
  }
}
