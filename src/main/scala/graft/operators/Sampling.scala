package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data curation — the quota step of a
 * web-scale pipeline (downsample the over-represented languages/domains,
 * keep the long tail whole) expressed so the SAME row set comes out of every
 * run, every engine, every cluster size:
 *
 *  - the keep/drop decision is a pure function of a caller-chosen KEY column
 *    (document id, url): `hex(md5(key))[0,8) < threshold(rate)`. md5 is
 *    bit-stable across engines (the DuckDB oracle evaluates the identical
 *    expression), so reruns and verification see the same sample — unlike
 *    `rand(seed)`, which is partitioning-dependent in every engine;
 *  - per-stratum rates ride a literal CASE chain — a pure Column expression,
 *    fully codegen'd, ZERO shuffles: at 100 TB this is a narrow filter fused
 *    into whatever scan feeds it, not a sampling job.
 *
 * Semantics: a row keeps iff the first 8 hex chars of `md5(key)` sort below
 * the stratum's threshold — an unbiased Bernoulli(rate) over the md5-uniform
 * key space, independent across strata. A NULL stratum uses `defaultRate`;
 * a NULL key never samples in (md5(NULL) is NULL — document ids should not
 * be null, and silently hashing nulls together would correlate their fate).
 */
object Sampling {

  /** Lexicographic 8-hex-char threshold for a rate in [0, 1]: md5-prefix
    * strings sort uniformly, so `prefix < threshold` keeps ~rate of rows.
    * rate >= 1 returns "g", which every hex string sorts below (keep all).
    * Granularity is 2^-32 and positive rates round UP to the next grid
    * point — a tiny rate like 1e-10 keeps ~2^-32 of rows instead of being
    * silently truncated to zero (only rate == 0.0 keeps nothing). A rate
    * just below 1 whose grid point rounds UP to 2^32 also keeps all: %08x
    * would format it as the 9-char '100000000', and 8-char prefixes >= '11'
    * sort ABOVE that — silently keeping ~1/16 of the stratum instead of ~all
    * (r7 correctness fix, ADVICE). */
  private[operators] def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"sampling rate $rate outside [0, 1]")
    val grid = math.ceil(rate * 4294967296.0).toLong
    if (rate >= 1.0 || grid >= 4294967296L) "g"
    else f"$grid%08x"
  }

  /** The keep-condition alone (composable into larger plans). */
  def stratifiedKeep(key: Column, strata: Column,
                     rates: Map[String, Double], defaultRate: Double): Column = {
    val thresh = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (value, rate)) =>
        when(strata === lit(value), lit(hexThreshold(rate))).otherwise(acc)
    }
    substring(md5(key.cast("string").cast("binary")), 1, 8) < thresh
  }

  /**
   * Per-stratum deterministic Bernoulli sample: keep each row of stratum v
   * with probability `rates.getOrElse(v, defaultRate)`, decided by
   * `md5(keyCol)` alone. Returns the surviving rows with all columns.
   */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame =
    df.where(stratifiedKeep(col(keyCol), col(strataCol), rates, defaultRate))
}
