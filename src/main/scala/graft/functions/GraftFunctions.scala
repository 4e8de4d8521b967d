package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftshim.Shim.{column, expression}

/**
 * Registration + typed Column surface for the codec expressions — the engine's
 * equivalent of the reference CLI grammar (reference: util/golomb.cpp:253-329).
 */
object GraftFunctions {

  private def lit(v: Any): Expression = Literal(v)

  /** Arity check at resolution time: a wrong argument count must be a named
    * analysis-style error, not a raw IndexOutOfBoundsException from args(i)
    * (or, worse, one thrown per-row mid-execution). */
  private def arity(name: String, allowed: Int*)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(allowed.contains(args.length),
        s"$name expects ${allowed.mkString(" or ")} argument(s), got ${args.length}")
      b(args)
    }

  /** All (name, builder) pairs for SQL registration. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "eg_encode" -> arity("eg_encode", 2, 3) { args =>
      if (args.length == 2) new EgEncode(args(0), args(1)) else EgEncode(args(0), args(1), args(2))
    },
    "eg_decode" -> arity("eg_decode", 3) { args => EgDecode(args(0), args(1), args(2)) },
    "eg_encode_adaptive" -> arity("eg_encode_adaptive", 3, 4)(EgEncodeAdaptive(_)),
    "eg_decode_adaptive" -> arity("eg_decode_adaptive", 4)(EgDecodeAdaptive(_)),
    "graft_encode" -> arity("graft_encode", 1, 2) { args =>
      if (args.length == 1) new GraftEncode(args(0)) else GraftEncode(args(0), args(1))
    },
    "graft_decode" -> arity("graft_decode", 1) { args => GraftDecode(args(0)) },
    "graft_codec" -> arity("graft_codec", 1) { args => GraftCodecName(args(0)) },
    "graft_encode_str" -> arity("graft_encode_str", 1) { args => GraftEncodeStr(args(0)) },
    "graft_decode_str" -> arity("graft_decode_str", 1) { args => GraftDecodeStr(args(0)) },
    "zigzag_encode" -> arity("zigzag_encode", 1) { args => ZigZagEncode(args(0)) },
    "zigzag_decode" -> arity("zigzag_decode", 1) { args => ZigZagDecode(args(0)) })

  /** Register for SQL use on an existing session. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }

  // ---- typed Column API ----
  // no-type default "" = INFER the physical type from the array element type,
  // the same default as the SQL 2-arg form — a fixed "i64" default here made
  // the two surfaces emit DIFFERENT bitstreams for the same non-long column
  def eg_encode(arr: Column, k: Int, typ: String = ""): Column =
    column(EgEncode(expression(arr), lit(k), lit(typ)))
  def eg_decode(bin: Column, k: Int, typ: String): Column =
    column(EgDecode(expression(bin), lit(k), lit(typ)))
  def eg_encode_adaptive(arr: Column, k: Int, a: Int, typ: String = ""): Column = {
    val args = Seq(expression(arr), lit(k), lit(a)) ++
      (if (typ.isEmpty) Seq.empty else Seq(lit(typ))) // "" = infer (3-arg form)
    column(EgEncodeAdaptive(args))
  }
  def eg_decode_adaptive(bin: Column, k: Int, a: Int, typ: String): Column =
    column(EgDecodeAdaptive(Seq(expression(bin), lit(k), lit(a), lit(typ))))
  def graft_encode(arr: Column): Column = column(new GraftEncode(expression(arr)))
  def graft_encode(arr: Column, typ: String): Column = column(GraftEncode(expression(arr), lit(typ)))
  def graft_decode(bin: Column): Column = column(GraftDecode(expression(bin)))
  def graft_codec(bin: Column): Column = column(GraftCodecName(expression(bin)))
  def graft_encode_str(arr: Column): Column = column(GraftEncodeStr(expression(arr)))
  def graft_decode_str(bin: Column): Column = column(GraftDecodeStr(expression(bin)))
  def zigzag_encode(c: Column): Column = column(ZigZagEncode(expression(c)))
  def zigzag_decode(c: Column): Column = column(ZigZagDecode(expression(c)))
}

/**
 * SparkSessionExtensions entry point:
 * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
 * Injects the codec functions and the block-pruning optimizer rule.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.BlockMinMaxPruneRule)
    // streaming filter pushdown: runs on every micro-batch's optimized plan
    ext.injectOptimizerRule(_ => graft.plans.StreamFilterPushRule)
    // filtered grouped aggregates answered from dict metadata (pre-scan-build
    // form: the V2 pushdown contract cannot express this shape)
    ext.injectOptimizerRule(_ => graft.plans.GroupedAggMetadataRule)
    // analysis-time: must run BEFORE the optimizer's V2Writes plans the write's
    // distribution (an extraOptimizations rule would see the range exchange
    // already injected)
    ext.injectResolutionRule(s => graft.plans.GraftWriteArrangeRule(s))
  }
}
