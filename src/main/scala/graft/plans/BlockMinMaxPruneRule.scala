package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.functions.{GraftDecode, GraftDecodeStr}

/**
 * Predicate pushdown onto codec metadata (BASELINE.json north_star: "SQL queries can
 * predicate-push onto dictionary and FoR metadata without full decompression").
 *
 * Block tables written by the encode job carry per-block metadata columns:
 *  - `block_min`/`block_max` (nullable long): FoR bounds of integer blocks
 *  - `block_dict` (nullable array<long>): every distinct value, when cardinality
 *    is small (dictionary-codec metadata)
 *  - `block_str_min`/`block_str_max` (nullable string): bounds for string blocks
 *    (emitted only when the bound value is short enough to store — null = no bound)
 *  - `block_str_dict` (nullable array<string>): distinct strings of low-cardinality
 *    string blocks (e.g. `lang`)
 *
 * For a filter conjunct of the shape `array_contains(graft_decode(encoded), lit)`
 * (or `graft_decode_str`), this rule conjoins the matching metadata bounds, which
 * Parquet then prunes with row-group statistics BEFORE any block is decompressed.
 *
 * Soundness: every added conjunct is null-safe — a null bound (missing metadata)
 * passes via IsNull, so the rewrite is purely pruning (value ∈ block ⇒ value within
 * bounds / in dict). The rewrite only fires when the decode argument is the block
 * table's companion `encoded` attribute AND the metadata columns come from the same
 * leaf relation — metadata of one table never prunes blocks of another, and renamed
 * columns disable the rule rather than mis-prune.
 */
object BlockMinMaxPruneRule extends Rule[LogicalPlan] {

  private def literalLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  /** Null-safe containment bound: pass when any bound is null, else min<=v<=max. */
  private def rangeConjunct(mn: Attribute, mx: Attribute, v: Literal): Expression =
    Or(Or(IsNull(mn), IsNull(mx)),
      And(LessThanOrEqual(mn, v), GreaterThanOrEqual(mx, v)))

  /** Null-safe dictionary membership: non-dict blocks (null dict) pass. */
  private def dictConjunct(d: Attribute, v: Literal): Expression =
    Or(IsNull(d), ArrayContains(d, v))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val out = child.output
      def meta(name: String) = out.find(_.name.equalsIgnoreCase(name))
      val minAttr = meta("block_min"); val maxAttr = meta("block_max")
      val dictAttr = meta("block_dict")
      val sMinAttr = meta("block_str_min"); val sMaxAttr = meta("block_str_max")
      val sDictAttr = meta("block_str_dict")
      if (minAttr.isEmpty && dictAttr.isEmpty && sMinAttr.isEmpty && sDictAttr.isEmpty) f
      else {
        // the metadata must describe the decoded column's own blocks: both sides
        // must resolve to the SAME leaf relation (post-join name collisions and
        // renamed tables must not prune each other's rows)
        val leaves = child.collectLeaves()
        def sameRelation(enc: Attribute, metas: Seq[Attribute]): Boolean =
          leaves.exists(l => l.outputSet.contains(enc) && metas.forall(l.outputSet.contains))

        val conjuncts = splitConjunctivePredicates(cond)
        val extra = conjuncts.flatMap {
          case ArrayContains(GraftDecode(enc: AttributeReference), lit)
              if enc.name.equalsIgnoreCase("encoded") =>
            literalLong(lit).toSeq.flatMap { v =>
              val range = for {
                mn <- minAttr; mx <- maxAttr
                if sameRelation(enc, Seq(mn, mx))
              } yield rangeConjunct(mn, mx, Literal(v))
              val dict = dictAttr
                .filter(d => sameRelation(enc, Seq(d)))
                .map(d => dictConjunct(d, Literal(v)))
              range.toSeq ++ dict.toSeq
            }

          case ArrayContains(GraftDecodeStr(enc: AttributeReference), l @ Literal(s, StringType))
              if s != null && enc.name.equalsIgnoreCase("encoded") =>
            val range = for {
              mn <- sMinAttr; mx <- sMaxAttr
              if sameRelation(enc, Seq(mn, mx))
            } yield rangeConjunct(mn, mx, l)
            val dict = sDictAttr
              .filter(d => sameRelation(enc, Seq(d)))
              .map(d => dictConjunct(d, l))
            range.toSeq ++ dict.toSeq

          case _ => Nil
        }.filterNot(e => conjuncts.exists(_.semanticEquals(e)))
        if (extra.isEmpty) f
        // PREPEND the cheap metadata conjuncts: And evaluates left-to-right, so a
        // metadata miss short-circuits before the original predicate decompresses
        // the block (rows not pruned by parquet row-group stats still skip decode)
        else Filter(extra.foldRight(cond)((e, acc) => And(e, acc)), child)
      }
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}
