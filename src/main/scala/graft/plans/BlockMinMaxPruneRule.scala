package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.GraftDecode

/**
 * Predicate pushdown onto codec metadata (BASELINE.json north_star: "SQL queries can
 * predicate-push onto dictionary and FoR metadata without full decompression").
 *
 * Block tables written by the encode job carry per-block `block_min`/`block_max`
 * columns (FoR bounds in the column's logical domain) and, for dictionary-coded
 * blocks, an optional `block_dict` array listing every distinct value in the block
 * (null for non-dict codecs). For a filter of the shape
 * `array_contains(graft_decode(encoded), <literal>)` this rule conjoins
 * `block_min <= lit AND lit <= block_max`, which Parquet then prunes with row-group
 * statistics BEFORE any block is decompressed. Pure pruning rewrite: value ∈ block ⇒
 * value within [min,max], so results never change; when the metadata columns are
 * absent the rule is a no-op (SURVEY.md §7.4 soundness requirement).
 */
object BlockMinMaxPruneRule extends Rule[LogicalPlan] {

  private def literalLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val minAttr = child.output.find(_.name.equalsIgnoreCase("block_min"))
      val maxAttr = child.output.find(_.name.equalsIgnoreCase("block_max"))
      val dictAttr = child.output.find(_.name.equalsIgnoreCase("block_dict"))
      if (minAttr.isEmpty && dictAttr.isEmpty) f
      else {
        val conjuncts = splitConjunctivePredicates(cond)
        val extra = conjuncts.flatMap {
          case ArrayContains(GraftDecode(_), lit) =>
            literalLong(lit).toSeq.flatMap { v =>
              val range = for (mn <- minAttr; mx <- maxAttr) yield
                And(LessThanOrEqual(mn, Literal(v)), GreaterThanOrEqual(mx, Literal(v)))
              // dictionary-membership prune: null block_dict (non-dict codec) must
              // pass — the guard keeps the rewrite purely pruning
              val dict = dictAttr.map { d =>
                Or(IsNull(d), ArrayContains(d, Literal(v)))
              }
              range.toSeq ++ dict.toSeq
            }
          case _ => Nil
        }.filterNot(e => conjuncts.exists(_.semanticEquals(e)))
        if (extra.isEmpty) f
        else Filter(extra.foldLeft(cond)(And(_, _)), child)
      }
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}
