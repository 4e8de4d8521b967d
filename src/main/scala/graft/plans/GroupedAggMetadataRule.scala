package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.v2.{GraftGroupedAgg, GraftScan, GraftTable}

/**
 * FILTERED grouped-aggregate answering from dictionary metadata — the shape
 * the DataSource V2 pushdown contract cannot express: Spark only attempts
 * aggregate pushdown when NO post-scan filters remain, and this source keeps
 * every filter as a residual (block pruning is inexact), so
 * `SELECT lang, count(*) FROM graft WHERE lang <> 'en' GROUP BY lang` always
 * decoded the store even though the unfiltered variant answers from metadata
 * ([[graft.sources.v2.GraftGroupedAgg]], the V2 complete pushdown).
 *
 * This optimizer rule closes that gap one level up, where the whole subtree
 * is visible: an `Aggregate(group = c)(Filter(cond)(graft relation))` whose
 * condition references ONLY the group column is replaced by a
 * [[LocalRelation]] of the metadata answer with `cond` evaluated EXACTLY per
 * group value on the driver (Catalyst expression eval over each dict value —
 * null three-valued logic, LIKE, IN, everything cond can say about one
 * string, for free). Zero file IO, zero tasks: the plan becomes a local scan.
 *
 * Exactness gates (any miss -> plan unchanged, Spark computes normally):
 *  - the store's metadata can answer at all (same dict+counts coverage gate
 *    as the unfiltered pushdown — [[GraftGroupedAgg.compute]] returns None
 *    otherwise);
 *  - single string group column, aggregates only count(*) / count(c)
 *    (non-distinct, unfiltered);
 *  - cond is deterministic, subquery-free, and references no column but c —
 *    a predicate on any OTHER column changes per-group counts in ways block
 *    metadata cannot attribute;
 *  - cond evaluation itself throws nothing (an ANSI cast error declines and
 *    surfaces through the normal scan instead).
 *
 * Matches BOTH relation stages, because the rule is registered both as an
 * extension optimizer rule (runs before V2 scan building — sees
 * [[DataSourceV2Relation]]) and in `experimental.extraOptimizations` (runs
 * last — sees the built [[DataSourceV2ScanRelation]]). Incremental
 * (fromSnapshot) scans are excluded in both forms: a range delta is not the
 * state the metadata describes. The unfiltered shape is deliberately NOT
 * matched here — it already rides the V2 complete pushdown with its
 * plan-visible `PushedAggregates`.
 */
object GroupedAggMetadataRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case a @ Aggregate(Seq(g: AttributeReference), _, _, _) if g.dataType == StringType =>
      rewrite(a, g).getOrElse(a)
  }

  /** (store root, pinned snapshot, table schema) when `p` is a graft relation
    * whose metadata describes the scanned state. */
  private def graftScope(p: LogicalPlan): Option[(String, Option[Long], StructType)] =
    p match {
      case r: DataSourceV2Relation => r.table match {
        // decline on ANY incremental option (also a lone toSnapshot — the
        // builder rejects it; answering from full-state metadata here would
        // swallow that validation) and on an unparseable snapshotId (the
        // builder throws; defaulting to the CURRENT state would silently
        // answer the wrong snapshot)
        case t: GraftTable if !r.options.containsKey("fromSnapshot") &&
            !r.options.containsKey("toSnapshot") =>
          Option(r.options.get("snapshotId")) match {
            case None => Some((t.storeRoot, None, t.schema()))
            case Some(v) =>
              try Some((t.storeRoot, Some(v.toLong), t.schema()))
              catch { case _: NumberFormatException => None }
          }
        case _ => None
      }
      case r: DataSourceV2ScanRelation => r.scan match {
        case s: GraftScan =>
          s.metadataScope.map { case (root, snap) => (root, snap, r.relation.table.schema()) }
        case _ => None
      }
      case _ => None
    }

  /** Column pruning interleaves plain attribute Projects with the shape —
    * they change nothing the metadata answer depends on. */
  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => stripProjects(c)
    case other => other
  }

  private sealed trait OutCol
  private case object OutGroupValue extends OutCol
  private case object OutCountStar extends OutCol
  private case object OutCountCol extends OutCol

  private def rewrite(a: Aggregate, g: AttributeReference): Option[LogicalPlan] = {
    val (cond, rel) = stripProjects(a.child) match {
      case Filter(c, ch) => stripProjects(ch) match {
        case r @ (_: DataSourceV2Relation | _: DataSourceV2ScanRelation) => (c, r)
        case _ => return None
      }
      case _ => return None // unfiltered: the V2 complete pushdown's job
    }
    val (root, snapshotId, schema) = graftScope(rel).getOrElse(return None)
    // the group attribute must BE the relation's column (same exprId), typed
    // string in the store schema
    if (!rel.output.exists(o => o.exprId == g.exprId && o.dataType == StringType))
      return None
    if (!schema.fields.exists(f => f.name == g.name && f.dataType == StringType))
      return None
    if (!cond.deterministic || !cond.references.subsetOf(AttributeSet(g)) ||
        cond.exists(_.isInstanceOf[PlanExpression[_]])) return None
    val outs: Seq[OutCol] = a.aggregateExpressions.map {
      case ar: AttributeReference if ar.exprId == g.exprId => OutGroupValue
      case Alias(ar: AttributeReference, _) if ar.exprId == g.exprId => OutGroupValue
      case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) if v != null => OutCountStar
          case Count(Seq(ar: AttributeReference)) if ar.exprId == g.exprId => OutCountCol
          case _ => return None
        }
      case _ => return None
    }
    val rows = cachedCompute(root, snapshotId, g.name).getOrElse(return None)
    // exact per-value filter: bind cond to a one-column row and evaluate with
    // full Catalyst semantics (three-valued null logic included — the SQL NULL
    // group passes iff cond(NULL) is TRUE, exactly like the row filter would)
    val bound = BindReferences.bindReference(cond, Seq(g): AttributeSeq)
    val holder = new GenericInternalRow(1)
    def passes(v: String): Boolean = {
      holder.update(0, if (v == null) null else UTF8String.fromString(v))
      bound.eval(holder) == true
    }
    val data =
      try rows.filter(r => passes(r.value)).map { r =>
        InternalRow.fromSeq(outs.map {
          case OutGroupValue => if (r.value == null) null else UTF8String.fromString(r.value)
          case OutCountStar => r.countStar
          case OutCountCol => r.countCol
        })
      } catch {
        // a condition that cannot evaluate (e.g. an ANSI cast error) declines:
        // the normal scan raises the same error with its proper query context
        case scala.util.control.NonFatal(_) => return None
      }
    fired.incrementAndGet()
    Some(LocalRelation(a.output, data))
  }

  /** Test hook: metadata-answered filtered grouped aggregates in this JVM. */
  val fired = new java.util.concurrent.atomic.AtomicLong(0)

  /** Memoized [[GraftGroupedAgg.compute]] — both negative and positive
    * results. The rule sits in FIXED-POINT optimizer batches (the operator
    * batch runs before AND after filter inference, plus extraOptimizations),
    * so one query would otherwise re-run the metadata jobs 4-8 times; and a
    * decline (e.g. GROUP BY text) re-matches on every iteration. Keyed by the
    * RESOLVED snapshot id: explicit ids are immutable forever, and the
    * current-state key changes with every commit (one tiny pointer read), so
    * a write between queries can never serve stale counts. Bounded LRU. */
  private val MaxCached = 64
  private val cache = new java.util.LinkedHashMap[(String, Long, Long, String),
      Option[Seq[GraftGroupedAgg.GroupRow]]](MaxCached, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, Long, Long, String),
          Option[Seq[GraftGroupedAgg.GroupRow]]]): Boolean = size() > MaxCached
  }

  private def cachedCompute(root: String, snapshotId: Option[Long],
      column: String): Option[Seq[GraftGroupedAgg.GroupRow]] = {
    // the identity token guards the same-path-recreated-store case: a store
    // dropped and recreated restarts snapshot ids at 1, and (root, id) alone
    // could serve the OLD store's counts (r7 correctness fix, ADVICE). Token
    // read BEFORE resolving/computing and re-checked after: a commit racing
    // the compute means the result may not belong to the token, so it is
    // returned but NOT cached (and a missing pointer, -1, never caches).
    val t0 = graft.sources.v2.GraftDataSource.storeIdentityToken(root)
    val resolved = snapshotId.orElse(
      graft.sources.SnapshotStore.currentSnapshotId(root)).getOrElse(return None)
    cache.synchronized {
      val key = (root, t0, resolved, column)
      val hit = if (t0 == -1L) null else cache.get(key)
      if (hit != null) return hit
      // compute under the lock: concurrent planners of the same store would
      // otherwise race the same two metadata jobs (compute is driver-side)
      val res = GraftGroupedAgg.compute(SparkSession.active, root, Some(resolved), column)
      if (t0 != -1L &&
          graft.sources.v2.GraftDataSource.storeIdentityToken(root) == t0)
        cache.put(key, res)
      res
    }
  }
}
