package graft.plans

import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation
import org.apache.spark.sql.graftshim.Shim

import graft.sources.v2.{FilterConversion, GraftMicroBatchStream}

/**
 * Filter pushdown for the STREAMING read — the piece Spark's engine does not
 * provide: `MicroBatchExecution` builds a stream's scan via
 * `newScanBuilder(options).build().toMicroBatchStream(...)` with NO
 * `pushFilters`/`pruneColumns` calls (verified against the Spark 4.1
 * bytecode), so a filtered incremental consumer — the normal training-data
 * shape, new crawl snapshots -> filter lang/url -> dedup — would decode every
 * new part while the same query on the batch surface prunes groups.
 *
 * Each micro-batch's logical plan IS optimized per trigger, so this
 * read-only rule runs every batch: it finds `Filter` directly above a graft
 * [[StreamingDataSourceV2ScanRelation]] (PushDownPredicates has already
 * pushed filters through any projections by this point), translates the
 * conjuncts through Spark's own `DataSourceStrategy.translateFilter`, and
 * hands the resulting block predicates to the [[GraftMicroBatchStream]] —
 * whose next `planInputPartitions` prunes the batch's delta groups through
 * the same gated metadata planning as the batch scan. The Filter node itself
 * is NEVER removed (pruning is block-level and inexact; the residual keeps
 * results exact), so the rule rewrites nothing and is trivially sound: at
 * worst no predicate converts and the stream scans the whole delta, exactly
 * as before.
 */
object StreamFilterPushRule extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case Filter(cond, r: StreamingDataSourceV2ScanRelation)
          if r.stream.isInstanceOf[GraftMicroBatchStream] =>
        // column types come from the relation's own output attributes — the
        // store's (possibly generalized) schema as this stream reads it
        val schema = org.apache.spark.sql.types.StructType(
          r.output.map(a => org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
        val preds = splitConjunctivePredicates(cond)
          .flatMap(e => Shim.translateFilter(e))
          .flatMap(f => FilterConversion.toBlockPredicates(f, schema))
        r.stream.asInstanceOf[GraftMicroBatchStream].setPushedPredicates(preds)
      case _ => ()
    }
    plan
  }
}
