package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}

/** One-shot listener that releases an internal cache after the first
  * query execution (success OR failure) that reads it. The cache is
  * identified by ITS OWN `InMemoryRelation` cache builder (taken from
  * the `cached` frame the caller persisted — never guessed from the
  * result plan, where an unrelated user cache could appear first), and
  * the read check traverses NESTED cached plans: a cache stacked on top
  * of another (e.g. [[Graph.pageRank]]'s edge pin over
  * [[Similarity.annKnnGraph]]'s projection cache) hides the inner
  * `InMemoryRelation` inside the outer one's physical plan, where a
  * logical-plan-only scan would never see it — and the inner cache
  * would leak for the session. If the result is never acted on, the
  * listener (and cache) live until session close — the same bound as
  * any unused `persist`.
  */
private[operators] object CacheRelease {

  /** Release `cached`'s cache (via `release`) after the first executed
    * query whose plan reads it, directly or nested inside another cache.
    */
  def autoRelease(result: DataFrame, cached: DataFrame, release: () => Unit): Unit = {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val spark = result.sparkSession
    // the persisted frame's own relation is the TOP InMemoryRelation of
    // its post-substitution plan
    val builder = cached.queryExecution.optimizedPlan.collectFirst {
      case r: InMemoryRelation => r.cacheBuilder
    }
    builder.foreach { cb =>
      val listener: QueryExecutionListener = new QueryExecutionListener {
        private def fire(qe: QueryExecution): Unit = {
          if (buildersOf(qe.optimizedPlan).exists(_ eq cb)) {
            release(); spark.listenerManager.unregister(this)
          }
        }
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = fire(qe)
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = fire(qe)
      }
      spark.listenerManager.register(listener)
    }
  }

  /** Every cache builder a plan reads: logical `InMemoryRelation`s plus,
    * recursively, relations scanned INSIDE their cached physical plans
    * (`InMemoryTableScanExec`, descending through AQE wrappers — both
    * are leaf nodes a plain `collect` stops at). Builders are carried as
    * `AnyRef` and compared by `eq` — the `CachedRDDBuilder` type itself
    * is private[sql].
    */
  private def buildersOf(plan: LogicalPlan): Seq[AnyRef] =
    plan.collect { case r: InMemoryRelation => r }
      .flatMap(r => r.cacheBuilder +: nestedBuilders(r.cachedPlan))

  private def nestedBuilders(p: SparkPlan): Seq[AnyRef] =
    p.collect {
      case s: InMemoryTableScanExec =>
        s.relation.cacheBuilder +: nestedBuilders(s.relation.cachedPlan)
      case a: AdaptiveSparkPlanExec => nestedBuilders(a.inputPlan)
    }.flatten
}
