package graft.operators

import org.apache.spark.sql.DataFrame

/** One-shot listener that releases an internal cache after the first
  * query execution (success OR failure) whose optimized plan reads it.
  * Matching is on the logical `InMemoryRelation`'s cache builder — the
  * node the cache manager substitutes into every referencing plan — so
  * it is AQE-proof and never false-positives on unrelated queries. If
  * the result is never acted on, the listener (and cache) live until
  * session close — the same bound as any unused `persist`. Shared by
  * [[Similarity]] (SRP projections) and [[Graph]] (prepared edge lists).
  */
private[operators] object CacheRelease {

  def autoRelease(result: DataFrame, release: () => Unit): Unit = {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.util.QueryExecutionListener
    val spark = result.sparkSession
    val builder = result.queryExecution.optimizedPlan.collectFirst {
      case r: InMemoryRelation => r.cacheBuilder
    }
    builder.foreach { cb =>
      val listener: QueryExecutionListener = new QueryExecutionListener {
        private def fire(qe: QueryExecution): Unit = {
          val hit = qe.optimizedPlan.exists {
            case r: InMemoryRelation => r.cacheBuilder eq cb
            case _ => false
          }
          if (hit) { release(); spark.listenerManager.unregister(this) }
        }
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = fire(qe)
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = fire(qe)
      }
      spark.listenerManager.register(listener)
    }
  }
}
