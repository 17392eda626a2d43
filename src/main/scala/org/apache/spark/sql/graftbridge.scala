package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression converters — the standard
  * pattern for Spark extension libraries shipping custom Catalyst
  * expressions (Spark 4 wraps Column around ColumnNode, so `new
  * Column(expr)` / `col.expr` are no longer public).
  */
object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a custom expression as a SQL-callable temp function on an
    * existing session (`sessionState` is private[sql]).
    */
  def registerFunction(spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Unpersist every persisted RDD reachable from `df`'s analyzed plan —
    * the `LogicalRDD` leaves that `localCheckpoint()` produces, plus any
    * persisted ancestor in their lineage (a checkpoint wrapped by a later
    * `mapPartitions` is a plan-invisible parent). Returns the number
    * released. After release the DataFrame can no longer be recomputed —
    * its lineage was truncated at the checkpoint — so call this only once
    * the result has been fully consumed (written out or collected).
    * Long-lived sessions use this to stop repeated pipeline invocations
    * from accumulating executor storage.
    */
  def releaseCheckpoints(df: Dataset[_]): Int = {
    val roots = df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed.collect {
      case l: execution.LogicalRDD => l.rdd
    }
    val seen = scala.collection.mutable.Set.empty[Int]
    var released = 0
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit =
      if (seen.add(r.id)) {
        if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE) {
          r.unpersist(blocking = false)
          released += 1
        }
        r.dependencies.foreach(d => walk(d.rdd))
      }
    roots.foreach(walk)
    released
  }

  /** Bounded top-k collect as a Catalyst-native aggregate: keeps the
    * `num` SMALLEST values of `sortKey` (struct keys compare field by
    * field) and evaluates to an array sorted ascending — Spark's own
    * `CollectTopK` (the pandas-on-Spark `nsmallest` machinery, a
    * `TypedImperativeAggregate` over a bounded priority queue, so
    * partial aggregation trims to k BEFORE the shuffle exactly like the
    * typed `TopKAgg` it replaces). Unlike a typed
    * `groupByKey.mapValues.agg(Aggregator)` pipeline there is no
    * object-serialization boundary on the input rows: no
    * DeserializeToObject/AppendColumns/SerializeFromObject plan nodes,
    * no per-row encoder round trip — input rows stay Tungsten rows and
    * only the ≤ k buffer entries are copied (guide: eliminate
    * non-codegen closures on the hot path).
    *
    * Ordering note: doubles compare by Spark's SQL ordering (NaN
    * greatest; -0.0 < 0.0 via java.lang.Double.compare inside the
    * interpreted struct ordering) — identical to the Scala
    * `Ordering.Double.TotalOrdering` the typed heap used.
    */
  def collectTopK(sortKey: Column, num: Int): Column =
    column(new catalyst.expressions.aggregate.CollectTopK(expression(sortKey), num, true, 0, 0)
      .toAggregateExpression())

  /** Wait for queued listener-bus events to be delivered — measurement
    * harnesses (OptProbe) tally task metrics through a SparkListener, and
    * the bus is async, so a read taken right after an action can miss
    * that action's tail events. Bounded (waitUntilEmpty throws on its
    * timeout) and fail-soft: a still-draining bus after 60 s means a
    * slightly stale tally, which must not abort a measurement sweep.
    */
  def flushListenerBus(spark: SparkSession): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(60000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
