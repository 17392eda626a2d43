package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in a
  * deterministic order and chunked into fixed `capacity`-token context
  * windows; each document is tagged with the chunk (`bin`) and token
  * `offset` where it starts. This is the concat-and-chunk packing most
  * pretraining pipelines use (docs may straddle a boundary; the consumer
  * splits at `capacity - offset` tokens).
  *
  * The assignment is a pure function of the global token prefix-sum, so
  * it is partitioning-independent — both implementations below produce
  * bitwise-identical output, and the DuckDB oracle replays it with a
  * window cumsum.
  */
object Packing {

  /** Per-group packing (the common sharded layout: one packing stream per
    * source/shard). One shuffle on `groupCol`; groups pack in parallel.
    * Output adds `bin` and `offset` to the input columns.
    *
    * `orderCol` must be a TOTAL order within each group (the p1/p2 gates
    * order by a hash chain with an id tiebreak): rows tied on `orderCol`
    * get layout-dependent prefix sums, which breaks the
    * bitwise-identical / oracle-replay contract above.
    */
  def packChunks(df: DataFrame, groupCol: String, orderCol: String,
      tokenCol: String, capacity: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__start", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      // integral DIV, not floor(a / b): Spark's `/` on longs is DOUBLE
      // division, which rounds past 2^53 and can land a boundary row in
      // the adjacent bin while the oracle's exact integer `//` doesn't —
      // breaking the bitwise-replay contract at extreme corpus sizes
      .withColumn("bin", expr(s"__start DIV ${capacity}L"))
      .withColumn("offset", col("__start") % capacity)
      .drop("__start")
  }

  /** Single global packing stream without a single-partition window: a
    * global window would funnel the corpus through ONE task. Instead:
    * range-repartition by `orderCol`, per-partition token totals (one
    * row per partition to the driver — bounded by partition count, same
    * contract as KMeans' k×dim×P partials), prefix offsets broadcast
    * back, then a per-partition RUNNING SUM over the already-sorted
    * partitions. The running sum is `mapPartitionsWithIndex`, not a
    * `Window.partitionBy(pid)` — the rows are already physically
    * clustered by pid, and the window's hash-clustering requirement
    * would re-shuffle the whole corpus for nothing (plan-audited: the
    * window form carried a second corpus-sized Exchange). Identical
    * output to a global-window cumsum, one shuffle total, P-way
    * parallel.
    *
    * The totals pass and the running-sum pass MUST see the same
    * partition layout, but `RangePartitioner`'s boundary sampling is
    * seeded with the RDD id (`byteswap32(idx ^ (rdd.id << 16))`), which
    * differs between two executions of the plan — whenever partitions
    * are large enough that the reservoir subsamples, two runs can cut
    * different boundaries and the offsets would silently misdescribe
    * the data. The eager `localCheckpoint` materializes ONE layout that
    * both passes read (and pays for the corpus scan once, not twice).
    */
  def packChunksGlobal(df: DataFrame, orderCol: String, tokenCol: String,
      capacity: Long, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(p, col(orderCol))
      .sortWithinPartitions(orderCol)
      .localCheckpoint()
    // per-partition totals: P rows — driver-side prefix sum is O(P)
    val partTotals = ranged
      .select(spark_partition_id().as("__pid"), col(tokenCol))
      .groupBy("__pid").agg(sum(col(tokenCol)).as("__ptotal"))
      // sum() is null when every token value in a partition is null —
      // treat as 0, matching the running-sum pass's null handling below
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) 0L else r.get(1).asInstanceOf[Number].longValue)).toMap
    val partOffsets = (0 until p).scanLeft(0L)((acc, i) => acc + partTotals.getOrElse(i, 0L))
    val tokIdx = ranged.schema.fieldIndex(tokenCol)
    val withStart = spark.createDataFrame(
      ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = partOffsets(pid)
        it.map { r =>
          val start = acc
          acc += (r.get(tokIdx) match {
            case l: Long => l
            case i: Int => i.toLong
            case null => 0L // null token count = contributes nothing (the
            // window form's sum() ignored nulls the same way)
            case n: Number => n.longValue()
          })
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ start)
        }
      },
      ranged.schema.add("__start", org.apache.spark.sql.types.LongType, nullable = false))
    withStart
      .withColumn("bin", expr(s"__start DIV ${capacity}L")) // integral (see packChunks)
      .withColumn("offset", col("__start") % capacity)
      .drop("__start")
  }
}
