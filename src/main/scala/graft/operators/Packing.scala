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
    */
  def packChunks(df: DataFrame, groupCol: String, orderCol: String,
      tokenCol: String, capacity: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__start", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("__start") / capacity).cast("long"))
      .withColumn("offset", col("__start") % capacity)
      .drop("__start")
  }

  /** Single global packing stream without a single-partition window: a
    * global window would funnel the corpus through ONE task. Instead:
    * range-repartition by `orderCol`, per-partition token totals (one
    * row per partition to the driver — bounded by partition count, same
    * contract as KMeans' k×dim×P partials), prefix offsets broadcast
    * back, then per-partition windows run in parallel. Identical output
    * to a global-window cumsum, at P-way parallelism.
    */
  def packChunksGlobal(df: DataFrame, orderCol: String, tokenCol: String,
      capacity: Long, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(p, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id())
    // per-partition totals: P rows — driver-side prefix sum is O(P)
    val partTotals = ranged.groupBy("__pid").agg(sum(col(tokenCol)).as("__ptotal"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // offset of partition i = sum of totals of preceding partitions
    val offsets = partTotals.map(_._1)
      .zip(partTotals.map(_._2).scanLeft(0L)(_ + _))
    val offsetsDf = broadcast(
      spark.createDataFrame(offsets.toSeq).toDF("__pid", "__poffset"))
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(offsetsDf, "__pid")
      .withColumn("__start", col("__poffset") + coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("__start") / capacity).cast("long"))
      .withColumn("offset", col("__start") % capacity)
      .drop("__pid", "__poffset", "__start")
  }
}
