package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.hashBucket

/** Deterministic training-order shuffle + shard export — the last step
  * of a curation pipeline before the data loader: the corpus is dealt
  * into `nShards` shards in a pseudorandom but fully REPLAYABLE order
  * (shard and position are pure functions of (id, seed, nShards), like
  * [[Sampling]]'s keep decision). A re-run over re-split files, a
  * different cluster size, or a retry produces byte-identical shards —
  * which is what makes a 100 TB training run resumable and auditable.
  *
  * Scale shape: shard assignment is the codegen'd splitmix64 scan
  * expression (uniform by construction — no skew mitigation needed);
  * ordering costs ONE hash exchange on the shard key. In [[writeShards]]
  * the explicit `repartition(nShards, shard)` already satisfies the
  * position window's clustered-distribution requirement, so Catalyst
  * inserts no second exchange — the plan is Exchange → Sort → Window →
  * per-task parquet write of its own shard directory.
  */
object Sharding {

  private def assigned(df: DataFrame, idCol: String, nShards: Int, seed: Long): DataFrame =
    df.withColumn("__bucket", hashBucket(col(idCol), Sampling.Buckets, seed))
      .withColumn("shard", (col("__bucket") % nShards).cast("int"))

  /** (shard, pos) for every row: shard = splitmix64(id) mod nShards,
    * pos = rank within its shard ordered by (hash, id) — id breaks
    * bucket ties, so the training order is total and deterministic.
    */
  def shuffleToShards(df: DataFrame, idCol: String, nShards: Int, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("__bucket"), col(idCol))
    assigned(df, idCol, nShards, seed)
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__bucket")
  }

  /** Write the shuffled corpus as `shard=K/` parquet directories, each
    * internally ordered by `pos` — the data-loader handoff layout.
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String,
      seed: Long = 42L): Unit = {
    val w = Window.partitionBy(col("shard")).orderBy(col("__bucket"), col(idCol))
    assigned(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__bucket")
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
