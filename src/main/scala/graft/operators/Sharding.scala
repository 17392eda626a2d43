package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.{hashBucket, hashOrder64}

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
  * the explicit repartition (4×nShards hash slots — see
  * [[shardedOrdered]] for why not exactly nShards) already satisfies
  * the position window's clustered-distribution requirement, so
  * Catalyst inserts no second exchange — the plan is Exchange → Sort →
  * Window → per-task parquet write of the shard(s) it holds.
  */
object Sharding {

  private def assigned(df: DataFrame, idCol: String, nShards: Int, seed: Long): DataFrame =
    df.withColumn("__bucket", hashBucket(col(idCol), Sampling.Buckets, seed))
      // FULL-width hash for the training order: the 10^6-bucket reduction
      // is fine for shard ROUTING but far too coarse to ORDER a corpus
      // beyond 10^6 docs — ties would fall back to id-ascending runs,
      // leaking sequential source/crawl id order into the training order
      // at exactly the scale this module targets
      .withColumn("__ord", hashOrder64(col(idCol), seed))
      .withColumn("shard", (col("__bucket") % nShards).cast("int"))

  /** (shard, pos) for every row: shard = splitmix64(id) mod nShards,
    * pos = rank within its shard ordered by (full-width hash, id) — the
    * 64-bit key makes the pseudorandom order collision-free in practice
    * and the id tiebreak keeps it total and deterministic.
    */
  def shuffleToShards(df: DataFrame, idCol: String, nShards: Int, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("__ord"), col(idCol))
    assigned(df, idCol, nShards, seed)
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__bucket", "__ord")
  }

  /** Write the shuffled corpus as `shard=K/` parquet directories, each
    * internally ordered by `pos` — the data-loader handoff layout.
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String,
      seed: Long = 42L): Unit =
    shardedOrdered(df, idCol, nShards, seed)
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** The pre-write plan (exposed for the plan-shape spec).
    *
    * Routing: hash partitioning on the shard VALUE with
    * numPartitions == nShards collides shards onto tasks (murmur3 mod n
    * is not a bijection on 0..n-1 — a 4-shard write typically lands on
    * ~3 tasks, one carrying double data). Spreading over 4×nShards hash
    * slots makes collisions rare while ~nShards slots stay occupied;
    * empty slots cost nothing. `repartitionByRange` would route exactly
    * but pays a boundary-sampling pass over the corpus first. Either
    * way the explicit repartition satisfies the position window's
    * clustered-distribution requirement — ONE exchange total
    * (plan-asserted in ShardingSpec).
    */
  private[operators] def shardedOrdered(df: DataFrame, idCol: String, nShards: Int,
      seed: Long): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("__ord"), col(idCol))
    assigned(df, idCol, nShards, seed)
      .repartition(nShards * 4, col("shard"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__bucket", "__ord")
      .sortWithinPartitions(col("shard"), col("pos"))
  }
}
