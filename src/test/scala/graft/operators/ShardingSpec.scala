package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

class ShardingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs =
    Tables.load(spark, sf0001, "documents").select(col("doc_id"), col("lang")).cache()

  test("shuffleToShards: complete, disjoint, dense positions per shard") {
    val sh = Sharding.shuffleToShards(docs, "doc_id", 4).cache()
    assert(sh.count() == docs.count(), "every row lands in exactly one shard")
    assert(sh.select("doc_id").distinct().count() == docs.count())
    val perShard = sh.groupBy("shard").agg(count(lit(1)).as("n"), max(col("pos")).as("maxPos"))
      .as[(Int, Long, Long)].collect()
    assert(perShard.map(_._1).sorted.toSeq == Seq(0, 1, 2, 3), "all 4 shards populated")
    // positions are 0..n-1 dense within each shard
    perShard.foreach { case (s, n, maxPos) => assert(maxPos == n - 1, s"shard $s sparse") }
    // uniform hash → no shard holds a wildly skewed share (2× under
    // the uniform share bounds it at any fixture size)
    val sizes = perShard.map(_._2)
    val n = docs.count()
    assert(sizes.min > n / 8, s"skewed shards: ${sizes.toSeq}")
    sh.unpersist()
  }

  test("shuffleToShards is deterministic and seed-sensitive") {
    val a = Sharding.shuffleToShards(docs, "doc_id", 4).select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    val b = Sharding.shuffleToShards(docs, "doc_id", 4).select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(a == b, "same seed must replay bit-identically")
    val c = Sharding.shuffleToShards(docs, "doc_id", 4, seed = 7L).select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(a != c, "a different seed must deal a different order")
  }

  test("writeShards: one exchange total, shard=K dirs, pos order persisted") {
    val out = java.nio.file.Files.createTempDirectory("graft-shard-spec").toString
    // the explicit repartition must satisfy the window's required
    // distribution — a second exchange means the plan regressed
    val plan = Sharding.shardedOrdered(docs, "doc_id", 4, 42L)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected exactly one exchange:\n$plan")

    Sharding.writeShards(docs, "doc_id", 4, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // read-back positions must equal the logical op's assignment
    val logical = Sharding.shuffleToShards(docs, "doc_id", 4)
      .select(col("doc_id"), col("shard").cast("long"), col("pos"))
      .as[(Long, Long, Long)].collect().toSet
    val persisted = back.select(col("doc_id"), col("shard").cast("long"), col("pos"))
      .as[(Long, Long, Long)].collect().toSet
    assert(persisted == logical)
    // PHYSICAL row order inside each shard file must be pos-ascending —
    // the documented data-loader handoff layout. Set equality above says
    // nothing about it; read each shard dir alone (single file → scan
    // preserves file order) and assert the sequence.
    new java.io.File(out).listFiles().filter(_.isDirectory).foreach { d =>
      val pos = spark.read.parquet(d.toString).select(col("pos"))
        .as[Long].collect().toSeq
      assert(pos == pos.sorted, s"${d.getName}: rows not pos-ordered in file")
    }
  }
}
