package graft.examples

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Stage-by-stage timing of the char-ngram LSH dedup pipeline (the bench's
  * slowest query) — run against a scale dir to see where time goes.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val docs = Tables.load(spark, sfDir, "documents")
    val par = spark.sparkContext.defaultParallelism

    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    val spread = docs.select(col("doc_id").as("id"), col("text")).repartition(par)
    time("shingle-hashes only") {
      spread.select(Dedup.charShingleHashes(col("text"), 5).as("sh")).count()
    }
    time("shingles + signature") {
      spread.select(Dedup.minhashSignature(Dedup.charShingleHashes(col("text"), 5), 64).as("sig")).count()
    }
    time("sig + bands + bucket groupBy") {
      spread
        .select(col("id"), posexplode(Dedup.bandKeys(
          Dedup.minhashSignature(Dedup.charShingleHashes(col("text"), 5), 64), 64, 16)))
        .toDF("id", "band", "key")
        .groupBy("band", "key").agg(count(lit(1)).as("n")).count()
    }
    val buckets = spread
      .select(col("id"), posexplode(Dedup.bandKeys(
        Dedup.minhashSignature(Dedup.charShingleHashes(col("text"), 5), 64), 64, 16)))
      .toDF("id", "band", "key")
      .groupBy("band", "key").agg(count(lit(1)).as("n"))
    println("[profile] bucket size histogram (n -> buckets):")
    buckets.filter(col("n") > 1).groupBy("n").count().orderBy(col("n").desc).limit(12)
      .collect().foreach(r => println(s"[profile]   size ${r.get(0)} x ${r.get(1)}"))
    // diagnostic raw-pair count OUTSIDE the timed thunk: time() runs the
    // thunk twice (warm + timed), so an embedded second action would both
    // double-print the line and inflate this stage to ~2 pipeline
    // executions while every other stage times one
    val pairPipeline = spread
      .select(col("id"), posexplode(Dedup.bandKeys(
        Dedup.minhashSignature(Dedup.charShingleHashes(col("text"), 5), 64), 64, 16)))
      .toDF("id", "band", "key")
      .groupBy("band", "key").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= 1000)
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
    println(s"[profile]   raw pair rows: ${pairPipeline.count()}")
    time("candidate pairs (distinct)") {
      pairPipeline.distinct().count()
    }
    time("full ngram near-dup") {
      Dedup.ngramJaccardNearDupPairs(docs, "doc_id", "text", bands = 16).count()
    }
    spark.stop()
  }
}
