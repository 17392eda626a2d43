package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The conditional parallelism spread (r6 verdict item 5): the LSH/ANN
  * sketch stages must NOT shuffle the corpus when the scan already
  * yields enough splits — `spreadIfNarrow` is the identity there (same
  * DataFrame object, no Exchange possible), and only repartitions the
  * narrow small-file case.
  */
class SpreadSpec extends SparkSuite {
  import spark.implicits._

  test("spreadIfNarrow is the IDENTITY on pre-split input, repartitions narrow scans") {
    val par = spark.sparkContext.defaultParallelism
    // narrow: ONE small parquet file → one scan split (an explicit
    // coalesce/repartition in the plan would instead be respected as the
    // user's choice — that's the wide-plan rule below)
    val dir = java.nio.file.Files.createTempDirectory("graft-spread1").toString
    Seq.tabulate(100)(i => (i.toLong, s"doc $i")).toDF("id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val narrow = spark.read.parquet(dir)
    assert(narrow.rdd.getNumPartitions == 1)
    val spreadN = Dedup.spreadIfNarrow(narrow)
    assert(spreadN.rdd.getNumPartitions == par)
    assert(!(spreadN eq narrow), "narrow scan must be repartitioned")
  }

  test("wide plans (existing shuffle) skip probe AND spread — no AQE stage materialization") {
    // an aggregate already emits shuffle.partitions; probing .rdd on it
    // under AQE would RUN the aggregation at pipeline-construction time
    val agg = Seq.tabulate(100)(i => (i.toLong % 5, s"doc $i")).toDF("id", "text")
      .groupBy("id").agg(count(lit(1)).as("n"))
    assert(Dedup.spreadIfNarrow(agg) eq agg)
  }

  test("file scans with enough splits skip the spread (the 100 TB case)") {
    val par = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("graft-spread").toString
    // par+4 files → the parquet scan arrives pre-split past defaultParallelism
    Seq.tabulate(500)(i => (i.toLong, s"text of document number $i"))
      .toDF("id", "text").repartition(par + 4)
      .write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    assert(scan.rdd.getNumPartitions >= par, "fixture must arrive pre-split")
    assert(Dedup.spreadIfNarrow(scan) eq scan)
  }
}
