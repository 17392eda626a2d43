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

  test("spreadIfNarrow is the IDENTITY on pre-split input, repartitions narrow input") {
    val par = spark.sparkContext.defaultParallelism
    // narrow: a single in-memory partition → must spread to par
    val narrow = Seq.tabulate(100)(i => (i.toLong, s"doc $i")).toDF("id", "text")
      .coalesce(1)
    val spreadN = Dedup.spreadIfNarrow(narrow)
    assert(narrow.rdd.getNumPartitions == 1)
    assert(spreadN.rdd.getNumPartitions == par)
    assert(!(spreadN eq narrow), "narrow input must be repartitioned")

    // pre-split: at least `par` partitions → the SAME object comes back,
    // so no plan change and no Exchange can be introduced
    val wide = Seq.tabulate(100)(i => (i.toLong, s"doc $i")).toDF("id", "text")
      .repartition(par + 2)
    val spreadW = Dedup.spreadIfNarrow(wide)
    assert(spreadW eq wide, "pre-split input must pass through untouched")
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
