package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Compact

class CompactSpec extends SparkSuite {
  import spark.implicits._

  test("compact reduces file count and preserves content exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (0L until 5000L).map(i => (i, s"row$i")).toDF("id", "s")
    df.repartition(32).write.parquet(dir)
    val before = Compact.dataFileCount(dir)
    assert(before >= 16)
    val after = Compact.compact(spark, dir, targetBytes = 64L << 20)
    assert(after < before && after >= 1)
    val got = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(got == (0L until 5000L).map(i => (i, s"row$i")).toSet)
  }

  test("compact splits to multiple files when data exceeds the target") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact2").toString + "/t"
    val df = (0L until 20000L).map(i => (i, ("x" * 100) + i)).toDF("id", "s")
    df.repartition(16).write.parquet(dir)
    val bytes = Compact.dataBytes(dir)
    val after = Compact.compact(spark, dir, targetBytes = bytes / 3)
    assert(after >= 2 && after <= 8, s"expected a handful of files, got $after")
    assert(spark.read.parquet(dir).count() == 20000)
  }
}
