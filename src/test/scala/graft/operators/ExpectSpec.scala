package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ExpectSpec extends SparkSuite {
  import spark.implicits._

  test("each check fails on a planted violation and passes on clean data") {
    val clean = Seq((1L, "a", 5.0), (2L, "b", 7.0)).toDF("id", "s", "v")
    val dirty = Seq((1L, "a", 5.0), (1L, null: String, 99.0)).toDF("id", "s", "v")
    def row(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect()(0); (r.getLong(1), r.getBoolean(2))
    }
    assert(row(Expect.uniqueKey(clean, "id")) == (0L, true))
    assert(row(Expect.uniqueKey(dirty, "id")) == (1L, false))
    assert(row(Expect.notNull(clean, "s")) == (0L, true))
    assert(row(Expect.notNull(dirty, "s")) == (1L, false))
    assert(row(Expect.notNull(dirty, "s", maxFrac = 0.5)) == (1L, true))
    assert(row(Expect.inRange(clean, "v", 0.0, 10.0)) == (0L, true))
    assert(row(Expect.inRange(dirty, "v", 0.0, 10.0)) == (1L, false))
    assert(row(Expect.rowCountAtLeast(clean, 2)) == (2L, true))
    assert(row(Expect.rowCountAtLeast(clean, 3)) == (2L, false))
    val parent = Seq(1L, 2L).toDF("pid")
    val childOk = Seq(1L, 1L, 2L).toDF("cid")
    val childBad = Seq(1L, 9L).toDF("cid")
    assert(row(Expect.foreignKey(childOk, "cid", parent, "pid")) == (0L, true))
    assert(row(Expect.foreignKey(childBad, "cid", parent, "pid")) == (1L, false))
  }

  test("suite unions all checks into one frame") {
    val t = Seq((1L, "x")).toDF("id", "s")
    val got = Expect.suite(Seq(
      Expect.uniqueKey(t, "id"), Expect.notNull(t, "s"), Expect.rowCountAtLeast(t, 1)))
    assert(got.count() == 3)
    assert(got.filter(col("ok") === false).count() == 0)
  }

  test("checkTable fuses all scan checks into ONE scan of the table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-expect").toString
    Seq((1L, "a", 5.0), (2L, "b", 7.0), (3L, null: String, 99.0))
      .toDF("id", "s", "v").write.mode("overwrite").parquet(dir)
    val t = spark.read.parquet(dir)
    val fused = Expect.checkTable(t, Seq(
      Expect.UniqueKey("id"),
      Expect.NotNull("s", maxFrac = 0.5),
      Expect.InRange("v", 0.0, 10.0),
      Expect.RowCountAtLeast(2)))
    // exactly one parquet scan in the physical plan despite four checks
    val scans = fused.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.length == 1, fused.queryExecution.sparkPlan.toString)
    val byName = fused.collect().map(r => (r.getString(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(byName("unique:id") == (0L, true))
    assert(byName("not_null:s") == (1L, true)) // 1 null of 3 ≤ 0.5
    assert(byName("range:v[0.0,10.0]") == (1L, false))
    assert(byName("rows>=2") == (3L, true))
  }
}
