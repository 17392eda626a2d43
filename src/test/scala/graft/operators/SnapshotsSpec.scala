package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Snapshots

class SnapshotsSpec extends SparkSuite {
  import spark.implicits._

  test("commit/read: versions are immutable and pinnable; latest follows commits") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap").toString + "/t"
    assert(Snapshots.latestVersion(table).isEmpty)
    val v1 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table)
    val v2 = Snapshots.commit(Seq((1L, "a2"), (3L, "c")).toDF("id", "s"), table)
    assert((v1, v2) == (1, 2))
    assert(Snapshots.latestVersion(table).contains(2))
    assert(Snapshots.read(spark, table, Some(1)).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(Snapshots.read(spark, table).as[(Long, String)].collect().toSet ==
      Set((1L, "a2"), (3L, "c")))
  }

  test("drop refuses the latest version, removes pinned history on request") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap2").toString + "/t"
    Snapshots.commit(Seq(1L).toDF("id"), table)
    Snapshots.commit(Seq(2L).toDF("id"), table)
    intercept[IllegalArgumentException](Snapshots.drop(table, 2))
    assert(Snapshots.drop(table, 1))
    assert(!Snapshots.drop(table, 1)) // already gone
    assert(Snapshots.read(spark, table).as[Long].collect().toSeq == Seq(2L))
  }
}
