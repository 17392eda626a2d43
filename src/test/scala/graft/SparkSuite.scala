package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one JVM-wide session, as the
  * reference's `TestEnvironment` shares one local cluster
  * (reference `tests/Common/TestEnvironment.fs:16-156`).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession
      .builder("local[4]", "graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  def sf0001 = "/root/testdata/sf0.001"
  def sf001 = "/root/testdata/sf0.01"
}
