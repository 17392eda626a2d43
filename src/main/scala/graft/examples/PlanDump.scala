package graft.examples

import graft.{GraftSession, SparkEntry}

/** Prints the formatted physical plan of declared queries — the
  * plan-audit loop the build brief mandates (check pushdown, broadcast
  * choices, WholeStageCodegen spans) without editing test code.
  *
  * Usage: runMain graft.examples.PlanDump <sfDir> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
