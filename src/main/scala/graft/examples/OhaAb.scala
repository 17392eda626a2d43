package graft.examples

import org.apache.spark.sql.DataFrame

import graft.{GraftSession, SparkEntry}

/** Interleaved A/B for the ObjectHashAggregate sort-based-fallback
  * threshold (default 128 distinct keys per partition — far below the
  * per-partition group counts the bounded-heap aggregates here see, so
  * the "hash" aggregate silently degrades to sort-based): times named
  * queries alternating threshold=default vs threshold=raised in one
  * session. Usage: `runMain graft.examples.OhaAb [sfDir] [n] name...`
  */
object OhaAb {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.1")
    val pairs = positional.drop(1).headOption.map(_.toInt).getOrElse(5)
    val names = positional.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run(thr: String): Double = {
        spark.conf.set(key, thr)
        spark.sparkContext.setJobDescription(s"ohaab: $name thr=$thr")
        val t0 = System.nanoTime()
        exec(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      run("128"); run("1000000") // warm-up both plans
      val d = scala.collection.mutable.ArrayBuffer.empty[Double]
      val r = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to pairs).foreach { i =>
        d += run("128"); r += run("1000000")
        println(f"[ohaab] $name pair $i: default=${d.last}%.3f s  raised=${r.last}%.3f s")
      }
      spark.conf.set(key, "128")
      println(f"[ohaab] $name DEFAULT min=${d.min}%.3f med=${d.sorted.apply(d.size / 2)}%.3f " +
        f"RAISED min=${r.min}%.3f med=${r.sorted.apply(r.size / 2)}%.3f")
    }
    spark.stop()
  }
}
