package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge

import graft.{GraftSession, Tables}

/** Interleaved A/B isolating the r20 bounded-heap swap: the typed
  * `groupByKey.mapValues.agg(TopKAgg)` pipeline (the pre-r20 shape, kept
  * verbatim here) vs Catalyst's `CollectTopK` via
  * `graftbridge.collectTopK`, over the SAME materialized candidate
  * frame — the annKnnGraph ranking boundary without the ANN build in
  * the timed window. Both sides produce identical row multisets (pinned
  * by ScaleOpsSpec and the 181-query oracle); this measures only the
  * object-serialization boundary the swap removes.
  * Usage: `runMain graft.examples.TopkAb [sfDir] [pairs]`.
  */
object TopkAb {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pairs = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // candidate frame: the v3 ANN pair list, symmetrized like annKnnGraph
    val emb = Tables.load(spark, sfDir, "embeddings")
    val pDir = graft.queries.QueryTmp.dir("topkab") + "/pairs"
    graft.operators.Similarity.annCosinePairs(emb, "vec_id", "embedding", 64, 0.0, bits = 6)
      .write.parquet(pDir)
    val p = spark.read.parquet(pDir)
    val cands = p.select(col("id_a"), col("id_b"), col("sim"))
      .union(p.select(col("id_b").as("id_a"), col("id_a").as("id_b"), col("sim")))
    println(s"[topkab] candidate rows: ${cands.count()}")

    def runTyped(): Unit = {
      spark.sparkContext.setJobDescription("topkab: typed TopKAgg")
      val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
        .on[(Double, Long, Double)](t => (t._1, t._2))
      val topk =
        new graft.functions.Aggregators.TopKAgg[(Double, Long, Double)](3, ord).toColumn
      exec(cands.select(col("id_a").cast("long"), col("id_b").cast("long"), col("sim"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1).mapValues(t => (-t._3, t._2, t._3))
        .agg(topk)
        .toDF("qid", "top")
        .select(col("qid"), posexplode(col("top"))))
    }
    def runNative(): Unit = {
      spark.sparkContext.setJobDescription("topkab: native CollectTopK")
      exec(cands
        .groupBy(col("id_a").as("qid"))
        .agg(graftbridge.collectTopK(
          struct((-col("sim")).as("_1"), col("id_b").cast("long").as("_2"),
            col("sim").as("_3")), 3).as("top"))
        .select(col("qid"), posexplode(col("top"))))
    }

    runTyped(); runNative() // warm-up
    val ts = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ns = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to pairs).foreach { i =>
      val t0 = System.nanoTime(); runTyped(); ts += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); runNative(); ns += (System.nanoTime() - t1) / 1e9
      println(f"[topkab] pair $i: typed=${ts.last}%.3f s  native=${ns.last}%.3f s")
    }
    println(f"[topkab] TYPED  min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f")
    println(f"[topkab] NATIVE min=${ns.min}%.3f med=${ns.sorted.apply(ns.size / 2)}%.3f")
    spark.stop()
  }
}
