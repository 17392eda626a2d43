package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, round}

import graft.{GraftSession, Tables}

/** Interleaved old-vs-new A/B for the v8b_knn_pagerank_weighted wall —
  * the r19 verdict's adjudication protocol (quiet session, alternated
  * old-tree/new-tree runs in the same minutes, min-of-N): every
  * post-r19-change SESSION read v8b slower than every pre-change
  * session, but the builder's same-window A/B said the opposite, so the
  * question is whether the r19 PageRank rework (static dangling flag +
  * literal n) actually regressed the operator or the sessions were
  * load-confounded.
  *
  * The edges fixture is built ONCE (the graph build is v7's regression
  * surface, not this one's); each side then runs the full weighted+
  * dangling 3-iteration PageRank the v8b gate runs, through the noop
  * sink. OLD = [[graft.operators.GraphPreR19]] (verbatim pre-r19
  * machinery), NEW = [[graft.operators.Graph.pageRank]]. A Bench-style
  * calibration sample brackets the run so the artifact records ambient
  * load. Usage: `runMain graft.examples.PrAb [sfDir] [pairs]`.
  */
object PrAb {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.1")
    val pairs = positional.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def calibrate(): Double = {
      val n = 2000000
      val workers = (1 to cpus).map { t =>
        new Thread(() => {
          var x = 0x9E3779B97F4A7C15L + t
          val a = new Array[Long](n)
          var i = 0
          while (i < n) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; a(i) = x; i += 1 }
          java.util.Arrays.sort(a)
        })
      }
      val t0 = System.nanoTime()
      workers.foreach(_.start())
      workers.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // JIT the sentinel
    val calibFirst = calibrate()

    val gateMode = args.contains("--gate")
    val emb = Tables.load(spark, sfDir, "embeddings")
    lazy val edgesFixture: DataFrame = {
      val eDir = graft.queries.QueryTmp.dir("prab") + "/edges"
      graft.operators.Similarity.annKnnGraph(emb, "vec_id", "embedding", 64, k = 3, bits = 6)
        .write.parquet(eDir)
      spark.read.parquet(eDir)
    }
    // --gate: the FULL v8b body (LAZY annKnnGraph edges, rebuilt per run
    // — what the gate and the bench actually time); default: pre-built
    // parquet edges isolating the PageRank machinery alone
    def edges: DataFrame =
      if (gateMode)
        graft.operators.Similarity.annKnnGraph(emb, "vec_id", "embedding", 64, k = 3, bits = 6)
      else edgesFixture

    def runNew(): Unit = {
      spark.sparkContext.setJobDescription("prab: NEW v8b pagerank")
      exec(graft.operators.Graph.pageRank(edges, "vec_id", "neighbor", emb, "vec_id",
        iters = 3, damping = 0.85, weightCol = Some("sim"), redistributeDangling = true)
        .select(col("vec_id"), round(col("pagerank"), 8).as("pagerank")))
    }
    def runOld(): Unit = {
      spark.sparkContext.setJobDescription("prab: OLD v8b pagerank")
      val (pr, release) = graft.operators.GraphPreR19.pageRankWithRelease(
        edges, "vec_id", "neighbor", emb, "vec_id",
        iters = 3, damping = 0.85, weightCol = Some("sim"), redistributeDangling = true)
      try exec(pr.select(col("vec_id"), round(col("pagerank"), 8).as("pagerank")))
      finally release()
    }

    // one warm-up each (plan compile + codegen), then interleaved pairs
    runOld(); runNew()
    val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val news = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to pairs).foreach { i =>
      val t0 = System.nanoTime(); runOld(); olds += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); runNew(); news += (System.nanoTime() - t1) / 1e9
      println(f"[prab] pair $i: old=${olds.last}%.3f s  new=${news.last}%.3f s")
    }
    val calibLast = calibrate()
    println(f"[prab] OLD min=${olds.min}%.3f med=${olds.sorted.apply(olds.size / 2)}%.3f " +
      f"all=${olds.map(d => f"$d%.3f").mkString(",")}")
    println(f"[prab] NEW min=${news.min}%.3f med=${news.sorted.apply(news.size / 2)}%.3f " +
      f"all=${news.map(d => f"$d%.3f").mkString(",")}")
    println(f"[prab] calib_first=$calibFirst%.3f calib_last=$calibLast%.3f " +
      f"(clean-machine reference 0.28-0.30)")
    spark.stop()
  }
}
