package graft.operators

import graft.SparkSuite

class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def localPageRank(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int, d: Double): Map[Long, Double] = {
    val n = nodes.size.toDouble
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => pr(s) / deg(s) }.sum).toMap
      pr = nodes.map(v => v -> ((1.0 - d) / n + d * in.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  /** Weighted + dangling-redistribution local replay: pr·w/W(u) inflow,
    * plus the per-round dangling sum spread uniformly.
    */
  private def localWeightedPageRank(nodes: Seq[Long], edges: Seq[(Long, Long, Double)],
      iters: Int, d: Double, redistribute: Boolean): Map[Long, Double] = {
    val n = nodes.size.toDouble
    val wsum = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => pr(s) * w / wsum(s) }.sum).toMap
      val dm = if (redistribute) nodes.filterNot(wsum.contains).map(pr).sum else 0.0
      pr = nodes.map(v =>
        v -> ((1.0 - d) / n + d * (in.getOrElse(v, 0.0) + dm / n))).toMap
    }
    pr
  }

  test("pageRank: cycle is stationary-uniform; star concentrates; dangling mass drops") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val prC = Graph.pageRank(cycle, "src", "dst", nodes, "id", iters = 5)
      .as[(Long, Double)].collect().toMap
    // uniform is the cycle's fixed point: every iteration reproduces 1/3
    prC.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    // star 2→1, 3→1: node 1 absorbs, and (node 1 dangling) total mass
    // SHRINKS by contract — not a conservation bug
    val star = Seq((2L, 1L), (3L, 1L)).toDF("src", "dst")
    val prS = Graph.pageRank(star, "src", "dst", nodes, "id", iters = 2)
      .as[(Long, Double)].collect().toMap
    val exp = localPageRank(Seq(1L, 2L, 3L), Seq((2L, 1L), (3L, 1L)), 2, 0.85)
    exp.foreach { case (v, p) => assert(math.abs(prS(v) - p) < 1e-12, s"node $v") }
    assert(prS(1L) > prS(2L) && prS.values.sum < 1.0)
  }

  test("pageRank over annKnnGraph releases EVERY stacked cache after the first action") {
    val rnd = new scala.util.Random(3)
    val emb = (1L to 60L).map(i => (i, Array.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    emb.count()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Similarity.annKnnGraph(emb, "vec_id", "embedding", 8, k = 3,
      bits = 2, tables = 6)
    val pr = Graph.pageRank(edges, "vec_id", "neighbor", emb, "vec_id")
    assert(pr.count() == 60)
    // pageRank's edge pin STACKS over annKnnGraph's projection cache: a
    // logical-plan-only release listener never sees the inner relation
    // (it hides inside the outer InMemoryRelation's cached physical
    // plan) and the corpus-sized projection leaks for the session — the
    // nested traversal in CacheRelease is what this pins. Listeners ride
    // the async bus — poll.
    val deadline = System.nanoTime() + 10000000000L
    def lingering = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    while (lingering.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(lingering.isEmpty, s"stacked caches survived the action: $lingering")
  }

  test("weighted pageRank with dangling redistribution matches the local replay") {
    val rnd = new scala.util.Random(11)
    val nodes = (1L to 30L)
    // node 30 (and any node the draw misses as a source) is dangling
    val edges = Seq.fill(80)((rnd.nextInt(25) + 1L, rnd.nextInt(30) + 1L,
        math.rint(rnd.nextDouble() * 100) / 100 + 0.01))
      .filter(e => e._1 != e._2).distinctBy(e => (e._1, e._2))
    val df = edges.toDF("src", "dst", "w")
    val got = Graph.pageRank(df, "src", "dst", nodes.toDF("id"), "id",
        iters = 3, weightCol = Some("w"), redistributeDangling = true)
      .as[(Long, Double)].collect().toMap
    val exp = localWeightedPageRank(nodes, edges, 3, 0.85, redistribute = true)
    nodes.foreach(v => assert(math.abs(got(v) - exp(v)) < 1e-12, s"node $v"))
    // with redistribution on, total mass is conserved at 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass = ${got.values.sum}")
    // weighted WITHOUT redistribution also replays (and loses mass here)
    val gotNoRd = Graph.pageRank(df, "src", "dst", nodes.toDF("id"), "id",
        iters = 3, weightCol = Some("w"))
      .as[(Long, Double)].collect().toMap
    val expNoRd = localWeightedPageRank(nodes, edges, 3, 0.85, redistribute = false)
    nodes.foreach(v => assert(math.abs(gotNoRd(v) - expNoRd(v)) < 1e-12, s"node $v"))
    assert(gotNoRd.values.sum < 1.0)
    // uniform weights reduce to the unweighted form — same per-node
    // contributions, so any difference is only the float SUM ORDER of
    // Spark's partial-aggregate merge (not guaranteed stable across
    // runs; a 1-ULP flake was observed r17): assert to 4 ULPs, not
    // bitwise
    val uni = edges.map { case (s, d, _) => (s, d, 1.0) }
    val gotUni = Graph.pageRank(uni.toDF("src", "dst", "w"), "src", "dst",
        nodes.toDF("id"), "id", iters = 3, weightCol = Some("w"))
      .as[(Long, Double)].collect().toMap
    val gotPlain = Graph.pageRank(uni.map(e => (e._1, e._2)).toDF("src", "dst"), "src", "dst",
        nodes.toDF("id"), "id", iters = 3)
      .as[(Long, Double)].collect().toMap
    nodes.foreach { v =>
      assert(math.abs(gotUni(v) - gotPlain(v)) <= 4 * math.ulp(gotPlain(v)),
        s"node $v: ${gotUni(v)} vs ${gotPlain(v)}")
    }
  }

  test("truncateLineage: a SECOND action returns identical ranks without replay blowup") {
    val rnd = new scala.util.Random(13)
    val nodes = (1L to 25L)
    val edges = Seq.fill(60)((rnd.nextInt(20) + 1L, rnd.nextInt(25) + 1L,
        math.rint(rnd.nextDouble() * 100) / 100 + 0.01))
      .filter(e => e._1 != e._2).distinctBy(e => (e._1, e._2))
    val df = edges.toDF("src", "dst", "w")
    // values identical to the replayable default, bit for bit
    val replayable = Graph.pageRank(df, "src", "dst", nodes.toDF("id"), "id",
        iters = 4, weightCol = Some("w"), redistributeDangling = true)
      .as[(Long, Double)].collect().toMap
    val truncated = Graph.pageRank(df, "src", "dst", nodes.toDF("id"), "id",
        iters = 4, weightCol = Some("w"), redistributeDangling = true,
        truncateLineage = true)
    // lineage is actually truncated: the analyzed plan bottoms out at a
    // materialized RDD scan, not the unrolled join chain
    import org.apache.spark.sql.execution.LogicalRDD
    assert(truncated.queryExecution.analyzed.collectLeaves()
      .forall(_.isInstanceOf[LogicalRDD]), "plan must read the checkpoint, not the lineage")
    val first = truncated.as[(Long, Double)].collect().toMap
    assert(first == replayable)
    // the 2^iters footgun is gone: the second action is a bare
    // checkpoint read — count the jobs it schedules
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val second = truncated.as[(Long, Double)].collect().toMap
      // listener events are async — give the bus a moment to drain
      Thread.sleep(300)
      assert(second == first)
      assert(jobs.get() <= 2, s"second action scheduled ${jobs.get()} jobs — lineage replayed")
    } finally spark.sparkContext.removeSparkListener(listener)
    org.apache.spark.sql.graftbridge.releaseCheckpoints(truncated)
  }

  test("weighted pageRank fails loudly on null/negative weights and all-zero sources; benign zeros pass") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    // a source whose TOTAL out-weight is zero would serve 0/0 = NaN to
    // every destination — loud, named after the source
    val zeroSrc = Seq((1L, 2L, 0.0), (2L, 3L, 1.0)).toDF("src", "dst", "w")
    val e1 = intercept[Exception] {
      Graph.pageRank(zeroSrc, "src", "dst", nodes, "id", iters = 1,
        weightCol = Some("w")).collect()
    }
    assert(e1.getMessage.contains("non-positive total out-weight"), e1.getMessage)
    val nullW = Seq((1L, 2L, Some(1.0)), (2L, 3L, Option.empty[Double]))
      .toDF("src", "dst", "w")
    val e2 = intercept[Exception] {
      Graph.pageRank(nullW, "src", "dst", nodes, "id", iters = 1,
        weightCol = Some("w")).collect()
    }
    assert(e2.getMessage.contains("null or negative weight"), e2.getMessage)
    val negW = Seq((1L, 2L, -0.5), (1L, 3L, 1.0)).toDF("src", "dst", "w")
    val e3 = intercept[Exception] {
      Graph.pageRank(negW, "src", "dst", nodes, "id", iters = 1,
        weightCol = Some("w")).collect()
    }
    assert(e3.getMessage.contains("null or negative weight"), e3.getMessage)
    // a BENIGN zero (source still has positive total) passes — the
    // annKnnGraph round(cos,6)=0.0 tie must not trip the guard — and a
    // zero-weight edge carries exactly no mass
    val benign = Seq((1L, 2L, 0.0), (1L, 3L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "w")
    val got = Graph.pageRank(benign, "src", "dst", nodes, "id", iters = 2,
        weightCol = Some("w"))
      .as[(Long, Double)].collect().toMap
    val exp = localWeightedPageRank(Seq(1L, 2L, 3L),
      Seq((1L, 3L, 1.0), (2L, 3L, 1.0)), 2, 0.85, redistribute = false)
    Seq(1L, 2L, 3L).foreach(v =>
      assert(math.abs(got(v) - exp(v)) < 1e-12, s"node $v: ${got(v)} vs ${exp(v)}"))
  }

  test("pageRankConverged stops at the fixed point and matches a long fixed-iteration run") {
    // the cycle's fixed point IS the uniform init: the first round
    // reproduces 1/3 exactly, so convergence detects after ONE round
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val (prC, roundsC) = Graph.pageRankConverged(cycle, "src", "dst", nodes, "id",
      tol = 1e-12, maxIters = 50)
    assert(roundsC == 1, s"cycle should converge in one round, took $roundsC")
    prC.as[(Long, Double)].collect().foreach { case (_, p) =>
      assert(math.abs(p - 1.0 / 3) < 1e-12)
    }
    org.apache.spark.sql.graftbridge.releaseCheckpoints(prC)
    // a random digraph converges to the same ranks a LONG local
    // fixed-iteration replay reaches (weighted + dangling mode, so the
    // shared round function is exercised on its richest path)
    val rnd = new scala.util.Random(23)
    val allNodes = (1L to 30L)
    val edges = Seq.fill(80)((rnd.nextInt(25) + 1L, rnd.nextInt(30) + 1L,
        math.rint(rnd.nextDouble() * 100) / 100 + 0.01))
      .filter(e => e._1 != e._2).distinctBy(e => (e._1, e._2))
    val df = edges.toDF("src", "dst", "w")
    val (got, rounds) = Graph.pageRankConverged(df, "src", "dst", allNodes.toDF("id"), "id",
      tol = 1e-10, maxIters = 200, weightCol = Some("w"), redistributeDangling = true)
    assert(rounds > 1 && rounds < 200, s"rounds = $rounds")
    val gotMap = got.as[(Long, Double)].collect().toMap
    val exp = localWeightedPageRank(allNodes, edges, 200, 0.85, redistribute = true)
    allNodes.foreach(v => assert(math.abs(gotMap(v) - exp(v)) < 1e-8, s"node $v"))
    // redistribution conserves mass at the fixed point
    assert(math.abs(gotMap.values.sum - 1.0) < 1e-9)
    org.apache.spark.sql.graftbridge.releaseCheckpoints(got)
    // maxIters caps an unmixed walk and reports the rounds actually run
    val (capped, cappedRounds) = Graph.pageRankConverged(df, "src", "dst",
      allNodes.toDF("id"), "id", tol = 1e-300, maxIters = 2)
    assert(cappedRounds == 2)
    org.apache.spark.sql.graftbridge.releaseCheckpoints(capped)
    intercept[IllegalArgumentException](
      Graph.pageRankConverged(df, "src", "dst", allNodes.toDF("id"), "id", tol = 0.0))
    intercept[IllegalArgumentException](
      Graph.pageRankConverged(df, "src", "dst", allNodes.toDF("id"), "id", maxIters = 0))
  }

  test("pageRank matches the local replay on a random sparse digraph") {
    val rnd = new scala.util.Random(7)
    val nodes = (1L to 40L)
    val edges = Seq.fill(120)((rnd.nextInt(40) + 1L, rnd.nextInt(40) + 1L))
      .filter(e => e._1 != e._2).distinct
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        nodes.toDF("id"), "id", iters = 3)
      .as[(Long, Double)].collect().toMap
    val exp = localPageRank(nodes, edges, 3, 0.85)
    nodes.foreach(v => assert(math.abs(got(v) - exp(v)) < 1e-12, s"node $v"))
    intercept[IllegalArgumentException](
      Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", nodes.toDF("id"), "id", 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", nodes.toDF("id"), "id",
        3, damping = 1.0))
  }

  test("above the broadcast threshold (co-partitioned caches) ranks match the broadcast path") {
    // r19 optimization: rank vectors above spark.graft.pagerank.
    // broadcastNodes switch every round's join onto caches pre-laid-out
    // partitioned+sorted on the join keys. Force that path (threshold 1)
    // and pin it against the default path on all three mode combinations
    // — values may differ only in partial-sum order, which COMPOUNDS
    // geometrically over rounds (×1/(1−d) per round) and whose grouping
    // depends on the host's parallelism: bound at 1e-9 RELATIVE, not a
    // ULP count (review finding — a 4-ULP bound is environment-shaped).
    val rnd = new scala.util.Random(23)
    val nodes = (1L to 30L)
    val edges = Seq.fill(90)((rnd.nextInt(25) + 1L, rnd.nextInt(30) + 1L,
        math.rint(rnd.nextDouble() * 100) / 100 + 0.01))
      .filter(e => e._1 != e._2).distinctBy(e => (e._1, e._2))
    val df = edges.toDF("src", "dst", "w")
    def runAll(): Seq[Map[Long, Double]] = Seq(
      Graph.pageRank(df, "src", "dst", nodes.toDF("id"), "id", iters = 3)
        .as[(Long, Double)].collect().toMap,
      Graph.pageRank(df, "src", "dst", nodes.toDF("id"), "id", iters = 3,
          weightCol = Some("w"), redistributeDangling = true)
        .as[(Long, Double)].collect().toMap, {
        val (pr, _) = Graph.pageRankConverged(df, "src", "dst", nodes.toDF("id"), "id",
          tol = 1e-9, maxIters = 60, weightCol = Some("w"), redistributeDangling = true)
        val m = pr.as[(Long, Double)].collect().toMap
        org.apache.spark.sql.graftbridge.releaseCheckpoints(pr)
        m
      })
    val bcast = runAll()
    spark.conf.set("spark.graft.pagerank.broadcastNodes", "1")
    try {
      val smj = runAll()
      bcast.zip(smj).zipWithIndex.foreach { case ((b, s), i) =>
        nodes.foreach { v =>
          assert(math.abs(b(v) - s(v)) <= 1e-9 * math.abs(b(v)),
            s"mode $i node $v: ${b(v)} vs ${s(v)}")
        }
      }
    } finally spark.conf.unset("spark.graft.pagerank.broadcastNodes")
  }
}
