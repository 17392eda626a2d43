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
}
