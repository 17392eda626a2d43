package graft.operators

import graft.SparkSuite

class DriftSpec extends SparkSuite {
  import spark.implicits._

  test("JS divergence: identical slices 0, disjoint vocabularies ln 2") {
    val a = Seq("x y z", "x x").toDF("text")
    val b = Seq("p q", "p r r").toDF("text")
    val same = Drift.tokenJsDivergence(a, a, "text").collect()(0)
    assert(same.getAs[Long]("n_tokens_a") == 5 && same.getAs[Double]("js_nats") == 0.0)
    val disjoint = Drift.tokenJsDivergence(a, b, "text").collect()(0)
    assert(disjoint.getAs[Double]("js_nats") == 0.6931, s"expected ln 2: $disjoint")
  }

  test("JS divergence is symmetric and between 0 and ln 2 for overlapping slices") {
    val a = Seq("x y y z").toDF("text")
    val b = Seq("x x w").toDF("text")
    val ab = Drift.tokenJsDivergence(a, b, "text").collect()(0).getAs[Double]("js_nats")
    val ba = Drift.tokenJsDivergence(b, a, "text").collect()(0).getAs[Double]("js_nats")
    assert(ab == ba)
    assert(ab > 0.0 && ab < 0.6931)
  }
}
