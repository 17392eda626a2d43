package graft

import org.apache.spark.sql.functions._

import graft.functions.Aggregators.MisraGriesAgg

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  test("Misra-Gries guarantee: every item with freq > N/(k+1) is a candidate") {
    // skewed synthetic stream: item i appears 2^(12-i) times, plus noise
    val heavy = (0 until 8).flatMap(i => Seq.fill(1 << (12 - i))(s"h$i"))
    val noise = (0 until 3000).map(i => s"n$i")
    val stream = scala.util.Random.shuffle(heavy ++ noise)

    val k = 64
    val agg = new MisraGriesAgg(k)
    // fold through reduce in chunks + merge, as Spark's partial
    // aggregation would
    val parts = stream.grouped(500).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val candidates = agg.finish(parts.reduce(agg.merge)).toSet

    val n = stream.size
    val counts = stream.groupBy(identity).view.mapValues(_.size.toLong)
    val mustSurvive = counts.filter(_._2 > n / (k + 1)).keys.toSet
    assert(mustSurvive.nonEmpty, "fixture must contain heavy hitters")
    assert(mustSurvive.subsetOf(candidates),
      s"MG lost guaranteed heavy hitters: ${mustSurvive -- candidates}")
    assert(candidates.size <= k, s"summary exceeded k: ${candidates.size}")
  }

  test("Misra-Gries buffer never exceeds k under reduce or merge") {
    val agg = new MisraGriesAgg(4)
    val m = (0 until 100).map(i => s"t${i % 13}")
      .foldLeft(agg.zero)(agg.reduce)
    assert(m.size <= 4)
    val merged = agg.merge(m, m)
    assert(merged.size <= 4)
  }

  test("sk3 exact recount equals a full exact top-3 (sketch proposes, recount decides)") {
    val got = SparkEntry.queries("sk3_heavy_hitters")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // full exact computation, no sketch
    val toks = Tables.load(spark, sf0001, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("token").asc)
    val want = toks.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 3).select(col("lang"), col("token"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("streaming heavy hitters (sk4) equals the batch path (sk3)") {
    val batch = SparkEntry.queries("sk3_heavy_hitters")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val streamed = SparkEntry.queries("sk4_heavy_hitters_stream")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"micro-batch-merged MG state diverged from the batch sketch: $streamed vs $batch")
  }

  test("sk1/sk2 approx bounds hold (the gate booleans are all true)") {
    val sk1 = SparkEntry.queries("sk1_approx_distinct")(spark, sf0001).collect()
    assert(sk1.nonEmpty && sk1.forall(_.getBoolean(2)), "HLL estimate out of bound")
    val sk2 = SparkEntry.queries("sk2_approx_quantiles")(spark, sf0001).collect()
    assert(sk2.nonEmpty && sk2.forall(_.getBoolean(4)), "approx quantile out of bound")
  }
}
