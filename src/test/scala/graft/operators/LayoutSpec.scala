package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.ZOrderFunctions

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zValue expression equals the JVM twin (interpreted and codegen paths)") {
    val pts = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrderFunctions.zValue(col("a"), col("b"), 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == ZOrderFunctions.zOf(a, b, 5), s"($a,$b)")
    }
    // the curve is a bijection on the grid
    assert(got.values.toSet.size == pts.size)
  }

  test("zValue fails loudly on out-of-range coordinates") {
    val ex = intercept[Exception] {
      Seq((5000L, 1L)).toDF("a", "b")
        .select(ZOrderFunctions.zValue(col("a"), col("b"), 10)).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(c => Option(c.getMessage).exists(_.contains("outside [0, 2^10)"))),
      s"got: ${chain(ex).map(_.getMessage)}")
  }

  test("z-order layout keeps BOTH column envelopes tight; single-column sort does not") {
    // uniform 2-D grid: under a z-layout each of the 4 files covers a
    // contiguous curve quadrant, so per-file min-max spans ~half the
    // range on BOTH axes; under an a-sorted layout each file spans the
    // FULL b range — the data-skipping difference this operator exists
    // for, asserted on the actual written artifacts
    val pts = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString + "/z"
    val aDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString + "/a"
    Layout.zorderWrite(pts, "a", "b", bits = 6, numFiles = 4, path = zDir)
    pts.repartitionByRange(4, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(aDir)

    def spans(path: String): Seq[(Long, Long)] =
      Layout.fileEnvelopes(spark, path, Seq("a", "b"))
        .select(col("max_a") - col("min_a"), col("max_b") - col("min_b"))
        .as[(Long, Long)].collect().toSeq
    val z = spans(zDir); val s1 = spans(aDir)
    assert(z.size == 4 && s1.size == 4, s"files: z=${z.size} a-sort=${s1.size}")
    // a-sorted: every file carries b's full range (63). z-layout: the
    // SUMMED b envelope must shrink materially (range boundaries are
    // sampled, so individual files can straddle a curve quadrant — the
    // aggregate tightness is the data-skipping property, and is what a
    // stats-based reader's expected skip rate integrates over)
    assert(s1.forall(_._2 == 63L), s"a-sorted b-spans: $s1")
    val zTotalB = z.map(_._2).sum
    val aTotalB = s1.map(_._2).sum
    assert(zTotalB * 4 <= aTotalB * 3,
      s"z-layout must tighten the b envelope by >=25%: z=$zTotalB vs a-sort=$aTotalB (z spans: $z)")
    // content survives the layout rewrite
    assert(spark.read.parquet(zDir).count() == 64L * 64L)
    assert(spark.read.parquet(zDir).as[(Long, Long)].collect().toSet ==
      (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toSet)
  }
}
