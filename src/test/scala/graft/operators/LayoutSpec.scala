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

  test("zValueN (k=3) equals the JVM twin; k=2 keeps the classic convention") {
    // the round-robin generalization at k=2 IS the classic a-even/b-odd
    // interleave — zo1's on-disk z values are unchanged by the k-ary form
    for (a <- 0L until 8L; b <- 0L until 8L)
      assert(ZOrderFunctions.zOf(a, b, 3) == ZOrderFunctions.zOfN(Seq(a, b), 3))
    val pts = for (a <- 0L until 8L; b <- 0L until 8L; c <- 0L until 8L) yield (a, b, c)
    val got = pts.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        ZOrderFunctions.zValueN(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    pts.foreach { case (a, b, c) =>
      assert(got((a, b, c)) == ZOrderFunctions.zOfN(Seq(a, b, c), 3), s"($a,$b,$c)")
    }
    // the curve is a bijection on the cube
    assert(got.values.toSet.size == pts.size)
  }

  test("zValueN rejects k*bits > 63 and out-of-range coordinates") {
    intercept[IllegalArgumentException] {
      ZOrderFunctions.zOfN(Seq(1L, 2L, 3L), 22) // 3*22 = 66 > 63
    }
    val ex = intercept[Exception] {
      Seq((1L, 2L, 300L)).toDF("a", "b", "c")
        .select(ZOrderFunctions.zValueN(Seq(col("a"), col("b"), col("c")), 8)).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(c => Option(c.getMessage).exists(_.contains("outside [0, 2^8)"))),
      s"got: ${chain(ex).map(_.getMessage)}")
  }

  test("3-column z-order layout tightens ALL non-leading envelopes vs a single-column sort") {
    // 16^3 grid: under the 3-way curve each of 8 files covers a curve
    // octant (~half the range per axis); an a-sorted layout carries the
    // FULL b and c ranges in every file
    val pts = (for (a <- 0L until 16L; b <- 0L until 16L; c <- 0L until 16L)
      yield (a, b, c)).toDF("a", "b", "c")
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder3").toString + "/z"
    val aDir = java.nio.file.Files.createTempDirectory("graft-zorder3").toString + "/a"
    Layout.zorderWriteN(pts, Seq("a", "b", "c"), bits = 4, numFiles = 8, path = zDir)
    pts.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(aDir)

    def spans(path: String): Seq[(Long, Long)] =
      Layout.fileEnvelopes(spark, path, Seq("b", "c"))
        .select(col("max_b") - col("min_b"), col("max_c") - col("min_c"))
        .as[(Long, Long)].collect().toSeq
    val z = spans(zDir); val s1 = spans(aDir)
    assert(z.size == 8 && s1.size == 8, s"files: z=${z.size} a-sort=${s1.size}")
    assert(s1.forall(p => p._1 == 15L && p._2 == 15L), s"a-sorted b/c spans: $s1")
    // summed envelope tightness on BOTH non-leading axes (same aggregate
    // criterion as the 2-column test; sampled range boundaries mean
    // individual files can straddle an octant)
    assert(z.map(_._1).sum * 4 <= s1.map(_._1).sum * 3,
      s"z-layout must tighten b envelope by >=25%: ${z.map(_._1).sum} vs ${s1.map(_._1).sum}")
    assert(z.map(_._2).sum * 4 <= s1.map(_._2).sum * 3,
      s"z-layout must tighten c envelope by >=25%: ${z.map(_._2).sum} vs ${s1.map(_._2).sum}")
    // content survives the layout rewrite
    assert(spark.read.parquet(zDir).count() == 16L * 16L * 16L)
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
