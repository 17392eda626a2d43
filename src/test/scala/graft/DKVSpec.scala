package graft

import graft.dset.DSet
import graft.dset.DSet._

/** Key-value operator tests, including the reference's parameterized
  * join-geometry matrices over bin-overlap edge cases
  * (reference `tests/CoreLib/DKV.fs:255-508`, case tables at 345-357;
  * FIXTURES.md §1).
  */
class DKVSpec extends SparkSuite {
  import spark.implicits._

  private def pairs(n: Int = 200, keys: Int = 10): DSet[(Int, Int)] =
    DSet.distribute(spark, (0 until n).map(i => (i % keys, i)), 4)

  test("filterByKey / mapByValue") {
    val d = pairs()
    assert(d.filterByKey(_ < 3).count() == (0 until 200).count(_ % 10 < 3))
    val mapped = d.mapByValue(_ * 2).toArray
    mapped.foreach { case (k, v) => assert(v % 2 == 0 && (v / 2) % 10 == k) }
  }

  test("groupByKey groups all values per key") {
    val got = pairs().groupByKey.toArray.toMap
    val exp = (0 until 200).groupBy(_ % 10)
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, vs) => assert(vs.sorted == exp(k).sorted) }
  }

  test("groupByKeyN groups identically at an explicit partition count") {
    val d = pairs().groupByKeyN(4)
    assert(d.ds.rdd.getNumPartitions == 4)
    val got = d.toArray.toMap
    val exp = (0 until 200).groupBy(_ % 10)
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, vs) => assert(vs.sorted == exp(k).sorted) }
  }

  test("reduceByKey matches local oracle (map-side combine path)") {
    val got = pairs().reduceByKey(_ + _).toArray.toMap
    val exp = (0 until 200).groupBy(_ % 10).view.mapValues(_.sum).toMap
    assert(got == exp)
  }

  test("repartitionPByKey routes by exact user key function") {
    val d = pairs(100, 20).repartitionPByKey(4)(k => k % 4)
    val parts = d.ds.rdd.glom().collect()
    parts.zipWithIndex.foreach { case (arr, pi) =>
      arr.foreach { case (k, _) => assert(k % 4 == pi) }
    }
    assert(parts.map(_.length).sum == 100)
  }

  test("binSortPByKey: bin routing + in-bin key order") {
    val shuffled = scala.util.Random.shuffle((0 until 300).toList).map(i => (i, i.toString))
    val d = DSet.distribute(spark, shuffled, 4).binSortPByKey(3)(k => k / 100)
    val parts = d.ds.rdd.glom().collect()
    assert(parts.length == 3)
    parts.zipWithIndex.foreach { case (arr, pi) =>
      val ks = arr.map(_._1).toSeq
      assert(ks == ks.sorted, s"partition $pi keys not sorted")
      ks.foreach(k => assert(k / 100 == pi))
    }
    assert(parts.flatten.map(_._1).toSeq == (0 until 300))
  }

  // ---- join-geometry matrices (reference tests/CoreLib/DKV.fs:345-357) ----
  // Tuple = (numBins, binSize, numBins1, numBins2, inBin1, inBin2) — the
  // reference's exact case table; numBins is its partition count, used
  // here as the distribute() fan-out so each geometry also exercises its
  // declared parallelism.
  // Left DKV: keys 0..binSize*numBins1 kept when i % binSize < numElemsInBin1.
  // Right DKV: kept when j % binSize >= binSize - numElemsInBin2 (overlapping
  // tail bins) — includes empty-intersection geometries.
  private val geometries = Seq(
    (7, 1, 4, 4, 1, 1), (7, 1, 4, 5, 1, 1), (6, 2, 4, 4, 2, 2),
    (15, 8, 8, 8, 8, 8), (24, 4, 16, 16, 4, 4), (24, 4, 16, 16, 3, 3),
    (24, 4, 16, 16, 4, 3), (24, 4, 16, 16, 3, 4), (96, 1, 64, 64, 1, 1),
    (112, 5, 64, 64, 3, 4))

  private def joinSides(g: (Int, Int, Int, Int, Int, Int)) = {
    val (_, binSize, numBins1, numBins2, inBin1, inBin2) = g
    val left = (0 until binSize * numBins1).filter(i => i % binSize < inBin1).map(i => (i, i.toLong))
    val right = (0 until binSize * numBins2).filter(j => j % binSize >= binSize - inBin2).map(j => (j, j.toString))
    (left, right)
  }

  test("sorted-merge inner join matches local oracle over all geometries") {
    geometries.foreach { g =>
      val (l, r) = joinSides(g)
      val rm = r.toMap
      // sorted-seq compare, not toSet: a join that emitted a matched pair
      // twice would collapse under a set and pass vacuously (keys are
      // unique by construction, so sort-by-key is a total order)
      val exp = l.collect { case (k, v) if rm.contains(k) => (k, s"$v|${rm(k)}") }.sortBy(_._1)
      val got = DSet.distribute(spark, l, g._1)
        .innerJoinByMerge(DSet.distribute(spark, r, g._1))((v, v1) => s"$v|$v1")
        .toArray.sortBy(_._1).toSeq
      assert(got == exp, s"geometry $g")
    }
  }

  test("left outer join matches local oracle over all geometries") {
    geometries.foreach { g =>
      val (l, r) = joinSides(g)
      val rm = r.toMap
      val exp = l.map { case (k, v) => (k, s"$v|${rm.get(k).getOrElse("_")}") }.sortBy(_._1)
      val got = DSet.distribute(spark, l, g._1)
        .leftOuterJoinByMerge(DSet.distribute(spark, r, g._1))((v, o) => s"$v|${o.getOrElse("_")}")
        .toArray.sortBy(_._1).toSeq
      assert(got == exp, s"geometry $g")
    }
  }

  test("right outer join matches local oracle over all geometries") {
    geometries.foreach { g =>
      val (l, r) = joinSides(g)
      val lm = l.toMap
      val exp = r.map { case (k, v1) => (k, s"${lm.get(k).getOrElse(-1L)}|$v1") }.sortBy(_._1)
      val got = DSet.distribute(spark, l, g._1)
        .rightOuterJoinByMerge(DSet.distribute(spark, r, g._1))((o, v1) => s"${o.getOrElse(-1L)}|$v1")
        .toArray.sortBy(_._1).toSeq
      assert(got == exp, s"geometry $g")
    }
  }

  test("joins and keyed repartition work on NAMED-column datasets (non-tuple schema)") {
    // a Dataset decoded from named source columns keeps those names; the
    // positional _1/_2 addressing must normalize, not blow up (the fx9
    // regression: .select(a, b).as[(K, V)] then innerJoinByHash)
    import org.apache.spark.sql.functions.col
    val left = new DSet(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("named_k", "named_v")
      .as[(Long, String)])
    val right = new DSet(Seq((2L, 20), (3L, 30), (4L, 40)).toDF("other_k", "other_v")
      .as[(Long, Int)])
    assert(left.innerJoinByHash(right)((s, i) => s + i).toArray.sorted.toSeq ==
      Seq((2L, "b20"), (3L, "c30")))
    assert(left.innerJoinByMerge(right)((s, i) => s + i).toArray.sorted.toSeq ==
      Seq((2L, "b20"), (3L, "c30")))
    assert(left.leftOuterJoinByMerge(right)((s, i) => s + i.getOrElse(0)).toArray.sorted.toSeq ==
      Seq((1L, "a0"), (2L, "b20"), (3L, "c30")))
    assert(left.rightOuterJoinByMerge(right)((s, i) => s.getOrElse("?") + i).toArray.sorted.toSeq ==
      Seq((2L, "b20"), (3L, "c30"), (4L, "?40")))
    assert(left.semiJoinByKey(right).toArray.map(_._1).sorted.toSeq == Seq(2L, 3L))
    assert(left.antiJoinByKey(right).toArray.map(_._1).sorted.toSeq == Seq(1L))
    assert(left.repartitionNByKey(2).ds.filter(col("_1") === 1L).count() == 1L)
  }

  test("broadcast hash join matches sorted-merge result") {
    val (l, r) = joinSides((24, 4, 16, 16, 4, 3))
    val smj = DSet.distribute(spark, l, 4)
      .innerJoinByMerge(DSet.distribute(spark, r, 4))((v, v1) => s"$v|$v1").toArray.toSet
    val bhj = DSet.distribute(spark, l, 4)
      .innerJoinByHash(DSet.distribute(spark, r, 4))((v, v1) => s"$v|$v1").toArray.toSet
    assert(smj == bhj)
  }
}
