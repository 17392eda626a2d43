package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.dset.DSet
import graft.dset.DSet._
import graft.streaming.Sessionize

/** Specs for the remaining SURVEY §2 operator variants. */
class FacadeCoverageSpec extends SparkSuite {
  import spark.implicits._

  test("initN size func receives (numPartitions, parti)") {
    val d = DSet.initN[Int](spark, 4)((np, pi) => np + pi)((pi, s) => pi * 100 + s.toInt)
    // sizes: 4+0, 4+1, 4+2, 4+3 = 4,5,6,7 → 22 elements
    assert(d.count() == 22)
  }

  test("source / sourceN / distributeN generate per-slot partitions") {
    val par = spark.sparkContext.defaultParallelism
    assert(DSet.source(spark)(() => Seq(1, 2)).count() == par * 2L)
    val sn = DSet.sourceN(spark, 3)(i => Seq(i))
    assert(sn.ds.rdd.getNumPartitions == par * 3)
    assert(sn.toArray.sorted.toSeq == (0 until par * 3).map(_ % 3).sorted)
    assert(DSet.distributeN(spark, 1 to 10, 1).count() == 10)
  }

  test("tryFind lists saved dataset names by pattern") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    DSet.distribute(spark, 1 to 5).saveToName(s"$wh/ds_alpha")
    DSet.distribute(spark, 1 to 5).saveToName(s"$wh/ds_beta")
    DSet.distribute(spark, 1 to 5).saveToName(s"$wh/other")
    assert(DSet.tryFind(wh, "^ds_") == Seq("ds_alpha", "ds_beta"))
  }

  test("parallelMapi carries positions with bounded concurrency") {
    val d = DSet.initS[Int](spark, 2, 20)((pi, s) => pi * 20 + s.toInt)
    val got = d.parallelMapi(4)((pi, serial, u) => u - (pi * 20 + serial.toInt)).toArray
    assert(got.forall(_ == 0) && got.length == 40)
  }

  test("rowsReorg(n) re-batches what mapByCollection observes, preserving content") {
    val d = DSet.initS[Int](spark, 2, 23)((pi, s) => pi * 23 + s.toInt)
    // every batch f sees is ≤ n rows, and the LAST batch of a partition
    // carries the remainder (23 = 2*9 + 5)
    val sizes = d.rowsReorg(9).mapByCollection(arr => Array(arr.length)).toArray
    assert(sizes.forall(_ <= 9))
    assert(sizes.sorted.toSeq == Seq(5, 5, 9, 9, 9, 9))
    // content is untouched: same elements, nothing dropped or duplicated
    val roundtrip = d.rowsReorg(7).mapByCollection(identity[Array[Int]]).toArray
    assert(roundtrip.sorted.toSeq == (0 until 46))
    // rowsSplit → singleton batches; rowsMergeAll → whole partition
    assert(d.rowsSplit.mapByCollection(arr => Array(arr.length)).toArray.forall(_ == 1))
    assert(d.rowsMergeAll.mapByCollection(arr => Array(arr.length)).toArray.toSeq == Seq(23, 23))
    // n <= 0 restores the whole-partition default
    assert(d.rowsReorg(9).rowsReorg(-1).mapByCollection(arr => Array(arr.length)).toArray.toSeq == Seq(23, 23))
    assert(d.reorgWDegree(4).count() == 46)
    // the hint is a MEMORY BOUND that survives narrow composition: a
    // filter/map between rowsReorg and the batch consumer must not
    // silently revert to whole-partition arrays
    val composed = d.rowsReorg(6).filter(_ % 2 == 0).map(_ + 1)
      .mapByCollection(arr => Array(arr.length)).toArray
    assert(composed.forall(_ <= 6), composed.toSeq.toString)
    assert(composed.sum == 46 / 2)
  }

  test("rowsReorg hint survives every transformation, shuffles included") {
    val d = DSet.initS[Int](spark, 2, 23)((pi, s) => pi * 23 + s.toInt).rowsReorg(9)
    val kv = d.map(i => (i % 5, i.toLong)).rowsReorg(9)
    // narrow + RDD-bridging single-input ops keep the bound verbatim
    assert(d.filter(_ >= 0).batchHint == 9)
    assert(d.map(_ + 1).batchHint == 9)
    assert(d.choose(i => Some(i)).batchHint == 9)
    assert(d.collectSeq(i => Seq(i)).batchHint == 9)
    assert(d.mapi((_, _, u) => u).batchHint == 9)
    assert(d.parallelMap(2)(identity).batchHint == 9)
    assert(d.parallelMapi(2)((_, _, u) => u).batchHint == 9)
    assert(d.repartitionN(3).batchHint == 9)
    assert(d.repartitionP(3)(_ % 3).batchHint == 9)
    assert(d.binSortP(3)(_ % 3).batchHint == 9)
    assert(d.cacheInMemory().batchHint == 9)
    assert(d.mapReduceAssoc(i => Seq((i % 3, 1L)))(_ + _).batchHint == 9)
    assert(d.mapReduceP(3)(i => Seq((i % 3, 1L)))((k, vs) => (k, vs.sum)).batchHint == 9)
    // KV shuffles
    assert(kv.filterByKey(_ >= 0).batchHint == 9)
    assert(kv.mapByValue(_ + 1).batchHint == 9)
    assert(kv.groupByKey.batchHint == 9)
    assert(kv.groupByKeyN(3).batchHint == 9)
    assert(kv.reduceByKey(_ + _).batchHint == 9)
    assert(kv.repartitionNByKey(3).batchHint == 9)
    assert(kv.repartitionPByKey(3)(_ % 3).batchHint == 9)
    assert(kv.binSortNByKey(3).batchHint == 9)
    assert(kv.binSortPByKey(3)(_ % 3).batchHint == 9)
    // multi-input ops carry the TIGHTEST of their inputs' hints
    val loose = d.rowsReorg(25)
    assert(loose.merge(d).batchHint == 9)
    assert(loose.mix(d).batchHint == 9)
    assert(loose.map2(d)(_ + _).batchHint == 9)
    assert(loose.mix3(d, loose).batchHint == 9)
    assert(loose.map4(d, loose, loose)((a, _, _, _) => a).batchHint == 9)
    val kvLoose = kv.mapByValue(identity[Long]).rowsReorg(25)
    assert(kvLoose.innerJoinByMerge(kv)((a, b) => a + b).batchHint == 9)
    assert(kvLoose.leftOuterJoinByMerge(kv)((a, _) => a).batchHint == 9)
    // hash-repartition (oracle can't replay Spark's hash layout — assert
    // the bound holds at execution here instead)
    val batches = d.repartitionN(3).mapByCollection(arr => Array(arr.length)).toArray
    assert(batches.forall(_ <= 9), batches.toSeq.toString)
    assert(batches.sum == 46)
  }

  test("fold seeds a non-neutral init state exactly once per partition") {
    // treeAggregate would re-inject the state per partial + once on the
    // driver (9 injections here instead of 4) — 455, not 955
    val got = DSet.distribute(spark, 1 to 10, 4).fold(100)(_ + _, _ + _)
    assert(got == 55 + 4 * 100, s"state multi-applied: got $got")
    // empty partitions still contribute exactly one state each (the
    // per-partition contract), nothing more
    assert(DSet.distribute(spark, Seq.empty[Int], 2).fold(7)(_ + _, _ + _) == 7 * 2)
  }

  test("fold combines partials executor-tier above the tree threshold") {
    val parts = 256 // > DSet.FoldTreeThreshold → treeReduce path
    val taskAggr = spark.sparkContext.longAccumulator("aggr-in-task")
    val driverAggr = new java.util.concurrent.atomic.AtomicLong()
    val d = DSet.initS[Int](spark, parts, 4)((_, _) => 1)
    val got = d.fold(10) (
      (s, u) => s + u,
      (a, b) => {
        // tree levels run inside tasks; the final merge runs on the driver
        if (org.apache.spark.TaskContext.get() != null) taskAggr.add(1)
        else driverAggr.incrementAndGet()
        a + b
      })
    // init seeded exactly once per partition, tree or not
    assert(got == parts * 4 + parts * 10, s"got $got")
    assert(taskAggr.value > 0, "no executor-tier combine ran")
    assert(driverAggr.get() < parts / 4,
      s"driver reduced ${driverAggr.get()} partials — tree level missing")
  }

  test("fold preserves partition order for associative non-commutative aggregation") {
    // the tree path groups CONTIGUOUS pid ranges and reduces them in
    // order — a parenthesization of the ordered sequence, so an
    // associative-but-non-commutative aggr (concatenation) must give the
    // partition-ordered result at ANY partition count, not flip when the
    // tree threshold is crossed
    val parts = 100 // > FoldTreeThreshold
    val d = DSet.sourceI[String](spark, parts)(pi => Seq(pi.toString))
    val got = d.fold("")((s, u) => s + u, (a, b) => a + "|" + b)
    assert(got == (0 until parts).mkString("|"), got)
  }

  test("foldWithCommonStatePerNode tolerates empty partitions (snapshot tie-break)") {
    // partition 1 is empty: its task's snapshot TIES on fold count with
    // the worker task's — a stale tie-break spuriously reported a dead
    // partial on a fully successful job
    val d = DSet.sourceI[Int](spark, 3)(pi => if (pi == 1) Seq.empty else Seq(pi * 10, pi * 10 + 1))
    val got = d.foldWithCommonStatePerNode(() => 0L)((s, u) => s + u, _ + _)
    assert(got == 0L + 1 + 20 + 21)
  }

  test("groupByKeySalted spreads a constant-valued heavy hitter and stays exact") {
    import graft.dset.DSet.KVOps
    val pairs = DSet.distribute(spark, (0 until 10000).map(_ => ("hot", 1L)) ++
      Seq(("cold", 5L)), 8)
    val got = pairs.groupByKeySalted(8).mapByValue(vs => (vs.length, vs.sum)).toArray.toMap
    assert(got("hot") == ((10000, 10000L)))
    assert(got("cold") == ((1, 5L)))
  }

  test("mix3 / map3 zip three same-shape dsets") {
    val a = DSet.initS[Int](spark, 2, 5)((pi, s) => pi * 5 + s.toInt)
    val b = a.map(_ * 2)
    val c = a.map(_ * 3)
    val m = a.mix3(b, c).toArray
    m.foreach { case (x, y, z) => assert(y == 2 * x && z == 3 * x) }
    assert(a.map3(b, c)(_ + _ + _).toArray.sorted.toSeq == (0 until 10).map(_ * 6))
  }

  test("split3 projects three branches from one cached parent") {
    val (x, y, z) = DSet.distribute(spark, 1 to 10).split3(_ * 1, _ * 2, _ * 3)
    assert(x.toArray.sum == 55 && y.toArray.sum == 110 && z.toArray.sum == 165)
  }

  test("lazySaveToName defers the write until invoked") {
    val path = java.nio.file.Files.createTempDirectory("graft-lazy").toString + "/out"
    val (cached, doSave) = DSet.distribute(spark, 1 to 100).lazySaveToName(path)
    assert(cached.count() == 100) // pull branch drives the cache
    assert(!new java.io.File(path).exists())
    doSave()
    assert(DSet.loadParquet[Int](spark, path).count() == 100)
  }

  test("saveToNameWithMonitor reports rows written") {
    val path = java.nio.file.Files.createTempDirectory("graft-mon").toString + "/out"
    val metrics = DSet.distribute(spark, 1 to 42).saveToNameWithMonitor(path)
    assert(metrics.get("rows_written").contains(42L), s"metrics=$metrics")
  }

  test("parallelMapByValue / repartitionNByKey / binSortNByKey") {
    val kv = DSet.distribute(spark, (0 until 100).map(i => (i % 7, i)), 4)
    assert(kv.parallelMapByValue(4)(_ * 2).toArray.forall { case (k, v) => (v / 2) % 7 == k })
    assert(kv.repartitionNByKey(3).count() == 100)
    val sorted = DSet.distribute(spark, scala.util.Random.shuffle((0 until 200).toList).map(i => (i, i.toString)), 4)
      .binSortNByKey(4)
    val parts = sorted.ds.rdd.glom().collect()
    // range partitioner: partitions are key-disjoint and internally sorted
    parts.foreach { arr =>
      val ks = arr.map(_._1).toSeq
      assert(ks == ks.sorted)
    }
    val bounds = parts.filter(_.nonEmpty).map(arr => (arr.head._1, arr.last._1))
    bounds.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }

  test("binSortNByKey evaluates its upstream once (sample pass reads the cache)") {
    val acc = spark.sparkContext.longAccumulator("graft-binsort-scans")
    val n = 300
    val sorted = DSet.distribute(spark, (0 until n).toList, 4)
      .map { i => acc.add(1); (n - i, i) }
      .binSortNByKey(4)
    assert(sorted.toArray.map(_._1).toSeq == sorted.toArray.map(_._1).toSeq.sorted)
    // one evaluation total: the RangePartitioner sampling job materializes
    // the persisted keyed RDD; the shuffle map stage reads it back
    assert(acc.value == n, s"upstream evaluated ${acc.value.toDouble / n}x")
  }

  test("mix4 / map4 zip four same-shape dsets") {
    val a = DSet.initS[Int](spark, 2, 5)((pi, s) => pi * 5 + s.toInt)
    val b = a.map(_ * 2)
    val c = a.map(_ * 3)
    val d = a.map(_ * 4)
    a.mix4(b, c, d).toArray.foreach { case (w, x, y, z) =>
      assert(x == 2 * w && y == 3 * w && z == 4 * w)
    }
    assert(a.map4(b, c, d)(_ + _ + _ + _).toArray.sorted.toSeq == (0 until 10).map(_ * 10))
  }

  test("split4 projects four branches from one cached parent") {
    val (w, x, y, z) = DSet.distribute(spark, 1 to 10).split4(_ * 1, _ * 2, _ * 3, _ * 4)
    assert(w.toArray.sum == 55 && x.toArray.sum == 110 && y.toArray.sum == 165 && z.toArray.sum == 220)
  }

  test("executeN runs the closure N times per partition slot") {
    val acc = spark.sparkContext.longAccumulator("execN")
    val d = DSet.distribute(spark, 1 to 8, 4)
    d.executeN(3)((pi, call) => acc.add(pi * 10 + call))
    // 4 partitions × calls {0,1,2}: sum = Σ_pi Σ_c (10·pi + c) = 10·(0+1+2+3)·3 + 4·(0+1+2)
    assert(acc.value == 10 * 6 * 3 + 4 * 3)
  }

  test("distributeUnevenN cuts the client seq into caller-sized partitions") {
    val d = DSet.distributeUnevenN(spark, 1 to 100, 4)(i => (i + 1) * 10) // 10,20,30,+remainder
    val parts = d.ds.rdd.glom().collect().map(_.toSeq)
    assert(parts.map(_.size).toSeq == Seq(10, 20, 30, 40))
    assert(parts.flatten.toSeq == (1 to 100))
  }

  test("mapReduceAssoc does map-side combine and matches mapReduce") {
    val words = DSet.distribute(spark, Seq("a b a", "b c", "a"), 2)
    val viaAssoc = words.mapReduceAssoc(_.split(" ").map(w => (w, 1L)))(_ + _).toArray.toMap
    val viaGroup = words
      .mapReduce(_.split(" ").map(w => (w, 1L)))((k, vs) => (k, vs.sum)).toArray.toMap
    assert(viaAssoc == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(viaAssoc == viaGroup)
  }

  test("mapReduceP pins the reducer partition count") {
    val d = DSet.distribute(spark, (0 until 100).map(_.toString), 4)
    val red = d.mapReduceP(5)(s => Seq((s.toInt % 7, 1)))((k, vs) => (k, vs.sum))
    assert(red.ds.rdd.getNumPartitions == 5)
    assert(red.toArray.toMap == (0 until 100).groupBy(_ % 7).view.mapValues(_.size).toMap)
  }

  test("mapReducePWithPartitionFunction routes keys by the user partitioner") {
    val d = DSet.distribute(spark, (0 until 100).map(_.toString), 4)
    val red = d.mapReducePWithPartitionFunction(3)((k: Int) => k % 3)(s => Seq((s.toInt % 9, 1)))((k, vs) => (k, vs.sum))
    assert(red.ds.rdd.getNumPartitions == 3)
    // partition i must hold exactly the keys with k % 3 == i
    red.ds.rdd.glom().collect().zipWithIndex.foreach { case (arr, pi) =>
      arr.foreach { case (k, _) => assert(k % 3 == pi, s"key $k in partition $pi") }
    }
    assert(red.toArray.toMap == (0 until 100).groupBy(_ % 9).view.mapValues(_.size).toMap)
  }

  test("semiJoinByKey / antiJoinByKey") {
    val l = DSet.distribute(spark, (0 until 20).map(i => (i, i.toString)), 2)
    val r = DSet.distribute(spark, (0 until 10).map(i => (i * 2, i)), 2)
    assert(l.semiJoinByKey(r).toArray.map(_._1).sorted.toSeq == (0 until 20 by 2))
    assert(l.antiJoinByKey(r).toArray.map(_._1).sorted.toSeq == (1 until 20 by 2))
  }

  test("streaming sessionization: closed sessions match the batch oracle") {
    val batchEvents = Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("value"))
    val batch = Sessionize.sessionsBatch(batchEvents, 30).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet

    val streamDir = java.nio.file.Files.createTempDirectory("sess-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      streamDir.resolve("events.parquet"))
    val rawSchema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val stream = Tables.normalizeTs(
      spark.readStream.schema(rawSchema).parquet(streamDir.toString))
      .select(col("user_id"), col("ts"), col("value")).as[Sessionize.SessionEvent]
    val q = Sessionize.sessionsStream(stream, 30, "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sess")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(streamed.nonEmpty, "no sessions closed")
    val missing = streamed -- batch
    assert(missing.isEmpty, s"streamed sessions absent from batch: ${missing.take(3)}")
    // coverage lower bound (the sliding-stats pattern): subset + nonEmpty
    // alone would pass a watermark regression that closes almost nothing
    assert(streamed.size >= batch.size / 2,
      s"too few sessions closed: ${streamed.size}/${batch.size}")
  }
}
