package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dset.DSet
import graft.dset.DSet._
import graft.operators.Dedup

/** ScalaCheck-generator property tests (SURVEY §5 plan): structural
  * invariants over randomized inputs, seeded for reproducibility.
  * (scalacheck is used directly — the scalatestplus bridge isn't in the
  * offline dependency cache.)
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  /** Run `body` over `n` seeded samples of `gen`. */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      val sample = gen.pureApply(Gen.Parameters.default, Seed(42L + i))
      body(sample)
    }

  private val smallInts = Gen.listOfN(80, Gen.chooseNum(-1000, 1000))

  test("rowsReorg(n): mapByCollection sees ≤n-row batches, content and order intact") {
    forAllSeeded(Gen.zip(smallInts, Gen.chooseNum(1, 25), Gen.chooseNum(1, 5))) {
      case (xs, n, parts) =>
        val d = DSet.distribute(spark, xs, parts).rowsReorg(n)
        // every batch bounded by the hint
        val sizes = d.mapByCollection(arr => Array(arr.length)).toArray
        assert(sizes.forall(s => s >= 1 && s <= n), s"n=$n sizes=${sizes.toSeq}")
        // identity through batches preserves the partition-order stream
        val round = d.mapByCollection(identity[Array[Int]])
        val perPart = round.ds.rdd.glom().collect().map(_.toSeq)
        val orig = DSet.distribute(spark, xs, parts).ds.rdd.glom().collect().map(_.toSeq)
        assert(perPart.toSeq == orig.toSeq)
    }
  }

  test("repartitionP preserves the multiset for any partition function") {
    forAllSeeded(Gen.zip(smallInts, Gen.chooseNum(1, 7))) { case (xs, parts) =>
      val got = DSet.distribute(spark, xs, 3).repartitionP(parts)(u => u % parts).toArray
      assert(got.sorted.toSeq == xs.sorted)
    }
  }

  test("binSortP yields global order (bin-major) for monotone bin funcs") {
    forAllSeeded(smallInts) { xs =>
      val sorted = DSet.distribute(spark, xs, 3)
        .binSortP(4)(u => math.min(3, math.max(0, (u + 1000) / 500)))
      val flat = sorted.ds.rdd.glom().collect().flatten.toSeq
      assert(flat == xs.sorted)
    }
  }

  test("mapReduce wordcount equals local groupBy for arbitrary token lists") {
    forAllSeeded(Gen.listOfN(60, Gen.oneOf("a", "b", "c", "dd", "ee"))) { ws =>
      val got = DSet.distribute(spark, ws, 2)
        .mapReduce(w => Iterator.single((w, 1L)))((k, vs) => (k, vs.sum))
        .toArray.toMap
      assert(got == ws.groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }
  }

  test("join facade equals Scala-collection join for arbitrary key overlap") {
    val pairs = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 15), Gen.chooseNum(0, 99)))
    forAllSeeded(Gen.zip(pairs, pairs), n = 6) { case (l, r) =>
      val exp = (for { (k, v) <- l; (k2, v2) <- r if k == k2 } yield (k, v * 1000 + v2)).sorted
      val got = DSet.distribute(spark, l, 2)
        .innerJoinByMerge(DSet.distribute(spark, r, 2))((a, b) => a * 1000 + b)
        .toArray.sorted.toSeq
      assert(got == exp)
    }
  }

  test("groupByKey equals local groupBy over random key skew") {
    val pairs = Gen.listOfN(100, Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, 999)))
    forAllSeeded(pairs, n = 6) { kvs =>
      val got = DSet.distribute(spark, kvs, 3).groupByKey.toArray.toMap
        .view.mapValues(_.sorted).toMap
      val exp = kvs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      assert(got == exp)
    }
  }

  test("MinHash similarity estimate tracks exact Jaccard within tolerance") {
    (0 to 10).foreach { overlapTenths =>
      val shared = (0 until overlapTenths * 10).map(i => s"tok$i")
      val a = (shared ++ (0 until (100 - shared.length)).map(i => s"a$i")).mkString(" ")
      val b = (shared ++ (0 until (100 - shared.length)).map(i => s"b$i")).mkString(" ")
      val df = Seq((1L, a), (2L, b)).toDF("id", "text")
      val sigs = df.select(
        org.apache.spark.sql.functions.col("id"),
        Dedup.minhashSignature(Dedup.wordShingleHashes(org.apache.spark.sql.functions.col("text"), 1), 256).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }.toDouble / 256
      val sa = a.split(" ").toSet
      val sb = b.split(" ").toSet
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(est - exact) < 0.15, s"overlap $overlapTenths: est $est vs exact $exact")
    }
  }

  test("tokenCounts / tokenGramCounts equal local counting over arbitrary text (incl. unicode)") {
    // text from a token alphabet incl. multi-space runs and non-BMP chars
    val tokenGen = Gen.oneOf("a", "bb", "ccc", "δδ", "👋x", "z9")
    val textGen = Gen.listOfN(30, Gen.oneOf(tokenGen, Gen.const(""), Gen.const(" ")))
      .map(_.mkString(" "))
    forAllSeeded(textGen, n = 8) { text =>
      def toks = text.split(" ").filter(_.nonEmpty).toSeq
      val expect1 = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expect2 = toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
        .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val row = Seq(Tuple1(text)).toDF("t").select(
        graft.functions.TextFunctions.tokenCounts(org.apache.spark.sql.functions.col("t")).as("m1"),
        graft.functions.TextFunctions.tokenGramCounts(org.apache.spark.sql.functions.col("t"), 2).as("m2"))
        .collect().head
      assert(row.getMap[String, Long](0) == expect1, s"text='$text'")
      assert(row.getMap[String, Long](1) == expect2, s"text='$text'")
    }
  }

  test("removeRepeatedLines equals local filtering for arbitrary corpora and thresholds") {
    val docGen = Gen.listOfN(5, Gen.oneOf("nav", "body1", "body2", "footer", "x y", ""))
      .map(_.mkString("\n"))
    forAllSeeded(Gen.listOfN(8, docGen), n = 6) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val nDocs = docs.length
      val dropSet = docs.flatMap { case (_, t) => t.split("\n").filter(_.nonEmpty).distinct }
        .groupBy(identity).collect { case (l, hits) if hits.size > nDocs * 0.5 => l }.toSet
      val expected = docs.map { case (id, t) =>
        val kept = t.split("\n").filter(l => l.nonEmpty && !dropSet(l))
        (id, kept.mkString("\n"), kept.length.toLong)
      }.toSet
      val got = Dedup.removeRepeatedLines(docs.toDF("id", "text"), "id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected, s"texts=$texts dropSet=$dropSet")
    }
  }

  test("Misra-Gries candidates contain every guaranteed heavy hitter on random streams") {
    // random zipf-ish streams, random chunking into partials — the
    // mergeable-summary guarantee (freq > N/(k+1) ⇒ candidate, ≤ k
    // entries) must hold for EVERY split, not just the fixed fixture in
    // SketchesSpec
    val streamGen = Gen.zip(
      Gen.listOfN(400, Gen.frequency(
        (8, Gen.oneOf("hot1", "hot2", "hot3")),
        (3, Gen.chooseNum(0, 40).map(i => s"mid$i")),
        (5, Gen.chooseNum(0, 5000).map(i => s"tail$i")))),
      Gen.chooseNum(4, 32),   // k
      Gen.chooseNum(7, 120))  // chunk size
    forAllSeeded(streamGen, n = 8) { case (stream, k, chunk) =>
      val agg = new graft.functions.Aggregators.MisraGriesAgg(k)
      val parts = stream.grouped(chunk).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val candidates = agg.finish(parts.reduce(agg.merge)).toSet
      assert(candidates.size <= k, s"summary exceeded k=$k: ${candidates.size}")
      val n = stream.size
      val counts = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val must = counts.filter(_._2 > n / (k + 1)).keys.toSet
      assert(must.subsetOf(candidates),
        s"k=$k chunk=$chunk lost heavy hitters: ${must -- candidates}")
    }
  }

  test("packChunks equals the local prefix-sum layout for random token lists") {
    val gen = Gen.zip(
      Gen.listOfN(60, Gen.chooseNum(0L, 300L)), // token counts
      Gen.chooseNum(1L, 128L))                  // capacity
    forAllSeeded(gen, n = 8) { case (toks, cap) =>
      val rows = toks.zipWithIndex.map { case (t, i) => (i.toLong, "g", t) }
      val expected = {
        var start = 0L
        rows.map { case (id, _, t) =>
          val r = (id, start / cap, start % cap); start += t; r
        }.toSet
      }
      val got = graft.operators.Packing
        .packChunks(rows.toDF("id", "grp", "toks"), "grp", "id", "toks", cap)
        .select("id", "bin", "offset").as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"cap=$cap toks=$toks")
    }
  }

  test("hashBucket / hashOrder64 expressions equal their JVM twins for random ids") {
    import org.apache.spark.sql.functions.col
    val gen = Gen.zip(
      Gen.listOfN(50, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)),
      Gen.chooseNum(1L, 1000000L),
      Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
    forAllSeeded(gen, n = 6) { case (ids, buckets, seed) =>
      val df = ids.map(Tuple1(_)).toDF("id")
      val got = df.select(col("id"),
        graft.functions.HashFunctions.hashBucket(col("id"), buckets, seed).as("b"),
        graft.functions.HashFunctions.hashOrder64(col("id"), seed).as("o"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      ids.foreach { id =>
        assert(got(id)._1 == graft.functions.HashFunctions.bucketOf(id, buckets, seed))
        assert(got(id)._2 == graft.functions.HashFunctions.orderOf(id, seed))
      }
    }
  }

  test("composite-key upsert equals a local map merge for random batches") {
    val rowGen = Gen.zip(Gen.chooseNum(0, 8), Gen.oneOf("s1", "s2"), Gen.chooseNum(0, 999))
    forAllSeeded(Gen.zip(Gen.listOfN(20, rowGen), Gen.listOfN(10, rowGen)), n = 6) {
      case (baseRaw, batchRaw) =>
        // keys unique per side (last wins locally, matching upsert's
        // one-row-per-key input contract)
        val base = baseRaw.map { case (a, b, v) => (a.toLong, b, v.toLong) }
          .groupBy(r => (r._1, r._2)).values.map(_.last).toSeq
        val batch = batchRaw.map { case (a, b, v) => (a.toLong, b, v.toLong) }
          .groupBy(r => (r._1, r._2)).values.map(_.last).toSeq
        val expected = (base.map(r => (r._1, r._2) -> r).toMap ++
          batch.map(r => (r._1, r._2) -> r).toMap).values.toSet
        val got = graft.operators.Upsert.upsertByKey(
          base.toDF("id", "src", "v"), batch.toDF("id", "src", "v"), Seq("id", "src"))
          .as[(Long, String, Long)].collect().toSet
        assert(got == expected, s"base=$base batch=$batch")
    }
  }

  test("connectedComponents equals a local union-find on random graphs") {
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L)).suchThat(p => p._1 != p._2))
    forAllSeeded(edgeGen, n = 6) { edges =>
      // local oracle: path-compressing union-find, min id as root label
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id)).toMap

      val got = Dedup.connectedComponents(
        edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"edges=$edges")
    }
  }

  test("chunkDocuments equals local slicing for arbitrary token streams and strides") {
    import graft.operators.Chunking
    val tokenGen = Gen.oneOf("a", "bb", "ccc", "dddd", "e5")
    val gen = Gen.zip(Gen.listOfN(30, tokenGen), Gen.chooseNum(1, 8), Gen.chooseNum(1, 8))
    forAllSeeded(gen, n = 8) { case (ts0, a, b) =>
      val (stride, size) = (math.min(a, b), math.max(a, b))
      val ts = ts0.take(1 + ts0.take(1).hashCode.abs % 30) // vary length too
      val df = Seq((1L, ts.mkString(" "))).toDF("id", "text")
      val got = Chunking.chunkDocuments(df, "id", "text", size, stride)
        .as[(Long, Int, Int, String)].collect().sortBy(_._2).toSeq
      val n = ts.length
      val expect = (0 to (n - 1) / stride).map { i =>
        val s = ts.slice(i * stride, i * stride + size)
        (1L, i, s.length, s.mkString(" "))
      }
      assert(got == expect, s"n=$n size=$size stride=$stride")
    }
  }

  test("repeatUpsample multiset equals the per-row copies contract for arbitrary factors") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions.col
    val gen = Gen.zip(Gen.chooseNum(0, 3200000L), Gen.chooseNum(0, 3200000L))
    forAllSeeded(gen, n = 5) { case (fxMicros, fyMicros) =>
      val (fx, fy) = (fxMicros / 1e6, fyMicros / 1e6)
      val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "x" else "y")).toDF("id", "g")
      val out = Sampling.repeatUpsample(df, "id", "g", Map("x" -> fx, "y" -> fy), 1.0, 5L)
        .groupBy("id").agg(org.apache.spark.sql.functions.count(col("id")).as("k"))
        .as[(Long, Long)].collect().toMap
      // replay the contract with the operator's own hash primitive
      val buckets = df.select(col("id"),
          graft.functions.HashFunctions.hashBucket(col("id"), Sampling.Buckets, 5L))
        .as[(Long, Long)].collect().toMap
      (1L to 200L).foreach { id =>
        val fb = math.round((if (id % 2 == 0) fx else fy) * Sampling.Buckets)
        val expect = fb / Sampling.Buckets + (if (buckets(id) < fb % Sampling.Buckets) 1 else 0)
        assert(out.getOrElse(id, 0L) == expect, s"id=$id fx=$fx fy=$fy")
      }
    }
  }

  test("readChanges union equals the appended batches for arbitrary batch splits") {
    import graft.sources.Snapshots
    val gen = Gen.listOfN(30, Gen.chooseNum(1, 3))
    forAllSeeded(gen, n = 3) { marks =>
      val table = java.nio.file.Files.createTempDirectory("graft-prop-cdc").toString + "/t"
      val ids = marks.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      val v1 = Snapshots.commit(ids.filter(_._2 == 1).toDF("id", "m"), table)
      Seq(2, 3).foreach { m =>
        Snapshots.commitAppend(ids.filter(_._2 == m).toDF("id", "m"), table)
      }
      val got = Snapshots.readChanges(spark, table, v1)
        .as[(Long, Int)].collect().sorted.toSeq
      assert(got == ids.filter(r => r._2 == 2 || r._2 == 3).sorted, s"marks=$marks")
    }
  }
}
