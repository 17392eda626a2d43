package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

class VectorSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf0001, "embeddings").cache()

  test("zero-norm vectors never rank or pair (NaN cosine guard)") {
    import graft.operators.Similarity
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0f, 0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1f, 0f))).toDF("vec_id", "embedding")
    // without the guard the all-zero row scores NaN, which Spark orders
    // above every real cosine — it would be rank 1 for every query
    val knn = Similarity.bruteForceKnn(queries, corpus,
      "vec_id", "embedding", "vec_id", "embedding", 3).collect()
    assert(!knn.map(_.getLong(1)).contains(3L), knn.mkString(","))
    // select BY RANK, not head: collect() order after the window filter
    // is incidental, the rank column is the contract
    assert(knn.filter(_.getInt(2) == 1).map(_.getLong(1)).toSeq == Seq(1L), knn.mkString(","))
    // pairs: NaN >= threshold is TRUE — zero rows must not emit pairs
    val pairs = Similarity.exactCosinePairs(corpus, "vec_id", "embedding", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    val ann = Similarity.annCosinePairs(corpus, "vec_id", "embedding",
      dim = 2, threshold = 0.5, bits = 2, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!ann.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("annCosinePairs releases its projection cache after the first action") {
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ann = Similarity.annCosinePairs(corpus, "vec_id", "embedding",
      dim = 2, threshold = 0.5, bits = 2, tables = 8)
    assert(ann.count() >= 0) // first action — triggers the auto-release
    // the release listener rides the async listener bus — poll briefly
    val deadline = System.nanoTime() + 10000000000L
    def lingering = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    while (lingering.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(lingering.isEmpty, s"cached blocks survived the action: $lingering")

    // the Releasable variant leaves the cache to the caller, then frees it
    val (ann2, release) = Similarity.annCosinePairsReleasable(
      corpus, "vec_id", "embedding", dim = 2, threshold = 0.5, bits = 2, tables = 8)
    assert(ann2.count() >= 0)
    assert(lingering.nonEmpty, "Releasable variant should keep its cache until released")
    release()
    val deadline2 = System.nanoTime() + 10000000000L
    while (lingering.nonEmpty && System.nanoTime() < deadline2) Thread.sleep(50)
    assert(lingering.isEmpty, s"release() left cached blocks: $lingering")
  }

  test("annKnnGraph: heap top-k equals window ranking over the symmetric candidates") {
    val k = 3
    // materialize the fixture's own cache first, so the lingering-block
    // check below sees only blocks the OPERATOR pinned
    emb.count()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Similarity.annKnnGraph(emb, "vec_id", "embedding", 64, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // the internal projection cache releases after that action (the
    // annCosinePairs lifecycle; listener rides the async bus — poll)
    val deadline = System.nanoTime() + 10000000000L
    def lingering = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    while (lingering.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(lingering.isEmpty, s"cached blocks survived the action: $lingering")
    // contract invariants: no self-neighbor, contiguous ranks from 1,
    // sims non-increasing per source id
    got.groupBy(_._1).foreach { case (id, rows) =>
      assert(!rows.exists(_._2 == id))
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to rows.length).toSeq, s"ranks for $id")
      assert(byRank.map(_._4).toSeq == byRank.map(_._4).sortBy(-(_: Double)).toSeq, s"sims for $id")
    }
    // differential: the bounded-heap ranking must equal the window
    // row_number formulation it replaces, over the same candidate set
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("n", VectorFunctions.vecNorm(col("v"))).filter(col("n") > 0)
    val cands = Similarity.srpCandidatePairs(base, "id", "v", 64)
    val sym = cands.union(cands.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val scored = sym
      .join(base.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb")), "id_b")
      .withColumn("cos",
        VectorFunctions.cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b").asc)
    val ref = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("id_a"), col("id_b"), col("rank"), round(col("cos"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSet == ref.toSet)
  }

  test("annKnnGraph preserves the id type: string ids rank natively, unsupported fail loudly") {
    // string ids — the case the blanket long cast silently nulled out
    val corpus = Seq(
      ("a", Array(1f, 0f)), ("b", Array(0.9f, 0.1f)),
      ("c", Array(0f, 1f)), ("d", Array(0.1f, 0.95f))
    ).toDF("doc", "embedding")
    val got = Similarity.annKnnGraph(corpus, "doc", "embedding", dim = 2, k = 2,
      bits = 1, tables = 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty, "string-id corpus produced an empty graph")
    got.groupBy(_._1).foreach { case (id, rows) =>
      assert(!rows.exists(_._2 == id), s"self-neighbor for $id")
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to rows.length).toSeq, s"ranks for $id")
      assert(byRank.map(_._4).toSeq == byRank.map(_._4).sortBy(-(_: Double)).toSeq,
        s"sims for $id")
    }
    // integral ids narrower than long come back in their OWN type
    val intCorpus = Seq((1, Array(1f, 0f)), (2, Array(0.9f, 0.1f)), (3, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val intGraph = Similarity.annKnnGraph(intCorpus, "vec_id", "embedding", dim = 2, k = 1,
      bits = 1, tables = 8)
    assert(intGraph.schema("vec_id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(intGraph.schema("neighbor").dataType == org.apache.spark.sql.types.IntegerType)
    assert(intGraph.count() > 0)
    // float ids rank through the double value (exact round trip) and
    // come back in their OWN type — the graph agrees edge-for-edge with
    // the same corpus under integer ids
    val floatCorpus = Seq((1.5f, Array(1f, 0f)), (2.5f, Array(0.9f, 0.1f)),
        (3.5f, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val floatGraph = Similarity.annKnnGraph(floatCorpus, "vec_id", "embedding", dim = 2,
      k = 1, bits = 1, tables = 8)
    assert(floatGraph.schema("vec_id").dataType == org.apache.spark.sql.types.FloatType)
    assert(floatGraph.schema("neighbor").dataType == org.apache.spark.sql.types.FloatType)
    val fEdges = floatGraph.collect()
      .map(r => (r.getFloat(0) - 0.5f, r.getFloat(1) - 0.5f, r.getInt(2), r.getDouble(3)))
      .toSet
    val iEdges = intGraph.collect()
      .map(r => (r.getInt(0).toFloat, r.getInt(1).toFloat, r.getInt(2), r.getDouble(3)))
      .toSet
    assert(fEdges == iEdges, s"float-id graph diverged: $fEdges vs $iEdges")
    // a non-rankable id type refuses at call time instead of nulling out
    val badCorpus = Seq((Array(1.toByte), Array(1f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.annKnnGraph(badCorpus, "vec_id", "embedding", dim = 2, k = 1)
    }
    assert(e.getMessage.contains("unsupported id column type"))
  }

  test("clusterCosinePairs restricts candidates to cells; equals exact pairs within-cell") {
    val assigned = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0.9f, 0.1f), 0),   // near-dups, same cell
      (3L, Array(0.95f, 0.05f), 1),                          // near-dup of 1/2 but OTHER cell
      (4L, Array(0f, 1f), 1), (5L, Array(0.05f, 0.98f), 1),  // near-dups, same cell
      (6L, Array(0f, 0f), 0)                                 // zero-norm: dropped
    ).toDF("vec_id", "embedding", "cluster")
    val got = Similarity.clusterCosinePairs(assigned, "vec_id", "embedding", "cluster", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // (1,2) share cell 0; (4,5) share cell 1; (1,3)/(2,3) cross cells —
    // candidates never cross a cell boundary (SemDeDup semantics)
    assert(got == Set((1L, 2L), (4L, 5L)), got.mkString(","))
    // within-cell results equal the exact all-pairs join restricted to
    // the same cell (the candidate restriction is the ONLY difference)
    val exact = Similarity.exactCosinePairs(
      assigned.select("vec_id", "embedding"), "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cellOf = assigned.select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(got == exact.filter { case (a, b) => cellOf(a) == cellOf(b) })
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L), "zero-norm row leaked")
    // the cell-count contract: k = √n (the n·k + n²/k cost-law minimum),
    // clamped; pinned to the probed 2k/45, 20k/141, 200k/447 points
    assert(Similarity.semDedupCells(2000) == 45)
    assert(Similarity.semDedupCells(20000) == 141)
    assert(Similarity.semDedupCells(200000) == 447)
    assert(Similarity.semDedupCells(1) == 1)
    assert(Similarity.semDedupCells(Long.MaxValue) == (1 << 20))
    intercept[IllegalArgumentException](Similarity.semDedupCells(0))
  }

  test("AutoBits is the production default and resolves from the corpus size") {
    // the DEFAULT call (no bits) must be row-identical to explicitly
    // passing the autoBits contract value for this corpus — the contract
    // IS the default now (the r13 verdict's missing-default gap)
    val n = emb.count()
    val viaDefault = Similarity.annCosinePairs(emb, "vec_id", "embedding", 64, 0.45)
      .collect().map(_.toSeq).toSet
    val viaContract = Similarity.annCosinePairs(emb, "vec_id", "embedding", 64, 0.45,
        bits = Similarity.autoBits(n))
      .collect().map(_.toSeq).toSet
    assert(viaDefault == viaContract)
    assert(viaDefault.nonEmpty)
    // annKnnGraph inherits the same resolution
    val gDefault = Similarity.annKnnGraph(emb, "vec_id", "embedding", 64, k = 2)
      .collect().map(_.toSeq).toSet
    val gContract = Similarity.annKnnGraph(emb, "vec_id", "embedding", 64, k = 2,
        bits = Similarity.autoBits(n))
      .collect().map(_.toSeq).toSet
    assert(gDefault == gContract)
    // the gates pin bits = 6 explicitly — the sf0.01 corpus would
    // auto-resolve differently, which is exactly why they pin
    assert(Similarity.AutoBits == 0 && Similarity.autoBits(n) >= 1)
  }

  test("incrementalAnnKeep equals the full-corpus screen; sketch roundtrips; guard accounts") {
    val n = emb.count()
    val bits = Similarity.autoBits(n)
    val old = emb.filter(col("vec_id") % 10 =!= 7)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    // differential oracle: the incremental screen must drop exactly the
    // batch ids that appear in a full-corpus ANN pair with an OLD id
    val sketch = Similarity.srpSketch(old, "vec_id", "embedding", 64, bits)
    val kept = Similarity.incrementalAnnKeep(batch, sketch, old,
        "vec_id", "embedding", 64, 0.45, bits)
      .select("vec_id").as[Long].collect().toSet
    val all = Similarity.annCosinePairs(emb, "vec_id", "embedding", 64, 0.45,
        bits = bits)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val matchedBatch = all.flatMap { case (a, b) =>
      Seq(a, b).filter(id => id % 10 == 7 && Seq(a, b).exists(o => o % 10 != 7))
    }.toSet
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    assert(kept == batchIds -- matchedBatch, s"diff: ${kept -- (batchIds -- matchedBatch)}")
    // the sketch survives a parquet roundtrip (the artifact contract)
    val dir = java.nio.file.Files.createTempDirectory("graft-srpsk").toString
    sketch.write.parquet(s"$dir/sk")
    val kept2 = Similarity.incrementalAnnKeep(batch, spark.read.parquet(s"$dir/sk"), old,
        "vec_id", "embedding", 64, 0.45, bits)
      .select("vec_id").as[Long].collect().toSet
    assert(kept2 == kept)
    // an auto-resolved sketch keying is refused loudly (the two sides
    // would resolve different bits and silently find nothing)
    intercept[IllegalArgumentException](
      Similarity.srpSketch(old, "vec_id", "embedding", 64, bits = Similarity.AutoBits))
    intercept[IllegalArgumentException](
      Similarity.incrementalAnnKeep(batch, sketch, old,
        "vec_id", "embedding", 64, 0.45, bits = Similarity.AutoBits))
    // planted hot bucket: identical vectors flood one bucket on BOTH
    // sides and are guard-dropped (107 survives the screen unmatched);
    // a genuine small match (117 vs 50) keeps the result non-empty so
    // AQE cannot prune the CollectMetrics subtree (the observeDrops
    // scaladoc note) and is dropped by the screen as a real near-dup
    val survivor = Seq(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)
    val hotOld = ((1L to 40L).map(i => (i, Array.fill(8)(1.0f).toSeq)) :+ ((50L, survivor)))
      .toDF("vec_id", "embedding")
    val hotBatch = Seq((107L, Array.fill(8)(1.0f).toSeq), (117L, survivor))
      .toDF("vec_id", "embedding")
    val obs = org.apache.spark.sql.Observation()
    val hotKept = Similarity.incrementalAnnKeep(
        hotBatch, Similarity.srpSketch(hotOld, "vec_id", "embedding", 8, bits = 2),
        hotOld, "vec_id", "embedding", 8, 0.9, bits = 2,
        maxBucketSize = 30, dropMetrics = Some(obs))
      .select("vec_id").as[Long].collect().toSet
    assert(hotKept == Set(107L), hotKept.toString) // hot bucket guarded -> 107 kept; 117 matched 50
    val m = obs.get
    assert(m("dropped_buckets").asInstanceOf[Long] >= 1L, s"metrics=$m")
    assert(m("dropped_members").asInstanceOf[Long] >= 41L, s"metrics=$m")
  }

  test("incrementalSemDedupKeep equals the full-corpus cell screen; guard accounts per side") {
    import graft.operators.KMeans
    val model = KMeans.fit(emb, "vec_id", "embedding", k = 8, maxIters = 5)
    val old = emb.filter(col("vec_id") % 10 =!= 7)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    def assigned(part: org.apache.spark.sql.DataFrame) =
      KMeans.assign(part, "vec_id", "embedding", model)
        .join(part.select(col("vec_id"), col("embedding")), "vec_id")
    val kept = Similarity.incrementalSemDedupKeep(assigned(batch), assigned(old),
        "vec_id", "embedding", "cluster", 0.45, maxCellSize = Int.MaxValue)
      .select("vec_id").as[Long].collect().toSet
    // differential oracle: full-corpus within-cell pairs, restricted to
    // new-vs-old, decide exactly which batch ids drop
    val allPairs = Similarity.clusterCosinePairs(assigned(emb),
        "vec_id", "embedding", "cluster", 0.45, maxCellSize = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val matched = allPairs.flatMap { case (a, b) =>
      Seq(a, b).filter(id => id % 10 == 7 && Seq(a, b).exists(o => o % 10 != 7))
    }.toSet
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    assert(kept == batchIds -- matched, s"diff: ${kept.diff(batchIds -- matched)}")
    // planted hot cell: both sides flood cell 0 (guard drops it, batch
    // twin kept); the genuine small match in cell 1 survives the guard,
    // keeps the metrics subtree alive, and is screened out
    val hotOld = ((1L to 40L).map(i => (i, Array(1f, 0f), 0)) :+ ((50L, Array(0f, 1f), 1)))
      .toDF("vec_id", "embedding", "cluster")
    val hotNew = Seq((107L, Array(1f, 0f), 0), (117L, Array(0.05f, 0.98f), 1))
      .toDF("vec_id", "embedding", "cluster")
    val obs = org.apache.spark.sql.Observation()
    val hotKept = Similarity.incrementalSemDedupKeep(hotNew, hotOld,
        "vec_id", "embedding", "cluster", 0.9,
        maxCellSize = 30, dropMetrics = Some(obs))
      .select("vec_id").as[Long].collect().toSet
    assert(hotKept == Set(107L), hotKept.toString)
    val m = obs.get
    assert(m("dropped_buckets").asInstanceOf[Long] == 1L, s"metrics=$m")
    assert(m("dropped_members").asInstanceOf[Long] == 41L, s"metrics=$m")
  }

  test("hierarchical SemDeDup tier: composite cells route both levels; pairs equal exact within-cell") {
    import graft.operators.KMeans
    // two well-separated coarse clusters, each with two residual offsets
    // — the shape the coarse×fine router must split into 4 composite
    // cells; near-identical vectors (the +0.01 jitter pairs) must share
    // their composite cell
    // id ORDER matters to the deterministic InitFirstK seeding: ids 1, 2
    // (the coarse init) sit in different coarse clusters, and their
    // RESIDUALS (the fine init) sit in different fine offsets
    def v(base: Array[Float], j: Float) = base.map(_ + j)
    val cA = Array(10f, 0f, 0f, 0f)
    val cB = Array(0f, 10f, 0f, 0f)
    val fineB = (x: Array[Float]) => x.updated(2, x(2) + 2f)
    val rows = Seq(
      (1L, v(cA, 0f)), (3L, v(cA, 0.01f)),                 // coarse A, fine a
      (2L, v(fineB(cB), 0f)), (4L, v(fineB(cB), 0.01f)),   // coarse B, fine b
      (5L, v(fineB(cA), 0f)), (6L, v(fineB(cA), 0.01f)),   // coarse A, fine b
      (7L, v(cB, 0f)), (8L, v(cB, 0.01f))                  // coarse B, fine a
    )
    val df = rows.toDF("vec_id", "embedding")
    val (coarse, fine) = Similarity.fitHierarchical(df, "vec_id", "embedding",
      k1 = 2, k2 = 2, maxIters = 5)
    val cells = Similarity.hierarchicalCells(df, "vec_id", "embedding", coarse, fine)
      .as[(Long, Long)].collect().toMap
    // composite key replays from the models' own routing arithmetic
    rows.foreach { case (id, vec) =>
      val a = vec.map(_.toDouble)
      val c = coarse.nearest(a)
      val r = a.zip(coarse.centroids(c)).map { case (x, y) => x - y }
      assert(cells(id) == c.toLong * 2 + fine.nearest(r), s"id $id")
    }
    // jitter twins share a composite cell; the 4 composite cells are distinct
    Seq((1L, 3L), (2L, 4L), (5L, 6L), (7L, 8L)).foreach { case (a, b) =>
      assert(cells(a) == cells(b), s"twins $a/$b split: ${cells(a)} vs ${cells(b)}")
    }
    assert(Seq(1L, 2L, 5L, 7L).map(cells).distinct.size == 4, cells.toString)
    // clusterCosinePairs over the composite cells equals exact pairs
    // restricted to composite-cell equality (the flat-tier contract)
    val assigned = cells.toSeq.toDF("vec_id", "cell")
      .join(df, "vec_id")
    val got = Similarity.clusterCosinePairs(assigned, "vec_id", "embedding", "cell", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Similarity.exactCosinePairs(df, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == exact.filter { case (a, b) => cells(a) == cells(b) }, got.toString)
    assert(got.nonEmpty)
    // the cbrt cost-law contract, pinned (the flat tier's √n analog)
    assert(Similarity.semDedupCellsHier(1000000L) == ((100, 100)))
    assert(Similarity.semDedupCellsHier(8000) == ((20, 20)))
    assert(Similarity.semDedupCellsHier(1) == ((1, 1)))
    assert(Similarity.semDedupCellsHier(Long.MaxValue) == (((1 << 20), (1 << 20))))
    intercept[IllegalArgumentException](Similarity.semDedupCellsHier(0))
    // beyond the flat clamp the hierarchical effective cell count keeps
    // growing: k1*k2 at 10^13 rows exceeds the flat tier's frozen 2^20
    val (h1, h2) = Similarity.semDedupCellsHier(10000000000000L)
    assert(h1.toLong * h2 > (1L << 20))
  }

  test("native nearest-centroid expression is bit-identical to Model.nearest (lowest-index ties)") {
    import graft.operators.{KMeans, Quantize}
    val model = KMeans.Model(Array(
      Array(1.0, 0.0, 0.0, 0.0), Array(-1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0), Array(0.1, 0.1, 0.1, 0.1)))
    // deterministic pseudorandom probes + crafted EXACT ties: (0, y, 0, 0)
    // is equidistant from centroids 0 and 1 for every y — strict < must
    // keep the LOWEST index, exactly like Model.nearest
    val probes = (0 until 200).map { i =>
      val x = (i * 2654435761L % 1000).toDouble / 500.0 - 1.0
      (i.toLong, Array(x, x * 0.7 - 0.2, x * x - 0.5, 0.3 - x))
    }
    val df = probes.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("vec_id", "embedding")
    val got = KMeans.assign(df, "vec_id", "embedding", model)
      .as[(Long, Int)].collect().toMap
    probes.foreach { case (id, v) =>
      // the driver-side reference reads the SAME float-widened values the
      // expression sees (the column is array<float> cast to double)
      val widened = v.map(x => x.toFloat.toDouble)
      assert(got(id) == model.nearest(widened), s"id $id")
    }
    // crafted EXACT tie, isolated in a two-centroid model so nothing can
    // undercut the tied pair: (0, y, 0, 0) is equidistant from ±e₀ for
    // every y — strict < must keep the LOWEST index, like Model.nearest
    val tieModel = KMeans.Model(Array(Array(1.0, 0.0, 0.0, 0.0), Array(-1.0, 0.0, 0.0, 0.0)))
    val tieDf = Seq((1000L, Array(0f, 0.3f, 0f, 0f)), (1001L, Array(0f, -0.9f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val ties = KMeans.assign(tieDf, "vec_id", "embedding", tieModel)
      .as[(Long, Int)].collect().toMap
    assert(ties(1000L) == 0 && ties(1001L) == 0, "equidistant ties must take index 0")
    // null vector → null cluster (the interpreted UDF threw; expression
    // semantics are null-safe — operators filter upstream where needed)
    val withNull = Seq((1L, Some(Array(1f, 0f, 0f, 0f))), (2L, None))
      .toDF("vec_id", "embedding")
    val rows = KMeans.assign(withNull, "vec_id", "embedding", model)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(rows(1L).contains(0) && rows(2L).isEmpty)
    // a null ELEMENT inside a non-null vector fails LOUDLY: ArrayData
    // would read the slot as 0.0 and route to a plausible-but-wrong
    // cluster — the silent-corruption direction the guard closes (the
    // UDF threw an NPE here; the expression names the slot instead)
    val withNullSlot = Seq((1L, Seq[java.lang.Float](1f, null, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val err = intercept[Exception] {
      KMeans.assign(withNullSlot, "vec_id", "embedding", model).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(err).exists(c => c.getMessage != null &&
      c.getMessage.contains("null element")), s"wrong failure: $err")
    // PQ encode: native one-pass expression equals per-slice Model.nearest
    val (models, codes) = Quantize.productQuantize(
      df, "vec_id", "embedding", m = 2, k = 3, iters = 3)
    val byId = codes.as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    probes.foreach { case (id, v) =>
      val widened = v.map(x => x.toFloat.toDouble)
      val want = (0 until 2).map(si =>
        models(si).nearest(java.util.Arrays.copyOfRange(widened, si * 2, si * 2 + 2)))
      assert(byId(id) == want, s"id $id")
    }
  }

  test("hierarchical routing composes with the incremental screen (fixed two-level router)") {
    // the hierarchical tier IS just a cell assignment, so v11's
    // incremental screen takes it unchanged: fit the two-level router
    // ONCE, route batch and corpus with the SAME models, screen — the
    // composition a 10^12-row SemDeDup pipeline would actually run
    val old = emb.filter(col("vec_id") % 10 =!= 7)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    val (coarse, fine) = Similarity.fitHierarchical(emb, "vec_id", "embedding",
      k1 = 4, k2 = 4, maxIters = 5)
    def routed(part: org.apache.spark.sql.DataFrame) =
      Similarity.hierarchicalCells(part, "vec_id", "embedding", coarse, fine)
        .join(part.select(col("vec_id"), col("embedding")), "vec_id")
    val kept = Similarity.incrementalSemDedupKeep(routed(batch), routed(old),
        "vec_id", "embedding", "cell", 0.45, maxCellSize = Int.MaxValue)
      .select("vec_id").as[Long].collect().toSet
    // differential: full-corpus composite-cell pairs restricted to
    // new-vs-old decide exactly which batch ids drop
    val allPairs = Similarity.clusterCosinePairs(routed(emb),
        "vec_id", "embedding", "cell", 0.45, maxCellSize = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val matched = allPairs.flatMap { case (a, b) =>
      Seq(a, b).filter(id => id % 10 == 7 && Seq(a, b).exists(o => o % 10 != 7))
    }.toSet
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    assert(kept == batchIds -- matched, s"diff: ${kept.diff(batchIds -- matched)}")
    assert(kept.size < batchIds.size || matched.isEmpty) // sanity: the screen did run
  }

  test("clusterCosinePairs hot-cell guard drops a planted degenerate cell with accounting") {
    // cell 0 is degenerate (40 identical members — the near-dup-mass
    // collapse that skews real k-means cells); cell 1 is a bounded cell
    // whose pair must SURVIVE the guard (and keep the result non-empty so
    // AQE doesn't prune the metrics node)
    val rows = (1L to 40L).map(i => (i, Array(1f, 0f), 0)) ++
      Seq((100L, Array(0f, 1f), 1), (101L, Array(0.05f, 0.98f), 1))
    val assigned = rows.toDF("vec_id", "embedding", "cluster")
    val obs = org.apache.spark.sql.Observation()
    val got = Similarity.clusterCosinePairs(assigned, "vec_id", "embedding", "cluster", 0.9,
        maxCellSize = 30, dropMetrics = Some(obs))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 101L)), s"got $got")
    val m = obs.get
    assert(m("dropped_buckets").asInstanceOf[Long] == 1L, s"metrics=$m")
    assert(m("dropped_members").asInstanceOf[Long] == 40L, s"metrics=$m")
    // maxCellSize = Int.MaxValue restores exact per-cell enumeration
    val unguarded = Similarity.clusterCosinePairs(assigned, "vec_id", "embedding", "cluster", 0.9,
        maxCellSize = Int.MaxValue)
      .count()
    assert(unguarded == 40L * 39 / 2 + 1, s"got $unguarded")
  }

  test("KMeans.fit with k greater than the row count cycles candidates") {
    import graft.operators.KMeans
    val tiny = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val model = KMeans.fit(tiny, "vec_id", "embedding", k = 5, maxIters = 2)
    assert(model.centroids.length == 5) // no ArrayIndexOutOfBounds
    // null vectors are dropped, not fatal
    val withNull = Seq((1L, Array(1f, 0f)), (2L, null: Array[Float]))
      .toDF("vec_id", "embedding")
    assert(KMeans.fit(withNull, "vec_id", "embedding", 1, 1).centroids.nonEmpty)
  }

  test("VectorDot matches Scala reference on real embeddings") {
    val rows = emb.limit(50)
      .select(col("embedding"), VectorFunctions.vecDot(col("embedding"), col("embedding")).as("dot"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).map(_.toDouble)
      val expected = v.map(x => x * x).sum
      assert(math.abs(r.getDouble(1) - expected) < 1e-9)
    }
  }

  test("VectorDot participates in whole-stage codegen") {
    // the `*(n)` prefix in the plan string marks a WholeStageCodegen span
    val plan = emb.select(VectorFunctions.vecDot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan
    val codegenProject = plan.toString.linesIterator
      .exists(l => l.trim.startsWith("*(") && l.contains("vec_dot"))
    assert(codegenProject, s"vec_dot not inside a codegen span:\n$plan")
  }

  test("cosineSim is 1.0 for identical vectors, symmetric range") {
    val one = emb.select(VectorFunctions.cosineSim(col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0))
    assert(one.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("bruteForceKnn returns k ordered neighbors per query") {
    val knn = Similarity.bruteForceKnn(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", "vec_id", "embedding", 3)
      .collect()
    assert(knn.length == 15)
    knn.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("SRP hot-bucket guard reports dropped buckets via dropMetrics") {
    // 40 identical vectors land in the same bucket of every hash table; a
    // second identical pair survives the guard (and keeps the result
    // non-empty so AQE doesn't prune the metrics node)
    val dim = 8
    val survivor = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0f else -1.0f).toSeq
    val rows = (1L to 40L).map(i => (i, Array.fill(dim)(1.0f).toSeq)) ++
      Seq((100L, survivor), (101L, survivor))
    val hot = rows.toDF("vec_id", "embedding")
    val obs = org.apache.spark.sql.Observation()
    val cands = Similarity.srpCandidatePairs(hot, "vec_id", "embedding", dim,
      maxBucketSize = 30, dropMetrics = Some(obs))
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((100L, 101L)), s"got $cands")
    assert(!cands.exists(p => p._1 <= 40L && p._2 <= 40L), "hot pairs must be dropped")
    val m = obs.get
    assert(m("dropped_buckets").asInstanceOf[Long] >= 1L, s"metrics=$m")
    assert(m("dropped_members").asInstanceOf[Long] >= 40L, s"metrics=$m")
  }

  test("SRP-LSH candidates achieve full recall on top similar pairs") {
    // exact pairs above 0.45 vs LSH-candidate-verified pairs
    val exact = Similarity.exactCosinePairs(emb, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ann = Similarity.annCosinePairs(emb, "vec_id", "embedding", 64, 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ann.subsetOf(exact), "ANN must only return verified true pairs")
    // SRP at (6 bits, 12 tables) on cos>=0.45 (θ≈63°) has per-pair collision
    // prob ~1-(1-0.65^6)^12 ≈ 0.67 — assert recall is meaningfully high for
    // the *most* similar pairs rather than all of them.
    val top = Similarity.exactCosinePairs(emb, "vec_id", "embedding", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    if (top.nonEmpty) {
      val recall = top.count(ann.contains).toDouble / top.size
      assert(recall >= 0.5, s"recall on cos>=0.5 pairs too low: $recall")
    }
  }

  test("autoBits encodes the probed log2(n/bucket) scale contract") {
    // pinned to the BASELINE.md probe table: the operating points the
    // bits-vs-corpus-size probes actually ran (round 6: 2k → 6 bits at
    // ~32/bucket; round 8 re-key: 20k → 10 at ~20/bucket, 200k → 14 at
    // ~12/bucket) — autoBits must reproduce them, not merely be monotone
    assert(Similarity.autoBits(2000, 32) == 6)
    assert(Similarity.autoBits(20000, 20) == 10)
    assert(Similarity.autoBits(200000, 12) == 14)
    // the documented 100 TB landing zone: ~10^9 vectors, O(100)/bucket
    // sits inside the 20-24 band BASELINE.md records
    val big = Similarity.autoBits(1000000000L, 100)
    assert(big >= 20 && big <= 24, s"100TB-class bits out of band: $big")
    // clamps: a corpus smaller than the bucket never goes below 1 bit,
    // and the Long key packing bounds the top at 63
    assert(Similarity.autoBits(10, 32) == 1)
    assert(Similarity.autoBits(Long.MaxValue, 1) == 63)
    intercept[IllegalArgumentException](Similarity.autoBits(0, 32))
    intercept[IllegalArgumentException](Similarity.autoBits(100, 0))
  }

  test("productQuantize: complete code coverage, valid ranges, deterministic") {
    import graft.operators.Quantize
    val (models, codes) = Quantize.productQuantize(emb, "vec_id", "embedding", 4, 8, 2)
    assert(models.length == 4 && models.forall(_.centroids.length == 8))
    assert(models.forall(_.centroids.forall(_.length == 16)))
    val n = emb.count()
    assert(codes.count() == n * 4)
    val bad = codes.filter(col("code") < 0 || col("code") >= 8).count()
    assert(bad == 0)
    // deterministic across refits
    val (_, codes2) = Quantize.productQuantize(emb, "vec_id", "embedding", 4, 8, 2)
    assert(codes.as[(Long, Int, Int)].collect().toSet ==
      codes2.as[(Long, Int, Int)].collect().toSet)
  }

  test("ivfPqKnn restricts scoring to probed cells; distances agree with full ADC") {
    import graft.operators.{KMeans, Quantize}
    val (models, codes) = Quantize.productQuantize(emb, "vec_id", "embedding", 4, 8, 3)
    val cb = Quantize.pqCodebook(spark, models)
    val coarse = KMeans.fit(emb, "vec_id", "embedding", 8, 5)
    val queries = emb.filter(col("vec_id") < 10)
    val ivf = Quantize.ivfPqKnn(queries, emb, "vec_id", "embedding", coarse, 3,
      codes, cb, 4, 8, 5)
      .select("qid", "neighbor", "adc_dist").as[(Long, Long, Double)].collect()
    assert(ivf.groupBy(_._1).forall(_._2.length == 5))
    // every returned neighbor lives in one of its query's 3 probe cells
    val cells = KMeans.assign(emb, "vec_id", "embedding", coarse)
      .as[(Long, Int)].collect().toMap
    val qvecs = queries.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    assert(ivf.forall { case (q, n, _) =>
      coarse.probes(qvecs(q), 3).contains(cells(n))
    })
    // distances equal the exhaustive ADC for the same pairs
    val full = Quantize.pqAdcKnn(queries, codes, cb, "vec_id", "embedding", 4, 8, Int.MaxValue)
      .select("qid", "neighbor", "adc_dist").as[(Long, Long, Double)].collect()
      .map(t => ((t._1, t._2), t._3)).toMap
    assert(ivf.forall { case (q, n, d) => full((q, n)) == d })
  }

  test("pqAdcKnn: 5 ranked neighbors per query, meaningful recall vs exact") {
    import graft.operators.Quantize
    // finer codes than the gate (8 subspaces x 16 centroids = 32 bits)
    // to probe recall headroom; the pq0-pq2 gates pin exactness separately
    val (models, codes) = Quantize.productQuantize(emb, "vec_id", "embedding", 8, 16, 3)
    val cb = Quantize.pqCodebook(spark, models)
    val queries = emb.filter(col("vec_id") < 10)
    val got = Quantize.pqAdcKnn(queries, codes, cb, "vec_id", "embedding", 8, 16, 5)
      .select("qid", "neighbor", "rn").as[(Long, Long, Int)].collect()
    assert(got.length == 50)
    assert(got.groupBy(_._1).forall { case (_, rs) => rs.map(_._3).sorted.toSeq == Seq(1, 2, 3, 4, 5) })
    // 12-bit codes are lossy; require the exact euclidean top-5 overlap
    // to beat chance by a wide margin (random ≈ 5/n per pick)
    val exact = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < 10 && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nb"),
        aggregate(zip_with(col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d").asc, col("nb").asc)
    val ex = exact.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 5).select("qid", "nb").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val overlap = got.groupBy(_._1).map { case (q, rs) =>
      rs.map(_._2).count(ex(q).contains).toDouble / 5.0
    }
    val mean = overlap.sum / overlap.size
    // synthetic embeddings are near-uniform in 64-dim, so exact top-5 is
    // separated by tiny margins no coarse code can resolve — the claim
    // is beating CHANCE by an order of magnitude, not absolute recall
    val chance = 5.0 / (emb.count() - 1).toDouble
    assert(mean >= 10 * chance,
      s"ADC mean top-5 overlap vs exact too low: $mean (chance $chance)")
  }
}
