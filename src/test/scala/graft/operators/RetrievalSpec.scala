package graft.operators

import graft.SparkSuite

class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrfFuse: hand-computed reciprocal-rank arithmetic across two lists") {
    val lex = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("doc_id", "score")
    val sem = Seq((2L, 0.99), (4L, 0.5)).toDF("doc_id", "score")
    // ranks: lex 1→1 2→2 3→3; sem 2→1 4→2. k=60:
    //   doc 2: 1/62 + 1/61   doc 1: 1/61   doc 4: 1/62   doc 3: 1/63
    val got = Retrieval.rrfFuse(Seq(lex -> "score", sem -> "score"), "doc_id", k = 60, topK = 10)
      .as[(Long, Double)].collect().toSeq
    val expected = Seq(
      2L -> r6(1.0 / 62 + 1.0 / 61),
      1L -> r6(1.0 / 61),
      4L -> r6(1.0 / 62),
      3L -> r6(1.0 / 63))
    assert(got == expected, got.mkString(","))
    // topK cuts AFTER fusion, not per list
    assert(Retrieval.rrfFuse(Seq(lex -> "score", sem -> "score"), "doc_id", k = 60, topK = 3)
      .as[(Long, Double)].collect().map(_._1).toSeq == Seq(2L, 1L, 4L))
  }

  test("rrfFuse: score ties rank by ascending id; fused ties order by ascending id") {
    val a = Seq((6L, 0.9), (5L, 0.9)).toDF("doc_id", "score")
    // equal scores → doc 5 ranks 1, doc 6 ranks 2 (id tiebreak)
    val got = Retrieval.rrfFuse(Seq(a -> "score"), "doc_id", k = 60, topK = 2)
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq(5L -> r6(1.0 / 61), 6L -> r6(1.0 / 62)), got.mkString(","))
    // two docs fused to the SAME score (symmetric ranks across lists)
    // must come back id-ascending
    val l1 = Seq((8L, 0.9), (7L, 0.8)).toDF("doc_id", "score")
    val l2 = Seq((7L, 0.9), (8L, 0.8)).toDF("doc_id", "score")
    val tied = Retrieval.rrfFuse(Seq(l1 -> "score", l2 -> "score"), "doc_id", k = 60, topK = 2)
      .as[(Long, Double)].collect().toSeq
    assert(tied == Seq(7L -> r6(1.0 / 61 + 1.0 / 62), 8L -> r6(1.0 / 61 + 1.0 / 62)),
      tied.mkString(","))
  }

  test("rrfFuse: an uncut corpus-sized list fails loudly instead of serializing one task") {
    val big = spark.range(0, 50).selectExpr("id AS doc_id", "id * 0.01 AS score")
    val cut = Seq((1L, 0.9)).toDF("doc_id", "score")
    val ex = intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(cut -> "score", big -> "score"), "doc_id",
        k = 60, topK = 3, maxListRows = 10)
    }
    assert(ex.getMessage.contains("CUT") && ex.getMessage.contains("#1"), ex.getMessage)
    // at or below the ceiling the same lists fuse fine
    assert(Retrieval.rrfFuse(Seq(cut -> "score", big -> "score"), "doc_id",
      k = 60, topK = 3, maxListRows = 50).count() == 3)
    // a plan that PROVES its bound (root limit ≤ ceiling) passes for
    // free — the shape every top-k retrieval stage emits; a root limit
    // ABOVE the ceiling still falls through to the counted check
    assert(Retrieval.rrfFuse(Seq(big.orderBy($"score".desc).limit(5) -> "score"), "doc_id",
      k = 60, topK = 3, maxListRows = 10).count() == 3)
    val ex2 = intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(big.limit(40) -> "score"), "doc_id",
        k = 60, topK = 3, maxListRows = 10)
    }
    assert(ex2.getMessage.contains("CUT"), ex2.getMessage)
  }

  test("rrfFuse: filter/distinct over a cut list stay statically bounded (no preflight job)") {
    val big = spark.range(0, 50).selectExpr("id AS doc_id", "id * 0.01 AS score")
    // a filtered + deduped + re-projected cut list is still a cut list —
    // the static walk must prove it without scheduling a count job
    val wrapped = big.orderBy($"score".desc).limit(5)
      .filter($"doc_id" % 2 === 0)
      .distinct()
      .select($"doc_id", $"score")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fused =
      try {
        val f = Retrieval.rrfFuse(Seq(wrapped -> "score"), "doc_id",
          k = 60, topK = 3, maxListRows = 10)
        Thread.sleep(300)
        assert(jobs.get() == 0,
          s"statically-bounded list must not pay a preflight count, saw ${jobs.get()} jobs")
        f
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(fused.count() == 2) // top-5 is ids 45-49; evens = {46, 48}
    // dropDuplicates on a subset (Deduplicate node) is covered too
    val deduped = big.limit(5).dropDuplicates("doc_id")
    assert(Retrieval.rrfFuse(Seq(deduped -> "score"), "doc_id",
      k = 60, topK = 2, maxListRows = 10).count() == 2)
    // a filter over an UNBOUNDED scan still falls to the counted check
    val ex = intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(big.filter($"doc_id" >= 0) -> "score"), "doc_id",
        k = 60, topK = 3, maxListRows = 10)
    }
    assert(ex.getMessage.contains("CUT"), ex.getMessage)
  }

  test("rrfFuse: ranks derive from 6dp-ROUNDED scores (cross-engine contract)") {
    // raw scores differ past the 6th decimal — the rank tiebreak must
    // treat them as EQUAL and fall to the id, or two engines disagreeing
    // in the 7th decimal would derive different ranks
    val a = Seq((9L, 0.5000001), (3L, 0.5000002)).toDF("doc_id", "score")
    val got = Retrieval.rrfFuse(Seq(a -> "score"), "doc_id", k = 60, topK = 2)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(3L, 9L), got.mkString(","))
  }

  test("rrfFuseBatch equals N independent rrfFuse calls over per-query sub-lists") {
    // two queries with OVERLAPPING docs across queries — per-query ranks
    // and per-query cuts must never leak between query indices
    val lex = Seq(
      (0, 1L, 0.9), (0, 2L, 0.8), (0, 3L, 0.7),
      (1, 2L, 0.95), (1, 5L, 0.6)).toDF("query_ix", "doc_id", "score")
    val sem = Seq(
      (0, 2L, 0.99), (0, 4L, 0.5),
      (1, 1L, 0.9), (1, 2L, 0.1)).toDF("query_ix", "doc_id", "score")
    val got = Retrieval.rrfFuseBatch(
        Seq(lex -> "score", sem -> "score"), "doc_id", "query_ix", k = 60, topK = 10)
      .as[(Int, Long, Double)].collect().toSet
    val expected = Seq(0, 1).flatMap { ix =>
      Retrieval.rrfFuse(
          Seq(lex.filter($"query_ix" === ix).drop("query_ix") -> "score",
            sem.filter($"query_ix" === ix).drop("query_ix") -> "score"),
          "doc_id", k = 60, topK = 10)
        .as[(Long, Double)].collect().map { case (id, s) => (ix, id, s) }
    }.toSet
    assert(got == expected, s"got=$got expected=$expected")
    // per-query top-k cut: topK=1 keeps the best row of EACH query
    val top1 = Retrieval.rrfFuseBatch(
        Seq(lex -> "score", sem -> "score"), "doc_id", "query_ix", k = 60, topK = 1)
      .as[(Int, Long, Double)].collect()
    assert(top1.map(_._1).sorted.toSeq == Seq(0, 1), top1.mkString(","))
    // the preflight bounds TOTAL rows and fails loudly past it
    val ex = intercept[IllegalArgumentException] {
      Retrieval.rrfFuseBatch(Seq(lex -> "score"), "doc_id", "query_ix",
        k = 60, topK = 3, maxListRows = 3)
    }
    assert(ex.getMessage.contains("CUT"), ex.getMessage)
    // a root limit ≤ ceiling proves the bound statically (no count job,
    // the rrfFuse fast path shared by the batch form); above the
    // ceiling it still falls to the counted check
    assert(Retrieval.rrfFuseBatch(Seq(lex.limit(3) -> "score"), "doc_id", "query_ix",
      k = 60, topK = 10, maxListRows = 3).count() > 0)
    val ex2 = intercept[IllegalArgumentException] {
      Retrieval.rrfFuseBatch(Seq(lex.limit(5) -> "score"), "doc_id", "query_ix",
        k = 60, topK = 10, maxListRows = 4)
    }
    assert(ex2.getMessage.contains("CUT"), ex2.getMessage)
    intercept[IllegalArgumentException](
      Retrieval.rrfFuseBatch(Seq.empty, "doc_id", "query_ix"))
  }

  test("rrfFuse: invalid arguments fail loudly") {
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq.empty, "doc_id"))
    val a = Seq((1L, 0.5)).toDF("doc_id", "score")
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq(a -> "score"), "doc_id", k = 0))
    intercept[IllegalArgumentException](
      Retrieval.rrfFuse(Seq(a -> "score"), "doc_id", topK = 0))
  }
}
