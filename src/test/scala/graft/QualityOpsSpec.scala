package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityFilters, Quantize, Redact, Sampling, TextClassify}

/** Round-6 curation additions: PII redaction, Gopher-style repetition
  * stats, data-mixing sampler, int8 scalar quantization.
  */
class QualityOpsSpec extends SparkSuite {
  import spark.implicits._

  // ---- Redact ----

  test("redact scrubs emails, phones, and IPs in rule order with correct counts") {
    val df = Seq(
      (1L, "mail a.b+c@ex-ample.org and x@y.io today"),
      (2L, "call +1-425-555-0199 or 425-555-0101 now"),
      (3L, "from 192.168.0.1 and 10.0.0.255"),
      (4L, "nothing to scrub here"),
      (5L, "all: u@v.com +1-206-555-0000 127.0.0.1")).toDF("id", "text")
    val got = Redact.redact(df, "text").select("id", "redacted", "n_redacted")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "mail <EMAIL> and <EMAIL> today", 2L)))
    assert(got(1) == ((2L, "call <PHONE> or <PHONE> now", 2L)))
    assert(got(2) == ((3L, "from <IP> and <IP>", 2L)))
    assert(got(3) == ((4L, "nothing to scrub here", 0L)))
    assert(got(4) == ((5L, "all: <EMAIL> <PHONE> <IP>", 3L)))
  }

  test("repetitionStats counts word length in CODE POINTS (DuckDB len() parity)") {
    // U+1D54F is one code point but two UTF-16 units; "𝕏a" must have
    // mean_word_len 2.0 (not 3.0) to match the oracle's len(w)
    val df = Seq((1L, "𝕏a 𝕏a bb")).toDF("doc_id", "text")
    val got = QualityFilters.repetitionStats(df, "doc_id", "text")
      .select("n_words", "dup_word_frac", "mean_word_len")
      .as[(Long, Double, Double)].collect().head
    assert(got == ((3L, 0.3333, 2.0)))
    // and the TokenScan-based avgTokenLen agrees
    val avg = df.select(graft.functions.TextFunctions.avgTokenLen(col("text")))
      .as[Double].collect().head
    assert(avg == 2.0)
  }

  test("unigramLogProb matches hand-computed LM scores; empty/null docs score 0") {
    // corpus: "a a b" + "a c" + empty + null → counts a=3, b=1, c=1, N=5
    val df = Seq((1L, "a a b"), (2L, "a c"), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = QualityFilters.unigramLogProb(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val la = math.log(3.0 / 5); val lb = math.log(1.0 / 5)
    assert(got(0) == ((1L, 3L, r4((la + la + lb) / 3))))
    assert(got(1) == ((2L, 2L, r4((la + lb) / 2))))
    assert(got(2) == ((3L, 0L, 0.0)))
    assert(got(3) == ((4L, 0L, 0.0)))
  }

  test("redact: email rule consumes its digits before the phone rule sees them; null text survives") {
    // The local part is digit-heavy: if phone ran first it would match inside
    // the email. Rule order must prevent double redaction.
    val df = Seq((1L, "user00000042@example.com"), (2L, null)).toDF("id", "text")
    val got = Redact.redact(df, "text").select("id", "redacted", "n_redacted")
      .as[(Long, Option[String], Option[Long])].collect().sortBy(_._1)
    assert(got(0) == ((1L, Some("<EMAIL>"), Some(1L))))
    assert(got(1) == ((2L, None, None)))
  }

  // ---- QualityFilters ----

  test("repetitionStats computes exact fractions on a hand-checked doc") {
    // "a a b a c" → 5 words, 3 distinct, top 'a'=3, lens 5*1
    // bigrams: "a a","a b","b a","a c" → 4, all distinct, top=1
    val df = Seq((1L, "a a b a c")).toDF("doc_id", "text")
    val r = QualityFilters.repetitionStats(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_words") == 5L)
    assert(r.getAs[Double]("dup_word_frac") == 0.4) // 1 - 3/5
    assert(r.getAs[Double]("top_word_frac") == 0.6) // 3/5
    assert(r.getAs[Double]("top_bigram_frac") == 0.25) // 1/4
    assert(r.getAs[Double]("mean_word_len") == 1.0)
  }

  test("repetitionStats: single-word and empty docs don't produce nulls") {
    val df = Seq((1L, "word"), (2L, ""), (3L, "  ")).toDF("doc_id", "text")
    val got = QualityFilters.repetitionStats(df, "doc_id", "text")
      .select("doc_id", "n_words", "top_bigram_frac", "dup_word_frac")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1L, 0.0, 0.0)))
    assert(got(1) == ((2L, 0L, 0.0, 0.0)))
    assert(got(2) == ((3L, 0L, 0.0, 0.0)))
  }

  test("repetitionStats flags a degenerate repeated doc that keepDecision rejects") {
    val df = Seq((1L, "spam spam spam spam spam spam"), (2L, "a varied doc with many distinct words here"))
      .toDF("doc_id", "text")
    val got = QualityFilters.repetitionStats(df, "doc_id", "text")
      .withColumn("keep", QualityFilters.keepDecision(0.55, 0.3, 0.5))
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(!got(1L) && got(2L))
  }

  // ---- mixtureSample ----

  test("mixtureSample: budget >= stratum total keeps everything; rates scale with totals") {
    val df = (0L until 3000L).map { i =>
      val src = if (i % 3 == 0) "big" else "small"
      (i, src, if (src == "big") 100L else 10L)
    }.toDF("id", "src", "w")
    // big total = 100k, small total = 20k; budget 20k → big rate 0.2, small rate 1.0
    val kept = Sampling.mixtureSample(df, "id", "src", "w", 20000L)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 2000L, s"small stratum under budget keeps all rows: $kept")
    assert(kept("big") > 120 && kept("big") < 280, s"big stratum ~20%: $kept")
  }

  test("mixtureSample keep set is independent of partitioning (auditable mix)") {
    val df = (0L until 2000L).map(i => (i, s"s${i % 4}", 7L)).toDF("id", "src", "w")
    val a = Sampling.mixtureSample(df.repartition(1), "id", "src", "w", 2000L)
      .select("id").as[Long].collect().toSet
    val b = Sampling.mixtureSample(df.repartition(17), "id", "src", "w", 2000L)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  // ---- temperatureSample ----

  test("temperatureSample at alpha=1 preserves the natural mix (uniform rate)") {
    // 2000 rows, B=500 → B·1e6/N = 250000 exactly, so every stratum's
    // threshold equals hashSample's at rate 0.25 and the keep sets match
    val df = (0L until 2000L).map(i => (i, if (i % 4 == 0) "head" else "tail")).toDF("id", "g")
    val temp = Sampling.temperatureSample(df, "id", "g", alpha = 1.0, targetSize = 500L)
      .select("id").as[Long].collect().toSet
    val flat = Sampling.hashSample(df, "id", 0.25).select("id").as[Long].collect().toSet
    assert(temp == flat && temp.nonEmpty)
  }

  test("temperatureSample at alpha=0.5 upweights the tail stratum") {
    // natural shares 0.9/0.1; sqrt weights → target shares 0.75/0.25:
    // the tail's kept share must beat its natural share
    val df = (0L until 4000L).map(i => (i, if (i % 10 == 0) "tail" else "head")).toDF("id", "g")
    val kept = Sampling.temperatureSample(df, "id", "g", alpha = 0.5, targetSize = 1000L)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    val total = kept.values.sum
    assert(total > 800 && total < 1200, s"expected ~1000 kept: $kept")
    val tailShare = kept("tail").toDouble / total
    assert(tailShare > 0.18 && tailShare < 0.32, s"tail share should be ~0.25: $kept")
  }

  test("temperatureSample caps oversubscribed strata at keep-everything") {
    // the 20-row stratum's target (≈ B·q ≈ 414 at these weights) far
    // exceeds its size → rate caps at 1.0 and every row survives
    val df = (0L until 2020L).map(i => (i, if (i < 20) "tiny" else "big")).toDF("id", "g")
    val kept = Sampling.temperatureSample(df, "id", "g", alpha = 0.5, targetSize = 1500L)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(kept("tiny") == 20L, s"capped stratum keeps all rows: $kept")
  }

  test("temperatureSample keep set is independent of partitioning (auditable mix)") {
    val df = (0L until 2000L).map(i => (i, s"s${i % 3}")).toDF("id", "g")
    val a = Sampling.temperatureSample(df.repartition(1), "id", "g", 0.5, 600L)
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(df.repartition(17), "id", "g", 0.5, 600L)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("temperatureSample rejects invalid alpha and target") {
    val df = Seq((1L, "a")).toDF("id", "g")
    intercept[IllegalArgumentException](Sampling.temperatureSample(df, "id", "g", 0.0, 10L))
    intercept[IllegalArgumentException](Sampling.temperatureSample(df, "id", "g", 1.5, 10L))
    intercept[IllegalArgumentException](Sampling.temperatureSample(df, "id", "g", 0.5, 0L))
  }

  // ---- Quantize ----

  test("repeatUpsample: epochs are contiguous, fractional copy rides the hashSample keep set") {
    val df = (1L to 400L).map(i => (i, if (i % 4 == 0) "a" else if (i % 4 == 1) "b" else "c"))
      .toDF("id", "g")
    val out = Sampling.repeatUpsample(df, "id", "g",
      factors = Map("a" -> 2.5, "b" -> 0.5), defaultFactor = 1.0, seed = 7L)
    val perId = out.groupBy("id", "g")
      .agg(count(lit(1)).as("k"), min("epoch").as("lo"), max("epoch").as("hi"))
      .as[(Long, String, Long, Int, Int)].collect()
    // every surviving id's epochs are exactly 0..k-1
    assert(perId.forall { case (_, _, k, lo, hi) => lo == 0 && hi == k - 1 })
    val kOf = perId.map(r => r._1 -> r._3).toMap
    // a: 2 or 3 copies; b: present iff sampled (1 copy); c: exactly 1
    assert(perId.filter(_._2 == "a").forall(r => r._3 == 2 || r._3 == 3))
    assert(perId.filter(_._2 == "b").forall(_._3 == 1))
    assert(perId.filter(_._2 == "c").forall(_._3 == 1))
    assert(kOf.size < 400) // some b-rows dropped
    // differential vs hashSample on the SAME seed: a's third copy is the
    // 50 % keep set, b's survivors the 50 % keep set — one hash, one
    // contract across the sampling family
    val aThird = perId.filter(r => r._2 == "a" && r._3 == 3).map(_._1).toSet
    val aKeep = Sampling.hashSample(df.filter($"g" === "a"), "id", 0.5, 7L)
      .select("id").as[Long].collect().toSet
    assert(aThird == aKeep)
    val bSurvive = perId.filter(_._2 == "b").map(_._1).toSet
    val bKeep = Sampling.hashSample(df.filter($"g" === "b"), "id", 0.5, 7L)
      .select("id").as[Long].collect().toSet
    assert(bSurvive == bKeep)
    // factor 0 drops the stratum; negative factors are rejected loudly
    val none = Sampling.repeatUpsample(df, "id", "g", Map("c" -> 0.0), 1.0, 7L)
    assert(none.filter($"g" === "c").count() == 0)
    intercept[IllegalArgumentException](
      Sampling.repeatUpsample(df, "id", "g", Map("a" -> -0.1), 1.0, 7L))
  }

  test("repeatUpsample multiset is independent of partitioning") {
    val df = (1L to 300L).map(i => (i, if (i % 2 == 0) "x" else "y")).toDF("id", "g")
    def multiset(parts: Int) =
      Sampling.repeatUpsample(df.repartition(parts), "id", "g",
        Map("x" -> 1.7, "y" -> 0.3), 1.0, 11L)
        .groupBy("id").agg(count(lit(1)).as("k"))
        .as[(Long, Long)].collect().toMap
    assert(multiset(1) == multiset(13))
  }

  test("kfoldAssign: exclusive exhaustive folds, stable under growth, hash-replayable") {
    val df = (1L to 500L).toDF("id")
    val folds = Sampling.kfoldAssign(df, "id", 5, seed = 9L)
      .as[(Long, Int)].collect().toMap
    assert(folds.size == 500 && folds.values.forall(f => f >= 0 && f < 5))
    // every fold populated, roughly balanced
    val sizes = folds.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == 5 && sizes.values.forall(n => n > 50 && n < 150), sizes.toMap.toString)
    // fold = the operator's own hash mod k — and stability under growth:
    // the first 500 ids keep their folds when 500 more arrive
    val grown = Sampling.kfoldAssign((1L to 1000L).toDF("id"), "id", 5, seed = 9L)
      .as[(Long, Int)].collect().toMap
    assert((1L to 500L).forall(i => grown(i) == folds(i)))
    val buckets = df.select(col("id"),
        graft.functions.HashFunctions.hashBucket(col("id"), Sampling.Buckets, 9L))
      .as[(Long, Long)].collect().toMap
    assert((1L to 500L).forall(i => folds(i) == (buckets(i) % 5).toInt))
    intercept[IllegalArgumentException](Sampling.kfoldAssign(df, "id", 1))
  }

  test("weightedReservoirPerGroup matches a local A-ES replay; nonpositive weights fail loudly") {
    val df = (1L to 120L).map(i => (i, if (i % 2 == 0) "x" else "y", (i % 9 + 1).toDouble))
      .toDF("id", "g", "w")
    val got = Sampling.weightedReservoirPerGroup(df, "id", "w", "g", k = 4, seed = 11L)
      .as[(Long, String, Double)].collect().map(r => (r._2, r._1) -> r._3).toMap
    // replay with the operator's own hash primitive
    val buckets = df.select(col("id"),
        graft.functions.HashFunctions.hashBucket(col("id"), Sampling.Buckets, 11L))
      .as[(Long, Long)].collect().toMap
    val expect = (1L to 120L).map { i =>
      val u = (buckets(i) + 1).toDouble / Sampling.Buckets.toDouble
      (i, if (i % 2 == 0) "x" else "y", math.log(u) / (i % 9 + 1).toDouble)
    }.groupBy(_._2).flatMap { case (g, rows) =>
      rows.sortBy(r => (-r._3, r._1)).take(4).map(r => (g, r._1) -> r._3)
    }.toMap
    assert(got == expect)
    // a zero weight fails the job loudly, never a silent drop
    val bad = Seq((1L, "x", 1.0), (2L, "x", 0.0)).toDF("id", "g", "w")
    val e = intercept[Exception](
      Sampling.weightedReservoirPerGroup(bad, "id", "w", "g", 1).collect())
    assert(e.getMessage.contains("nonpositive weight") ||
      Option(e.getCause).exists(_.getMessage.contains("nonpositive weight")))
  }

  test("perplexityBuckets: integer tercile boundaries, rank parity, tokenless docs to tail") {
    val docs = Seq(
      (1L, "a", "the the the common words"), (2L, "a", "the common words here"),
      (3L, "a", "rare zephyr quixotic"), (4L, "a", "the the common"),
      (5L, "a", "words common the"), (6L, "a", "unusual vocabulary entirely"),
      (7L, "b", "the common words"), (8L, "b", "zzz yyy xxx"),
      (9L, "b", ""), (10L, "b", "the the the"),
      (11L, null, "words in an unattributed stratum")).toDF("id", "g", "text")
    val out = QualityFilters.perplexityBuckets(docs, "id", "text", "g")
      .as[(Long, Option[String], String, Double)].collect()
      .map(r => (r._1, r._2.orNull, r._3, r._4))
    // tokenless doc 9 lands in tail without a rank slot
    assert(out.find(_._1 == 9L).get._3 == "tail")
    // a NULL stratum is a stratum like any other (the mixtureSample
    // convention), never silently dropped; alone in its stratum (n=1,
    // rank 1: 10^6 > 666667) it lands in tail
    assert(out.find(_._1 == 11L).get._3 == "tail")
    assert(out.length == 11)
    // replay the boundary locally: rank per stratum over (score DESC, id ASC)
    for (g <- Seq("a", "b")) {
      val ranked = out.filter(r => r._2 == g && r._1 != 9L)
        .sortBy(r => (-r._4, r._1))
      val n = ranked.length
      val expect = ranked.zipWithIndex.map { case (r, i) =>
        val rn = i + 1L
        val b = if (rn * 1000000L <= n * 333333L) "head"
        else if (rn * 1000000L <= n * 666667L) "middle" else "tail"
        r._1 -> b
      }.toMap
      assert(ranked.forall(r => r._3 == expect(r._1)), s"stratum $g: ${ranked.toSeq}")
    }
    // stratum a (n=6): terciles are 1/3/2 under the integer boundary
    val aCounts = out.filter(_._2 == "a").groupBy(_._3).view.mapValues(_.length).toMap
    assert(aCounts == Map("head" -> 1, "middle" -> 3, "tail" -> 2))
    intercept[IllegalArgumentException](QualityFilters.perplexityBuckets(
      docs, "id", "text", "g", Seq(500000L), Seq("only")))
    intercept[IllegalArgumentException](QualityFilters.perplexityBuckets(
      docs, "id", "text", "g", Seq(700000L, 300000L), Seq("x", "y", "z")))
  }

  test("perplexityBucketsApprox agrees with the exact form away from the cut boundaries") {
    // 300 docs per stratum with DISTINCT scores within each stratum
    // ((i*7) % 289 collides only 289 apart — opposite parity, other
    // stratum), so the only legitimate divergence is the off-by-one at
    // each cut (the rank form counts floor(n·c) rows, the threshold form
    // takes score >= the quantile element); at accuracy 10000 over 300
    // rows the sketch itself is exact
    val docs = (1L to 600L).map { i =>
      val g = if (i % 2 == 0) "x" else "y"
      val rare = Seq.fill(((i * 7) % 289).toInt + 1)(s"rare$i").mkString(" ")
      (i, g, s"the common words $rare")
    }.toDF("id", "g", "text")
    val exact = QualityFilters.perplexityBuckets(docs, "id", "text", "g")
      .as[(Long, String, String, Double)].collect().map(r => r._1 -> r._3).toMap
    val approx = QualityFilters.perplexityBucketsApprox(docs, "id", "text", "g")
      .as[(Long, String, String, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(approx.keySet == exact.keySet)
    val agree = exact.count { case (id, b) => approx(id) == b }
    // ties at the cut can legitimately differ (rank form breaks ties by
    // id, threshold form keeps all tied scores together); everything
    // else must match
    assert(agree >= exact.size - 20, s"agree=$agree of ${exact.size}")
    // bucket fractions stay near the requested terciles per stratum
    val perG = QualityFilters.perplexityBucketsApprox(docs, "id", "text", "g")
      .groupBy("g", "bucket").count().as[(String, String, Long)].collect()
    perG.foreach { case (_, _, n) => assert(n > 60 && n < 140, perG.toSeq) }
  }

  test("naiveBayes: hand-checked smoothing, OOV prior fallback, tie to largest label") {
    val train = Seq(
      ("spam", "buy pills now"), ("spam", "buy now"),
      ("ham", "meeting notes today"), ("ham", "notes for the meeting"),
      ("ham", "today meeting")).toDF("lab", "text")
    val predict = Seq(
      (1L, "buy pills"), (2L, "meeting today"), (3L, "zzz"), (4L, "")).toDF("id", "text")
    val out = TextClassify.naiveBayes(train, predict, "id", "lab", "text")
      .as[(Long, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // vocab V=8; spam ntok=5 (buy2 pills1 now2), ham ntok=9
    // (meeting3 notes2 today2 for1 the1); priors 2/5 and 3/5
    assert(out(1L)._1 == "spam" && out(2L)._1 == "ham")
    val spamScore = math.log(0.4) + math.log(3.0 / 13) + math.log(2.0 / 13)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._2 == r4(spamScore))
    // fully-OOV and empty docs fall back to the prior argmax (ham, 3/5)
    val hamPrior = r4(math.log(0.6))
    assert(out(3L) == ("ham", hamPrior) && out(4L) == ("ham", hamPrior))
    // exact score tie (symmetric corpus): the struct-max contract picks
    // the lexicographically largest label
    val sym = Seq(("a", "x"), ("b", "x")).toDF("lab", "text")
    val tied = TextClassify.naiveBayes(sym, Seq((9L, "x")).toDF("id", "text"),
      "id", "lab", "text").as[(Long, String, Double)].collect()
    assert(tied.head._2 == "b")
  }

  test("scalarQuantizeInt8: known vectors quantize to exact codes; degenerate dim → 0") {
    val df = Seq(
      (0L, Array(0.0f, 5.0f, 1.0f)),
      (1L, Array(1.0f, 5.0f, 3.0f)),
      (2L, Array(2.0f, 5.0f, 5.0f))).toDF("vec_id", "embedding")
    val got = Quantize.scalarQuantizeInt8(df, "embedding")
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().sortBy(_._1)
    // dim0: range [0,2] → codes floor(v*127.5)-128 = -128, -1, 127
    // dim1: degenerate → 0; dim2: range [1,5] → floor((v-1)*63.75)-128
    assert(got(0)._2 == Seq(-128, 0, -128))
    assert(got(1)._2 == Seq(-1, 0, -1))
    assert(got(2)._2 == Seq(127, 0, 127))
  }

  test("scalarQuantizeInt8 codes stay in [-128, 127] and extremes hit both ends") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val codes = Quantize.scalarQuantizeInt8(e, "embedding")
      .select(explode(col("codes")).as("c"))
      .agg(min("c"), max("c")).as[(Int, Int)].collect().head
    assert(codes._1 == -128 && codes._2 == 127)
  }

  test("normalizeText: case folds, strips punctuation, collapses whitespace") {
    import graft.functions.TextFunctions.normalizeText
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val got = Seq("  The CAT, sat!  on--the mat. ", "", "...", "a1 B2")
      .toDF("text").select(normalizeText(col("text"))).as[String].collect().toSeq
    assert(got == Seq("the cat sat on the mat", "", "", "a1 b2"))
  }
}
