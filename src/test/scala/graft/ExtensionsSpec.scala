package graft

import org.apache.spark.sql.SparkSession

/** End-to-end check of the `spark.sql.extensions` entry point: a session
  * built with ONLY the config string (no Scala-side registration call)
  * can invoke graft's custom expressions from SQL text.
  */
class ExtensionsSpec extends SparkSuite {

  test("a session built with the GraftExtensions class can call graft SQL functions") {
    spark // force the shared suite session (and its SparkContext) first
    // `spark.sql.extensions` is a STATIC conf read from the SparkContext at
    // context creation, so the config-string path can't be exercised on a
    // second session sharing this suite's context. Spark's loader does
    // exactly `Class.forName(name).newInstance().apply(extensions)` —
    // replicate that instantiation here, then build the session through the
    // public withExtensions API with the reflectively-created instance.
    val viaReflection = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(viaReflection)
      .create() // a NEW session — getOrCreate would return the suite session
    try {
      val d = s2.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect().head.getDouble(0)
      assert(d == 11.0)
      val sig = s2.sql("SELECT size(minhash_sig(word_shingle_hashes('a b c d e'))) AS n")
        .collect().head.getInt(0)
      assert(sig == 64)
      // injected as catalog functions: visible to SHOW FUNCTIONS
      val shown = s2.sql("SHOW FUNCTIONS LIKE 'vec_dot'").collect().map(_.getString(0))
      assert(shown.contains("vec_dot"))
      // the r7 text-statistics expressions are SQL-callable too
      val tc = s2.sql("SELECT token_counts('a b a') AS m").collect().head
        .getMap[String, Long](0)
      assert(tc == Map("a" -> 2L, "b" -> 1L))
      val ng = s2.sql("SELECT word_ngram_counts('x y x y', 2) AS m").collect().head
        .getMap[String, Long](0)
      assert(ng == Map("x y" -> 2L, "y x" -> 1L))
      val rep = s2.sql("SELECT repetition_scan('a a b').n_words AS n").collect().head.getLong(0)
      assert(rep == 3L)
      // literal args are range-validated at registration: n < 1 is a
      // clear error, not a garbage {""->tokens+1} map
      val bad = intercept[Exception](s2.sql("SELECT word_ngram_counts('a b', 0)").collect())
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(bad).flatMap(c => Option(c.getMessage))
        .exists(m => m.contains("must be >= 1")), bad.getMessage)
      val sd = s2.sql("SELECT segment_dedup('a b a').clean AS c").collect().head.getString(0)
      assert(sd == "a b")
      // hash_bucket from SQL = the Sampling/Sharding ops' exact bucket
      // (same splitmix64 chain, same unsigned remainder, default seed 42)
      val hb = s2.sql("SELECT hash_bucket(7, 1000000) AS b").collect().head.getLong(0)
      val expected = graft.functions.HashBucket(
        org.apache.spark.sql.catalyst.expressions.Literal(7L),
        1000000L, 42L).eval(null).asInstanceOf[Long]
      assert(hb == expected)
      val hbSeeded = s2.sql("SELECT hash_bucket(7, 1000000, 99) AS b").collect().head.getLong(0)
      assert(hbSeeded != hb, "seed must change the bucket for this id")
      val badB = intercept[Exception](s2.sql("SELECT hash_bucket(7, 0)").collect())
      assert(causes(badB).flatMap(c => Option(c.getMessage))
        .exists(_.contains("must be >=")), badB.getMessage)
      // extra arguments are REJECTED, not silently dropped: minhash_sig
      // hard-codes 64 hashes, so minhash_sig(text, 128) must fail loudly
      // rather than return 64-long signatures a 128-band config then
      // misreads
      val extra = intercept[Exception](s2.sql("SELECT minhash_sig('a b c', 128)").collect())
      assert(causes(extra).flatMap(c => Option(c.getMessage))
        .exists(_.contains("expects 1")), extra.getMessage)
      val missing = intercept[Exception](s2.sql("SELECT vec_dot(array(1.0))").collect())
      assert(causes(missing).flatMap(c => Option(c.getMessage))
        .exists(_.contains("expects 2")), missing.getMessage)
      // non-integral ids fail analysis by name (a silent cast would hash
      // every string id to NULL under ANSI-off)
      val badId = intercept[Exception](s2.sql("SELECT hash_bucket('uuid-1', 10)").collect())
      assert(causes(badId).flatMap(c => Option(c.getMessage))
        .exists(_.contains("integral")), badId.getMessage)
      // a literal beyond Int range must fail the validator, not wrap to a
      // small n that silently passes it
      val wrap = intercept[Exception](s2.sql("SELECT word_ngrams('a b', 4294967297)").collect())
      assert(causes(wrap).flatMap(c => Option(c.getMessage))
        .exists(m => m.contains("<=") || m.contains(">=")), wrap.getMessage)
      // zvalue from SQL = the Layout op's exact Morton interleave
      val zv = s2.sql("SELECT zvalue(5, 3, 4) AS z").collect().head.getLong(0)
      assert(zv == graft.functions.ZOrderFunctions.zOf(5L, 3L, 4))
      // and absent from a fresh session built WITHOUT the extension
      // (proves the extension did the work, not some global side effect;
      // deliberately NOT the shared suite session — other suites register
      // temp functions there, which would make this order-dependent)
      val plain = SparkSession.builder().master("local[4]").create()
      assert(plain.catalog.listFunctions().filter("name = 'vec_dot'").isEmpty)
    } finally {
      // do NOT s2.stop(): it shares the suite's SparkContext
      SparkSession.clearActiveSession()
    }
  }
}
