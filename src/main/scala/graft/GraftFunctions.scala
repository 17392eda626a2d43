package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{HashBucket, SrpKeys, TextFunctions, VectorDot}
import graft.operators.Dedup

/** SQL surface for graft's custom Catalyst expressions: after
  * `GraftFunctions.register(spark)`, plain `spark.sql` text can call
  * `vec_dot`, `minhash_sig`, `srp_keys`, `word_shingle_hashes`,
  * `char_shingle_hashes`, `token_counts`, `word_ngram_counts`,
  * `word_ngrams`, `repetition_scan`, `segment_dedup`, `hash_bucket` — the engine's
  * extensions behave like built-ins for SQL users.
  */
object GraftFunctions {

  private def toDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  /** Exact-arity guard: a missing/extra SQL argument must name the
    * function and the expected count, not surface as a bare
    * IndexOutOfBoundsException — and extra arguments must never be
    * silently dropped (a user writing `minhash_sig(text, 128)` would
    * otherwise get 64-hash signatures with no warning).
    */
  private def arity(es: Seq[Expression], fn: String, min: Int, max: Int): Seq[Expression] = {
    if (es.length < min || es.length > max) {
      val want = if (min == max) s"$min" else s"$min to $max"
      throw new IllegalArgumentException(
        s"$fn: expects $want argument(s), got ${es.length}")
    }
    es
  }

  private def intLit(es: Seq[Expression], idx: Int, fn: String, arg: String): Int = {
    val v = longLit(es, idx, fn, arg)
    // range-check BEFORE narrowing: a silent toInt would wrap 2^32+1 to 1
    // and sail through the >=1 validation it appears to have passed
    if (v > Int.MaxValue) throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be <= ${Int.MaxValue}, got $v")
    v.toInt
  }

  /** Literal integer argument with a lower bound — one validator for
    * both SQL arg surfaces ([[intLit]] delegates).
    */
  private def longLit(es: Seq[Expression], idx: Int, fn: String, arg: String,
      min: Long = 1L): Long = {
    if (es.length <= idx) throw new IllegalArgumentException(
      s"$fn: missing argument '$arg' (expects ${idx + 1} arguments)")
    val e = es(idx)
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got ${e.sql}")
    e.eval(null) match {
      case n: Number if n.longValue() >= min => n.longValue()
      case n: Number => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be >= $min, got ${n.longValue()}")
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be an integer literal, got $other")
    }
  }

  /** Name → builder for every SQL-callable graft expression — shared by
    * [[register]] (temp functions on an existing session) and
    * [[GraftExtensions]] (catalog injection at session build).
    */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => { arity(es, "vec_dot", 2, 2)
      VectorDot(toDoubleArray(es(0)), toDoubleArray(es(1))) }),
    "minhash_sig" -> (es => { arity(es, "minhash_sig", 1, 1)
      Dedup.MinHashSig(es.head, 64, 42L) }),
    "srp_keys" -> (es => { arity(es, "srp_keys", 1, 1)
      SrpKeys(toDoubleArray(es.head), 64, 6, 12, 42L) }),
    "word_shingle_hashes" -> (es => { arity(es, "word_shingle_hashes", 1, 1)
      Dedup.ShingleHashes(es.head, 3, word = true) }),
    "char_shingle_hashes" -> (es => { arity(es, "char_shingle_hashes", 1, 1)
      Dedup.ShingleHashes(es.head, 5, word = false) }),
    // narrow per-document text statistics (r7): token/gram count maps,
    // distinct n-grams, the Gopher repetition counters, segment dedup.
    // The n/delim arguments must be foldable literals (evaluated at
    // registration-call time, like Spark's own `repeat`-style args).
    "token_counts" -> (es => { arity(es, "token_counts", 1, 1)
      TextFunctions.TokenCountsScan(es.head, 1) }),
    "word_ngram_counts" -> (es => { arity(es, "word_ngram_counts", 2, 2)
      TextFunctions.TokenCountsScan(es(0), intLit(es, 1, "word_ngram_counts", "n")) }),
    "word_ngrams" -> (es => { arity(es, "word_ngrams", 2, 2)
      TextFunctions.WordNGrams(es(0), intLit(es, 1, "word_ngrams", "n")) }),
    "repetition_scan" -> (es => { arity(es, "repetition_scan", 1, 1)
      TextFunctions.RepetitionScan(es.head) }),
    "segment_dedup" -> (es => { arity(es, "segment_dedup", 1, 1)
      TextFunctions.SegmentDedup(es.head, ' ') }),
    // consistent-sampling primitive (splitmix64 → unsigned bucket):
    // hash_bucket(id, buckets[, seed]) — SQL users get the same
    // deterministic keep/shard decisions as the Sampling/Sharding ops.
    // The id is passed UNCAST: HashBucket's own type check rejects
    // non-integral ids at analysis (a silent Cast would turn string ids
    // into NULL under ANSI-off and truncate fractional doubles).
    "hash_bucket" -> (es => { arity(es, "hash_bucket", 2, 3)
      HashBucket(es(0),
        longLit(es, 1, "hash_bucket", "buckets"),
        if (es.length > 2) longLit(es, 2, "hash_bucket", "seed", min = Long.MinValue) else 42L) }),
    // Morton interleave for Z-order layouts: zvalue(c1, ..., ck, bits),
    // k >= 2 — same uncast-integral-inputs stance as hash_bucket
    // (ZValue's own type check rejects non-integral coordinates at
    // analysis; its require bounds k*bits <= 63)
    "zvalue" -> (es => { arity(es, "zvalue", 3, 32)
      graft.functions.ZValue(es.init.toSeq, intLit(es, es.length - 1, "zvalue", "bits")) }))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      graftbridge.registerFunction(spark, name, builder)
    }
}
