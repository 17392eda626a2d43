package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

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

  private def intLit(es: Seq[Expression], idx: Int, fn: String, arg: String): Int =
    longLit(es, idx, fn, arg).toInt

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
    "vec_dot" -> (es => VectorDot(toDoubleArray(es(0)), toDoubleArray(es(1)))),
    "minhash_sig" -> (es => Dedup.MinHashSig(es.head, 64, 42L)),
    "srp_keys" -> (es => SrpKeys(toDoubleArray(es.head), 64, 6, 12, 42L)),
    "word_shingle_hashes" -> (es => Dedup.ShingleHashes(es.head, 3, word = true)),
    "char_shingle_hashes" -> (es => Dedup.ShingleHashes(es.head, 5, word = false)),
    // narrow per-document text statistics (r7): token/gram count maps,
    // distinct n-grams, the Gopher repetition counters, segment dedup.
    // The n/delim arguments must be foldable literals (evaluated at
    // registration-call time, like Spark's own `repeat`-style args).
    "token_counts" -> (es => TextFunctions.TokenCountsScan(es.head, 1)),
    "word_ngram_counts" -> (es =>
      TextFunctions.TokenCountsScan(es(0), intLit(es, 1, "word_ngram_counts", "n"))),
    "word_ngrams" -> (es =>
      TextFunctions.WordNGrams(es(0), intLit(es, 1, "word_ngrams", "n"))),
    "repetition_scan" -> (es => TextFunctions.RepetitionScan(es.head)),
    "segment_dedup" -> (es => TextFunctions.SegmentDedup(es.head, ' ')),
    // consistent-sampling primitive (splitmix64 → unsigned bucket):
    // hash_bucket(id, buckets[, seed]) — SQL users get the same
    // deterministic keep/shard decisions as the Sampling/Sharding ops
    "hash_bucket" -> (es => HashBucket(Cast(es(0), LongType),
      longLit(es, 1, "hash_bucket", "buckets"),
      if (es.length > 2) longLit(es, 2, "hash_bucket", "seed", min = Long.MinValue) else 42L)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      graftbridge.registerFunction(spark, name, builder)
    }
}
