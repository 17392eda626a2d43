package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Shared integral-only input contract for the hash expressions: a bare
  * Cast would turn non-numeric ids into NULL (ANSI off) — every row
  * silently hashing to nothing is the exact silent-NULL hazard the
  * sampling ops exist to avoid — and would truncate fractional doubles
  * without notice. Rejecting at analysis names the problem instead.
  */
private[functions] trait IntegralIdInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral id, got ${other.simpleString} — cast explicitly " +
        "if the id is genuinely numeric text (and accept that unparsable values hash as NULL)")
  }
}

/** splitmix64 finalizer over a long id, reduced to a bucket in
  * `[0, buckets)` by UNSIGNED remainder — the deterministic-sampling
  * primitive (consistent sampling: the same id lands in the same bucket
  * in every run, on every executor, at every scale, so samples are
  * reproducible and composable across pipeline stages).
  *
  * Full whole-stage codegen (a handful of long ops per row — sampling
  * runs in the scan stage, no shuffle). The mix constants are public
  * (Steele et al., "Fast Splittable Pseudorandom Number Generators",
  * OOPSLA 2014); the DuckDB oracle replays the identical chain in
  * mod-2^64 HUGEINT arithmetic (see CurationQueries.splitmixSql).
  *
  * Unsigned remainder (not `pmod`) is load-bearing: 2^64 mod buckets ≠ 0
  * in general, so the signed and unsigned remainders of the high-bit-set
  * half of hash space differ — the oracle works in the unsigned domain.
  */
case class HashBucket(child: Expression, buckets: Long, seed: Long)
    extends UnaryExpression with IntegralIdInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "hash_bucket"

  override def nullSafeEval(input: Any): Any =
    // Number.longValue: the integral input may arrive boxed as any of the
    // four accepted widths (codegen widens implicitly in Java arithmetic)
    java.lang.Long.remainderUnsigned(
      HashFunctions.mix64(input.asInstanceOf[Number].longValue(), seed), buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $c + ${seed}L + 0x9E3779B97F4A7C15L;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |$z = $z ^ ($z >>> 31);
         |${ev.value} = java.lang.Long.remainderUnsigned($z, ${buckets}L);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full-width splitmix64 of a long id, with the sign bit flipped so
  * SIGNED ascending order equals UNSIGNED ascending order of the raw
  * hash — the total-order key for deterministic shuffles ([[HashBucket]]
  * reduces to 10^6 buckets, far too coarse to order corpora beyond 10^6
  * rows: id-ascending runs inside tied buckets would leak source/crawl
  * order into the training order). The DuckDB oracle orders by the raw
  * unsigned value in HUGEINT space — identical order.
  */
case class HashOrder64(child: Expression, seed: Long)
    extends UnaryExpression with IntegralIdInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "hash_order64"

  override def nullSafeEval(input: Any): Any =
    HashFunctions.mix64(input.asInstanceOf[Number].longValue(), seed) ^ java.lang.Long.MIN_VALUE

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $c + ${seed}L + 0x9E3779B97F4A7C15L;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |$z = $z ^ ($z >>> 31);
         |${ev.value} = $z ^ java.lang.Long.MIN_VALUE;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {

  /** Seeded splitmix64 — the ONE JVM implementation behind both hash
    * expressions' interpreted paths and the test/oracle twins (the
    * codegen strings in doGenCode mirror it).
    */
  private[functions] def mix64(id: Long, seed: Long): Long = {
    var z = id + seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic bucket in `[0, buckets)` for a long id column. */
  def hashBucket(id: Column, buckets: Long, seed: Long = 42L): Column = {
    // validate at construction: buckets=0 would surface as a per-row
    // ArithmeticException deep inside executor tasks, and a negative
    // value reinterprets as a huge unsigned divisor (near-identity
    // bucketing — silently wrong sampling rates)
    require(buckets > 0, s"hashBucket: buckets must be positive, got $buckets")
    // no defensive cast: the expression's integral-only type check fires
    // at analysis for string/double ids (see IntegralIdInput)
    graftbridge.column(HashBucket(graftbridge.expression(id), buckets, seed))
  }

  /** Unsigned-order-preserving full-width splitmix64 (see [[HashOrder64]]). */
  def hashOrder64(id: Column, seed: Long = 42L): Column =
    graftbridge.column(HashOrder64(graftbridge.expression(id), seed))

  /** JVM-side twin of [[HashOrder64]] for tests/oracle builders. */
  def orderOf(id: Long, seed: Long = 42L): Long =
    mix64(id, seed) ^ java.lang.Long.MIN_VALUE

  /** JVM-side twin of [[HashBucket]] for tests/oracle builders. */
  def bucketOf(id: Long, buckets: Long, seed: Long = 42L): Long =
    java.lang.Long.remainderUnsigned(mix64(id, seed), buckets)
}
