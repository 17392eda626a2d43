package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two double arrays as a native Catalyst expression with
  * whole-stage codegen — the hot-path primitive for similarity search.
  *
  * Preference order per the build brief: built-in functions, then a custom
  * `Expression` (this), then UDFs. The higher-order-function formulation
  * (`aggregate(zip_with(...))`) allocates an intermediate array per row;
  * this compiles to a tight primitive loop, which matters when scoring
  * 10^10 candidate pairs at 100 TB scale.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs are guaranteed `array<double>` by the [[VectorFunctions.vecDot]]
  // wrapper, which casts both sides (AbstractDataType/ExpectsInputTypes is
  // private[sql], so input-type coercion lives in the Column builder).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Signed-random-projection LSH keys as a native expression: one pass
  * over the input vector computes dot products against all tables×bits
  * seeded hyperplanes, emitting one `"table:bits"` key per table.
  */
case class SrpKeys(child: Expression, dim: Int, bits: Int, tables: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "srp_keys"

  // hyperplanes[t*bits + b][d] — deterministic from seed (xorshift64*)
  @transient private lazy val planes: Array[Array[Double]] = {
    var s = seed
    def nextDouble(): Double = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      val v = (s * 0x2545F4914F6CDD1DL) >>> 11
      v.toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(tables * bits)(Array.fill(dim)(nextDouble()))
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val keys = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bitsVal = 0L
      var b = 0
      while (b < bits) {
        val plane = planes(t * bits + b)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += arr.getDouble(i) * plane(i); i += 1 }
        if (dot > 0) bitsVal |= (1L << b)
        b += 1
      }
      keys(t) = UTF8String.fromString(s"$t:$bitsVal")
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Vector similarity column builders over `array<float>` / `array<double>`
  * embedding columns.
  */
object VectorFunctions {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Codegen'd dot product (see [[VectorDot]]). */
  def vecDot(a: Column, b: Column): Column =
    graftbridge.column(
      VectorDot(graftbridge.expression(asDouble(a)), graftbridge.expression(asDouble(b))))

  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** Cosine similarity; formula shape (dot / (sqrt·sqrt)) mirrors the
    * DuckDB oracle exactly so both engines agree to rounding precision.
    *
    * Pair-join hot paths should NOT call this directly: it recomputes both
    * self-norms per *pair*. Materialize [[vecNorm]] per row below the join
    * and use [[cosineFromNorms]] — bitwise-identical result (same float
    * ops), norm cost ∝ rows instead of pairs.
    */
  def cosineSim(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Cosine from per-row precomputed norms (see [[cosineSim]] scaladoc). */
  def cosineFromNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    vecDot(a, b) / (normA * normB)

  /** Signed-random-projection bucket keys: `tables` independent hash
    * tables, each hashing the vector to `bits` sign bits of dot products
    * with seeded random hyperplanes. Two vectors with cosine ≥ t collide
    * in at least one table with probability
    * 1 - (1 - (1 - θ/π)^bits)^tables.
    *
    * Native single-pass expression: the tables×bits hyperplanes live in
    * the expression (built lazily per executor from the seed), and all
    * keys come from one pass over the vector — the literal-array
    * formulation (tables×bits separate `vecDot(vec, typedLit(...))`
    * columns) paid seconds of analysis/codegen per run on the plan
    * alone.
    */
  def srpKeys(vec: Column, dim: Int, bits: Int, tables: Int, seed: Long = 42L): Column = {
    // 0 is the xorshift64* fixed point: every hyperplane would come out
    // identical (-1, ..., -1) and the LSH silently degenerates to
    // bucketing by the sign of the coordinate sum
    require(seed != 0L, "srpKeys: seed must be non-zero (xorshift64* degenerates at 0)")
    // bits outside [1, 63] fails SILENTLY otherwise: non-positive bits
    // yield empty hyperplanes (every vector keys to "t:0" — the whole
    // corpus in `tables` buckets), 64+ wraps 1L << b onto duplicate bit
    // positions; both violate the loud-contract the keying APIs promise
    require(bits >= 1 && bits <= 63,
      s"srpKeys: bits must be in [1, 63] (sign bits pack into a Long), got $bits")
    require(tables >= 1, s"srpKeys: tables must be positive, got $tables")
    graftbridge.column(SrpKeys(graftbridge.expression(vec.cast("array<double>")), dim, bits, tables, seed))
  }
}
