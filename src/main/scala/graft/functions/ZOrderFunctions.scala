package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Morton (Z-order) value of two non-negative integral columns: the low
  * `bits` bits of each input interleaved (a on even positions, b on odd)
  * into one long. Sorting/range-partitioning on this value clusters rows
  * that are close in BOTH dimensions into the same files and row groups,
  * so per-file/row-group min-max stats stay tight on BOTH columns — the
  * multi-column data-skipping layout (Delta/Iceberg "OPTIMIZE ZORDER")
  * that single-column sorting cannot provide: sorting by `a` alone gives
  * `b` the full value range in every file, and a reader filtering on `b`
  * skips nothing.
  *
  * `bits <= 31` keeps the interleaved value in the non-negative long
  * range, so SIGNED ordering equals Z-curve ordering. Out-of-range
  * inputs (negative, or >= 2^bits) fail loudly per row — a silently
  * truncated coordinate would scatter the row to an unrelated curve
  * position and quietly destroy the very locality the layout exists for.
  * Callers with wider domains quantize first (e.g. `hash_bucket`, or a
  * range-rank), which is the standard Z-order recipe.
  *
  * Whole-stage codegen: the interleave is a tight 2·bits-shift loop in
  * both the interpreted and generated paths (scan-stage cost, no shuffle
  * of its own).
  */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"zvalue: bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral coordinates, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Number].longValue()
    val y = b.asInstanceOf[Number].longValue()
    ZValue.rangeCheck(x, y, bits)
    ZValue.interleave(x, y, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val z = ctx.freshName("z"); val i = ctx.freshName("i")
      val cls = classOf[ZValue].getName
      s"""
         |long $x = (long) $a;
         |long $y = (long) $b;
         |$cls.rangeCheck($x, $y, $bits);
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZValue {
  /** Range guard shared by the interpreted path, the generated code, and
    * the JVM twin.
    */
  def rangeCheck(x: Long, y: Long, bits: Int): Unit = {
    val lim = 1L << bits
    def fail(side: String, v: Long): Nothing = throw new IllegalArgumentException(
      s"zvalue: $side coordinate $v outside [0, 2^$bits) — quantize wider domains first " +
        "(a truncated coordinate would scatter the row to an unrelated curve position)")
    if (x < 0L || x >= lim) fail("left", x)
    if (y < 0L || y >= lim) fail("right", y)
  }

  /** The Morton interleave itself — the one JVM implementation behind
    * the interpreted path and [[ZOrderFunctions.zOf]] (the codegen
    * string in doGenCode mirrors it).
    */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

object ZOrderFunctions {

  /** Z (Morton) value column — see [[ZValue]]. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    graftbridge.column(ZValue(graftbridge.expression(a), graftbridge.expression(b), bits))

  /** JVM-side twin for tests/oracle builders. */
  def zOf(a: Long, b: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 31, s"zOf: bits must be in [1, 31], got $bits")
    ZValue.rangeCheck(a, b, bits)
    ZValue.interleave(a, b, bits)
  }
}
