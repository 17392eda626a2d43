package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Morton (Z-order) value of k >= 2 non-negative integral columns: the low
  * `bits` bits of each input interleaved round-robin (bit i of column j
  * lands at position i*k + j) into one long. Sorting/range-partitioning on
  * this value clusters rows that are close in ALL k dimensions into the
  * same files and row groups, so per-file/row-group min-max stats stay
  * tight on EVERY clustering column — the multi-column data-skipping
  * layout (Delta/Iceberg "OPTIMIZE ZORDER BY a, b, c") that single-column
  * sorting cannot provide: sorting by `a` alone gives every other column
  * the full value range in every file, and a reader filtering on them
  * skips nothing. Real lakehouse layouts commonly interleave 3-4 columns
  * (tenant, date, key), hence the arbitrary-k form; k=2 keeps the classic
  * a-on-even / b-on-odd bit positions.
  *
  * `k * bits <= 63` keeps the interleaved value in the non-negative long
  * range, so SIGNED ordering equals Z-curve ordering. Out-of-range
  * inputs (negative, or >= 2^bits) fail loudly per row — a silently
  * truncated coordinate would scatter the row to an unrelated curve
  * position and quietly destroy the very locality the layout exists for.
  * Callers with wider domains quantize first (e.g. `hash_bucket`, or a
  * range-rank), which is the standard Z-order recipe.
  *
  * Whole-stage codegen: the interleave is a tight k·bits-shift loop in
  * both the interpreted and generated paths (scan-stage cost, no shuffle
  * of its own).
  */
case class ZValue(coords: Seq[Expression], bits: Int) extends Expression {
  require(coords.size >= 2, s"zvalue: needs >= 2 coordinate columns, got ${coords.size}")
  require(bits >= 1 && coords.size * bits <= 63,
    s"zvalue: need 1 <= bits and k*bits <= 63 (signed-long order = curve order), " +
      s"got k=${coords.size}, bits=$bits")

  override def children: Seq[Expression] = coords
  override def nullable: Boolean = coords.exists(_.nullable)
  override def foldable: Boolean = coords.forall(_.foldable)
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (coords.forall(c => ok(c.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral coordinates, got " +
        coords.map(_.dataType.simpleString).mkString(", "))
  }

  // O(1) indexing in the interpreted per-row path (coords may be a List)
  @transient private lazy val coordArr: Array[Expression] = coords.toArray

  override def eval(input: InternalRow): Any = {
    val k = coordArr.length
    val xs = new Array[Long](k)
    var j = 0
    while (j < k) {
      val v = coordArr(j).eval(input)
      if (v == null) return null
      xs(j) = v.asInstanceOf[Number].longValue()
      j += 1
    }
    ZValue.rangeCheck(xs, bits)
    ZValue.interleave(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = coords.size
    val evals = coords.map(_.genCode(ctx))
    val xs = ctx.freshName("xs")
    val anyNull = ctx.freshName("anyNull")
    val cls = classOf[ZValue].getName
    val loads = evals.zipWithIndex.map { case (e, j) =>
      s"""
         |${e.code}
         |if (${e.isNull}) { $anyNull = true; } else { $xs[$j] = (long) ${e.value}; }
       """.stripMargin
    }.mkString("\n")
    val code =
      code"""
         |boolean $anyNull = false;
         |long[] $xs = new long[$k];
         |$loads
         |long ${ev.value} = 0L;
         |boolean ${ev.isNull} = $anyNull;
         |if (!$anyNull) {
         |  $cls.rangeCheck($xs, $bits);
         |  ${ev.value} = $cls.interleave($xs, $bits);
         |}
       """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(coords = newChildren)
}

object ZValue {
  /** 2-column form (a on even bit positions, b on odd) — the classic
    * Morton pair, kept as the common-case constructor.
    */
  def apply(a: Expression, b: Expression, bits: Int): ZValue = ZValue(Seq(a, b), bits)

  /** Range guard shared by the interpreted path, the generated code, and
    * the JVM twin.
    */
  def rangeCheck(xs: Array[Long], bits: Int): Unit = {
    val lim = 1L << bits
    var j = 0
    while (j < xs.length) {
      val v = xs(j)
      if (v < 0L || v >= lim) throw new IllegalArgumentException(
        s"zvalue: coordinate #$j value $v outside [0, 2^$bits) — quantize wider domains first " +
          "(a truncated coordinate would scatter the row to an unrelated curve position)")
      j += 1
    }
  }

  /** The round-robin Morton interleave itself — the one JVM
    * implementation behind the interpreted path, the generated code (via
    * static forwarder), and [[ZOrderFunctions.zOfN]]. Bit i of column j
    * lands at position i*k + j.
    */
  def interleave(xs: Array[Long], bits: Int): Long = {
    val k = xs.length
    var z = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < k) {
        z |= ((xs(j) >> i) & 1L) << (i * k + j)
        j += 1
      }
      i += 1
    }
    z
  }
}

object ZOrderFunctions {

  /** Z (Morton) value column over two coordinates — see [[ZValue]]. */
  def zValue(a: Column, b: Column, bits: Int): Column = zValueN(Seq(a, b), bits)

  /** Z (Morton) value column over k >= 2 coordinates — see [[ZValue]]. */
  def zValueN(cols: Seq[Column], bits: Int): Column =
    graftbridge.column(ZValue(cols.map(graftbridge.expression), bits))

  /** JVM-side twin for tests/oracle builders (2-column form). */
  def zOf(a: Long, b: Long, bits: Int): Long = zOfN(Seq(a, b), bits)

  /** JVM-side twin for tests/oracle builders (k-column form). */
  def zOfN(coords: Seq[Long], bits: Int): Long = {
    require(coords.size >= 2 && bits >= 1 && coords.size * bits <= 63,
      s"zOfN: need k >= 2, bits >= 1, k*bits <= 63; got k=${coords.size}, bits=$bits")
    val xs = coords.toArray
    ZValue.rangeCheck(xs, bits)
    ZValue.interleave(xs, bits)
  }
}
