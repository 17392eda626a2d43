package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Nearest-centroid routing as native Catalyst expressions — the last
  * per-row interpreted loop on a corpus-sized hot path, replaced (r15).
  * The n·k assignment term is the measured dominant cost of both
  * SemDeDup tiers at scale, and the previous `udf((v: Seq[Double]) =>
  * bc.value.nearest(...))` paid per-row Seq boxing + lambda dispatch on
  * every one of those n·k distance folds. These expressions read the
  * unboxed `ArrayData` directly (the ShingleHashes/SrpKeys pattern:
  * CodegenFallback — the loop body dominates, not the dispatch).
  *
  * BIT-IDENTICAL CONTRACT: the distance fold is the exact IEEE sequence
  * of `KMeans.Model.nearest` — `d += (v(i) - c(i))²` dim-ascending from
  * 0.0, strict `<` so the LOWEST index wins ties — which is also the
  * sequence every km/v9/v11 oracle replays in DuckDB. Swapping the UDF
  * for these expressions moves no gate hash.
  *
  * Centroids ride a `Broadcast` (fetched once per executor, `@transient
  * lazy` per expression instance), not the expression tree itself: a
  * serialized copy in the task binary would deserialize per task, which
  * at the hierarchical tier's ∛n-sized codebooks is real traffic.
  * NULL input arrays yield NULL (standard null-safe expression
  * semantics); operators that must not emit null routes filter
  * `isNotNull` upstream, as they already did for the UDF (which NPE'd
  * on null instead — the one deliberate behavior change, null-in →
  * null-out, strictly more graceful and unreachable on the gated
  * corpora). A null ELEMENT inside a non-null vector fails LOUDLY:
  * `ArrayData.getDouble` on a null slot would read 0.0 and route the
  * row to a plausible-but-wrong cell — the silent-corruption direction —
  * where the interpreted UDF threw; the guard keeps that failure loud.
  */
object CentroidFunctions {

  /** See the class note: null SLOTS must not silently read as 0.0. */
  private def requireNoNullSlots(arr: ArrayData, what: String): Unit = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"$what: vector has a null element at index $i — it would silently " +
          "route as 0.0; filter or repair null slots upstream")
      i += 1
    }
  }

  /** Index of the nearest centroid by squared L2 — `Model.nearest` over
    * the unboxed array. The loop runs over the INPUT's length (a vector
    * longer than the centroids fails loudly on the centroid read, a
    * shorter one folds the shared prefix — both exactly as the UDF did).
    */
  private[functions] def nearestIdx(v: ArrayData, centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    val n = v.numElements()
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d = 0.0
      var i = 0
      while (i < n) { val t = v.getDouble(i) - ctr(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** [[nearestIdx]] over a plain array slice (the residual/PQ forms). */
  private[functions] def nearestIdxArr(v: Array[Double], off: Int, len: Int,
      centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d = 0.0
      var i = 0
      while (i < len) { val t = v(off + i) - ctr(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private[functions] case class NearestCentroid(child: Expression,
      bc: Broadcast[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val centroids = bc.value
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_centroid"
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      requireNoNullSlots(arr, prettyName)
      nearestIdx(arr, centroids)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Fused two-level route: coarse index, residual against the coarse
    * centroid, fine index over the residual — `coarse·|fine| + fine` as
    * one pass over the vector (the hierarchicalCells UDF's arithmetic,
    * residual `r(i) = v(i) − c(i)` in the same IEEE order).
    */
  private[functions] case class HierarchicalCellId(child: Expression,
      bcCoarse: Broadcast[Array[Array[Double]]], bcFine: Broadcast[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val coarse = bcCoarse.value
    @transient private lazy val fine = bcFine.value
    override def dataType: DataType = LongType
    override def prettyName: String = "hierarchical_cell_id"
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      requireNoNullSlots(arr, prettyName)
      val n = arr.numElements()
      val a = new Array[Double](n)
      var i = 0
      while (i < n) { a(i) = arr.getDouble(i); i += 1 }
      val c = nearestIdxArr(a, 0, n, coarse)
      val ctr = coarse(c)
      i = 0
      while (i < n) { a(i) = a(i) - ctr(i); i += 1 }
      c.toLong * fine.length + nearestIdxArr(a, 0, n, fine)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-subspace PQ codes in one pass: the vector splits into m
    * contiguous slices of `dim/m` and each routes through its own
    * codebook — the pqEncode UDF's arithmetic (integer `dim/m`, slice
    * si·d..si·d+d, `Model.nearest` per slice) without the Seq boxing or
    * the copyOfRange allocation per subspace.
    */
  private[functions] case class PqCodeArray(child: Expression,
      bc: Broadcast[Array[Array[Array[Double]]]])
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val codebooks = bc.value
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_codes"
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      requireNoNullSlots(arr, prettyName)
      val n = arr.numElements()
      val a = new Array[Double](n)
      var i = 0
      while (i < n) { a(i) = arr.getDouble(i); i += 1 }
      val m = codebooks.length
      val d = n / m
      val codes = new Array[Int](m)
      var si = 0
      while (si < m) { codes(si) = nearestIdxArr(a, si * d, d, codebooks(si)); si += 1 }
      new GenericArrayData(codes)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Nearest-centroid cluster id column (replaces the interpreted
    * assignment UDF). `vec` must already be `array<double>`-castable;
    * the cast is applied here like the UDF signature did.
    */
  def nearestCentroid(vec: Column, bc: Broadcast[Array[Array[Double]]]): Column =
    graftbridge.column(NearestCentroid(
      graftbridge.expression(vec.cast("array<double>")), bc))

  /** Composite two-level cell id column (see [[HierarchicalCellId]]). */
  def hierarchicalCellId(vec: Column, bcCoarse: Broadcast[Array[Array[Double]]],
      bcFine: Broadcast[Array[Array[Double]]]): Column =
    graftbridge.column(HierarchicalCellId(
      graftbridge.expression(vec.cast("array<double>")), bcCoarse, bcFine))

  /** Per-subspace PQ code array column (see [[PqCodeArray]]). */
  def pqCodes(vec: Column, bc: Broadcast[Array[Array[Array[Double]]]]): Column =
    graftbridge.column(PqCodeArray(
      graftbridge.expression(vec.cast("array<double>")), bc))
}
