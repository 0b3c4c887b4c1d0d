package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Custom Catalyst expression `graft_dot_scaled(a, b)` — the codegen'd
  * exact scaled dot product Σ round(aᵢ·bᵢ·1e15) over two float-array
  * columns (the determinism primitive of every similarity operator:
  * cosine KNN, LSH ANN, IVF, blocked near-dup pairs).
  *
  * Why an Expression: the declarative form
  * (`aggregate(zip_with(...round...))`) is evaluated by the interpreted
  * higher-order-function path — per-element lambda dispatch costs ~µs, and
  * a candidate-pair join evaluates it once per PAIR, which made pair
  * verification the bottleneck. This kernel inlines a single static call
  * into whole-stage codegen: no lambda allocation, no per-element boxing.
  * Byte-identical to [[graft.ext.Similarity.dotScaledDeclarative]]
  * (asserted by DotNativeSpec and by the shared DuckDB oracles).
  */
case class DotScaledExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_scaled requires two array<float> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  // null on null input, unequal lengths, or null elements — mirroring the
  // declarative zip_with/aggregate null propagation
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_scaled"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotNative.dotScaledBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.plans.DotNative.dotScaledBoxed($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotScaledExpression =
    copy(left = newLeft, right = newRight)
}

/** Native kernel for [[DotScaledExpression]]. */
object DotNative {

  /** Must equal [[graft.ext.Similarity.DotScale]]. */
  val Scale = 1e15

  /** == Spark `round(d, 0)` on DoubleType then `cast(long)`: decimal
    * HALF_UP on the shortest decimal representation. Fast path is binary
    * floor(d+0.5); within a few ulps of a .5 boundary (where binary and
    * decimal roundings can disagree) it delegates to BigDecimal — exactly
    * Spark's own implementation. */
  def roundHalfUpToLong(d: Double): Long = {
    val boundary = Math.floor(d) + 0.5
    if (Math.abs(d - boundary) <= Math.ulp(d) * 4 + 1e-9)
      java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    else Math.floor(d + 0.5).toLong
  }

  /** Σ round(aᵢ·bᵢ·1e15) as long; null mirrors the declarative form
    * (unequal lengths → zip_with pads nulls → null sum; null element →
    * null sum). */
  def dotScaledBoxed(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += roundHalfUpToLong(a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** == the interpreted nearest-cell fold in
    * [[graft.ext.Similarity.semDedupIncremental]]: iterate cells in array
    * order, score = dotScaled(vec, cellVec).toDouble / cellNorm, keep on
    * STRICT improvement (ties and NaN/null-dot cells keep the incumbent;
    * id-ordered cells → lowest-id tie). Empty cells or no scorable cell
    * → −1, like the fold's init struct. */
  def argmaxCell(vec: ArrayData, cells: ArrayData): Long = {
    var bestS = Double.NegativeInfinity
    var bestId = -1L
    var c = 0
    val n = cells.numElements()
    while (c < n) {
      val row = cells.getStruct(c, 3)
      val d = dotScaledBoxed(vec, row.getArray(1))
      if (d != null) {
        val s = d.longValue().toDouble / row.getDouble(2)
        if (s > bestS) { bestS = s; bestId = row.getLong(0) }
      }
      c += 1
    }
    bestId
  }
}

/** `graft_argmax_cell(vec, cells)` — nearest-codebook-cell assignment as
  * one codegen'd loop. `cells` is the driver-literal codebook
  * array<struct<_1: id, _2: vec, _3: norm>> ([[graft.ext.Similarity]]'s
  * `typedLit` shape). The interpreted HOF fold dispatches a lambda per
  * CELL per row — at 1M vectors × 256 cells that was ~350 s of the scale
  * smoke; the kernel is the same arithmetic in a single static call
  * inside whole-stage codegen. Bit-identical selection (DotNativeSpec). */
case class ArgmaxCellExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  private def vecOk(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private def cellsOk(t: DataType) = t match {
    case ArrayType(org.apache.spark.sql.types.StructType(fields), _) =>
      fields.length == 3 && fields(0).dataType == LongType &&
        vecOk(fields(1).dataType) &&
        fields(2).dataType == org.apache.spark.sql.types.DoubleType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(left.dataType) && cellsOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_argmax_cell requires (array<float>, array<struct<bigint, " +
        s"array<float>, double>>), got ${left.dataType.catalogString}, " +
        right.dataType.catalogString)

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_argmax_cell"

  override protected def nullSafeEval(vec: Any, cells: Any): Any =
    DotNative.argmaxCell(vec.asInstanceOf[ArrayData],
      cells.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) => s"graft.plans.DotNative.argmaxCell($v, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgmaxCellExpression =
    copy(left = newLeft, right = newRight)
}
