package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression `graft_jaccard(a, b)` — exact set-Jaccard
  * of two string arrays, byte-identical to the declarative spec
  * `size(array_intersect(a,b)).cast(double) /
  *  size(array_union(a,b)).cast(double)` (JaccardNativeSpec pins it;
  * [[graft.ext.Dedup.jaccard]] stays the readable, oracle-shared form).
  *
  * Why: the declarative form ALLOCATES — array_intersect and array_union
  * each build a hash set AND materialize a result ArrayData per pair,
  * only for `size` to read its length. On the near-dup verify paths a
  * candidate pair carries two wide shingle arrays, and r14's driver box
  * showed the 32-concurrent-task allocation churn of exactly this shape
  * anti-scaling (ext_neardup_index_incremental ran 1.6× FASTER on 8
  * cores than 32). The kernel computes the two distinct counts and the
  * intersection count in one pass over each array with zero result
  * allocation: jaccard = c / (|A| + |B| − c).
  */
case class JaccardExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_jaccard requires two array<string> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardNative.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.JaccardNative.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardExpression =
    copy(left = newLeft, right = newRight)
}

object JaccardNative {

  /** == `size(array_intersect(a,b)) / size(array_union(a,b))` as doubles.
    * Distinct-element counting under UTF8String (binary) equality; a
    * null ELEMENT counts as one distinct value on each side and joins
    * the intersection only when both sides hold one — exactly the
    * built-ins' semantics (shingles never contain nulls, but the kernel
    * must mirror the spec for any input). Both-empty yields 0/0 = NaN,
    * same as the declarative division. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val setA = new java.util.HashSet[UTF8String](Math.max(8, na * 2))
    var aNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aNull = true
      else { setA.add(a.getUTF8String(i)); () }
      i += 1
    }
    val dA = setA.size + (if (aNull) 1 else 0)
    val nb = b.numElements()
    val setB = new java.util.HashSet[UTF8String](Math.max(8, nb * 2))
    var bNull = false
    var c = 0
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bNull = true
      else {
        val s = b.getUTF8String(i)
        if (setB.add(s) && setA.contains(s)) c += 1
      }
      i += 1
    }
    val dB = setB.size + (if (bNull) 1 else 0)
    val inter = c + (if (aNull && bNull) 1 else 0)
    val union = dA + dB - inter
    if (union == 0) {
      // both-empty: the declarative 0/0 THROWS under ANSI (Spark 4's
      // default and GraftSession's posture) and is NaN under legacy —
      // mirror both so the kernel is substitutable either way. Real
      // shingle arrays are never empty; this is spec fidelity only.
      if (org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
        throw new ArithmeticException(
          "[DIVIDE_BY_ZERO] graft_jaccard of two empty sets")
      else Double.NaN
    } else inter.toDouble / union.toDouble
  }
}
