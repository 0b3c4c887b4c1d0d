package graft.plans

import graft.ext.TextHash
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-hash kernels — the remaining interpreted-HOF hot paths
  * (per-token SimHash bit votes, per-character rolling fingerprint), fused
  * into single static calls exactly like [[MinHashSigExpression]] /
  * [[DotScaledExpression]]. Declarative forms stay as the readable specs
  * and oracle templates; TextNativeSpec pins bit-identical outputs.
  */
case class SimHashExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    TextNative.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextNative.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpression =
    copy(child = newChild)
}

case class RollingFingerprintExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fp_rolling requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fp_rolling"
  override protected def nullSafeEval(input: Any): Any =
    TextNative.rollingFingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextNative.rollingFingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintExpression =
    copy(child = newChild)
}

object TextNative {

  private val P = TextHash.P

  /** == `TextHash.simhash(split(text, " "))`: per token (split on single
    * space, empties INCLUDED — Spark split keeps them) take the 60-bit
    * md5 hash, vote each bit ±1, set output bit where votes >= 0. */
  def simhash(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](60)
    var t = 0
    while (t < toks.length) {
      val h = MinHashNative.hash60(toks(t))
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** == the declarative rolling fingerprint in `TextStats.fingerprint`:
    * 31-multiplier polynomial over the CHARACTERS (code points — Spark's
    * substr/length count code points) of the already-normalized text,
    * mod 2^31-1. Empty input → 0, like the declarative edge case. */
  def rollingFingerprint(norm: UTF8String): Long = {
    val s = norm.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}
