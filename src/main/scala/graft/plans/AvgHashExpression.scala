package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `graft_avg_hash(bin)` → bigint: a 60-bit average-hash ("aHash") style
  * perceptual fingerprint of a binary payload — the standard near-dup
  * signature for decoded media (an 8×8 grid of means thresholded at the
  * global mean; pHash's simpler sibling). Here the "sample sequence" is
  * the payload's bytes — the container decodes no codecs
  * ([[graft.ext.Multimodal.decodeStub]] is the declared environment
  * stub), but the kernel, the banding ([[graft.ext.Dedup.hammingNeighbors]])
  * and the verification are exactly what runs over real decoded samples.
  *
  * Spec (integer-exact, engine-portable — the DuckDB oracle replays it
  * relationally from `hex(blob)`):
  *  - L = octet_length(bin); L == 0 → hash 0.
  *  - byte i (unsigned, 0-255) belongs to window w = (i * 60) div L.
  *  - S_w = window byte sum, C_w = window byte count, T = total sum.
  *  - bit w is set iff S_w * L > T * C_w  (window mean strictly above the
  *    global mean, cross-multiplied so no division ever happens; empty
  *    windows — L < 60 — give 0 > 0 = false).
  *  - hash = Σ_{w set} 2^w, a non-negative 60-bit long.
  *
  * Perceptual property: a localized byte change disturbs only the windows
  * it touches (plus bits whose window mean sits exactly at the global
  * mean), so near-identical payloads land within a small Hamming radius —
  * searchable exactly, at corpus scale, with [[graft.ext.Dedup.hammingNeighbors]].
  *
  * Why a native expression (ladder rung (b)): SQL byte access on binary
  * needs a hex()-string detour and the 60-bucket accumulation needs an
  * O(60·L) higher-order-function fold per row; this is one O(L) codegen'd
  * scan. */
case class AvgHashExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_avg_hash requires a binary argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_avg_hash"

  override protected def nullSafeEval(input: Any): Any =
    AvgHashNative.avgHash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AvgHashNative.avgHash($c)")

  override protected def withNewChildInternal(newChild: Expression): AvgHashExpression =
    copy(child = newChild)
}

object AvgHashNative {

  final val Windows = 60

  /** Two tight passes over the bytes; static so codegen calls it directly. */
  def avgHash(bin: Array[Byte]): Long = {
    val n = bin.length
    if (n == 0) return 0L
    val sums = new Array[Long](Windows)
    val counts = new Array[Long](Windows)
    var total = 0L
    var i = 0
    while (i < n) {
      val w = ((i.toLong * Windows) / n).toInt
      val v = (bin(i) & 0xff).toLong
      sums(w) += v
      counts(w) += 1L
      total += v
      i += 1
    }
    var hash = 0L
    var w = 0
    val nL = n.toLong
    while (w < Windows) {
      // the cross-multiply sums(w)*n vs total*counts(w) tops out at
      // 255·n², which leaves Long at ~190 MB payloads — compare in 128
      // bits (multiplyHigh is an intrinsic; the loop is 60 iterations)
      // so the bit pattern stays exact for any blob size
      val aHi = Math.multiplyHigh(sums(w), nL)
      val aLo = sums(w) * nL
      val bHi = Math.multiplyHigh(total, counts(w))
      val bLo = total * counts(w)
      if (aHi > bHi ||
          (aHi == bHi && java.lang.Long.compareUnsigned(aLo, bLo) > 0))
        hash |= (1L << w)
      w += 1
    }
    hash
  }
}
