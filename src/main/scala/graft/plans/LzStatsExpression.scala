package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_lz_stats(text, window, minMatch, maxMatch)` → struct<n_literals
  * int, n_matches int, match_chars int>: a deterministic greedy LZ77 parse
  * summary — the compression-ratio quality signal of published pretraining
  * pipelines (repetitive/templated pages compress far better than prose;
  * Gopher-class pipelines threshold on it).
  *
  * Why not zlib: `Deflater` output depends on the platform's zlib build —
  * not an engine-portable spec. This parse IS the spec: at each position
  * the longest match of length in [minMatch, maxMatch] starting within the
  * previous `window` characters (any overlap allowed — plain substring
  * equality on the original text, exactly what SQL `substr` compares);
  * greedy advance by the match length, else emit a literal and advance 1.
  * Every constant is a function argument, so the DuckDB oracle replays the
  * parse positionally (bestlen per position + a recursive greedy walk) and
  * the gate hash-matches INTEGER outputs — no float ratio inside the gate.
  *
  * Positions are Unicode CODE POINTS (SQL `substr`/`length` semantics),
  * so the kernel parses the codepoint array, not UTF-16 units or bytes.
  * Invariant: n_literals + match_chars == length(text).
  *
  * Why a native expression (ladder rung (b)): the parse is a stateful
  * scan whose position advance depends on data — inexpressible with
  * built-in functions short of a per-position explode plus a recursive
  * join (the oracle's formulation: quadratic, gate-scale only). One
  * static call inside whole-stage codegen scans each doc once;
  * brute-force window search costs O(n · window · maxMatch) worst case,
  * O(n · window) typical. */
case class LzStatsExpression(
    child: Expression,
    window: Int,
    minMatch: Int,
    maxMatch: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_lz_stats requires a string argument, got ${child.dataType.catalogString}")
    else if (window < 1 || minMatch < 2 || maxMatch < minMatch)
      TypeCheckResult.TypeCheckFailure(
        "graft_lz_stats needs window >= 1 and 2 <= minMatch <= maxMatch")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LzNative.StatsStruct
  override def prettyName: String = "graft_lz_stats"

  override protected def nullSafeEval(input: Any): Any =
    LzNative.stats(input.asInstanceOf[UTF8String], window, minMatch, maxMatch)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.LzNative.stats($c, $window, $minMatch, $maxMatch)")

  override protected def withNewChildInternal(newChild: Expression): LzStatsExpression =
    copy(child = newChild)
}

object LzNative {

  val StatsStruct: StructType = StructType(Seq(
    StructField("n_literals", IntegerType, nullable = false),
    StructField("n_matches", IntegerType, nullable = false),
    StructField("match_chars", IntegerType, nullable = false)))

  /** One-pass greedy parse; static so codegen calls it directly. */
  def stats(text: UTF8String, window: Int, minMatch: Int, maxMatch: Int): InternalRow = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    var nLit = 0
    var nMat = 0
    var mChars = 0
    var i = 0
    while (i < n) {
      // longest match of length in [minMatch, min(maxMatch, n-i)] whose
      // source starts in [i-window, i-1]; ties in length need no break —
      // only the length feeds the stats
      var best = 0
      val maxL = math.min(maxMatch, n - i)
      if (maxL >= minMatch) {
        var j = math.max(0, i - window)
        while (j < i) {
          if (cps(j) == cps(i)) {
            var l = 1
            while (l < maxL && cps(j + l) == cps(i + l)) l += 1
            if (l > best) best = l
            if (best == maxL) j = i // early exit
          }
          j += 1
        }
      }
      if (best >= minMatch) { nMat += 1; mChars += best; i += best }
      else { nLit += 1; i += 1 }
    }
    InternalRow(nLit, nMat, mChars)
  }
}
