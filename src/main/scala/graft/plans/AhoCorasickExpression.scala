package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho–Corasick multi-pattern matcher (Aho & Corasick, CACM
  * 1975) — the blocklist primitive of web-corpus curation (C4's badwords
  * drop, Gopher-style keyword rules): count occurrences of EVERY pattern
  * of a phrase list in one pass over the text, instead of one `contains`
  * scan per pattern.
  *
  * Matching is over UTF-8 BYTES, counting ALL occurrences including
  * overlapping ones (unlike `replace`-based counting, which is
  * non-overlapping). For valid UTF-8 on both sides, pattern bytes align
  * only at character boundaries, so byte counts equal character counts —
  * which is what lets the DuckDB oracle replay the counts with char-indexed
  * `substr` probes.
  *
  * `boundary = true` restricts to word-bounded occurrences: the bytes
  * adjacent to the match must not be ASCII alphanumerics. Non-ASCII bytes
  * count as boundaries on both engines (a UTF-8 continuation byte is not
  * `[A-Za-z0-9]`, and neither is the multibyte character it belongs to) —
  * the ASCII-blocklist posture of the published filters.
  *
  * The goto/failure machine is flattened into a complete byte-indexed DFA
  * at build time, so the scan loop is one array load per input byte; emit
  * lists are pre-merged through the failure chain. Memory is
  * `nodes × 256 × 4 B` — proportional to total pattern bytes (a 10k-word
  * blocklist is a few MB), shipped to executors once per plan like any
  * other plan constant. Counts are a pure function of (text, patterns).
  */
final class AhoCorasick(
    val patterns: Array[Array[Byte]],
    val boundary: Boolean) extends Serializable {

  require(patterns.nonEmpty, "graft_ac_counts: empty pattern list")
  require(patterns.forall(_.nonEmpty), "graft_ac_counts: empty pattern")

  // Complete DFA over the byte alphabet: delta(node * 256 + byte) = next.
  // Built lazily PER JVM (transient — executors rebuild from the pattern
  // bytes rather than shipping the 256-wide tables over the wire).
  @transient private lazy val dfa: (Array[Int], Array[Array[Int]]) = {
    val maxNodes = patterns.map(_.length).sum + 1
    val goto_ = Array.fill(maxNodes * 256)(-1)
    val emits = Array.fill(maxNodes)(List.empty[Int])
    var nNodes = 1
    var k = 0
    while (k < patterns.length) {
      val p = patterns(k)
      var node = 0
      var i = 0
      while (i < p.length) {
        val b = p(i) & 0xff
        if (goto_(node * 256 + b) < 0) {
          goto_(node * 256 + b) = nNodes
          nNodes += 1
        }
        node = goto_(node * 256 + b)
        i += 1
      }
      emits(node) ::= k
      k += 1
    }
    // BFS failure links; missing transitions resolve to the fail target's,
    // and the fail target's emit list merges in (classic DFA construction).
    val fail = new Array[Int](nNodes)
    val queue = new java.util.ArrayDeque[Integer]()
    var b = 0
    while (b < 256) {
      val c = goto_(b)
      if (c < 0) goto_(b) = 0
      else { fail(c) = 0; queue.add(c) }
      b += 1
    }
    while (!queue.isEmpty) {
      val node = queue.poll().intValue()
      emits(node) = emits(node) ++ emits(fail(node))
      var b2 = 0
      while (b2 < 256) {
        val c = goto_(node * 256 + b2)
        if (c < 0) goto_(node * 256 + b2) = goto_(fail(node) * 256 + b2)
        else { fail(c) = goto_(fail(node) * 256 + b2); queue.add(c) }
        b2 += 1
      }
    }
    (java.util.Arrays.copyOf(goto_, nNodes * 256),
      emits.take(nNodes).map(_.sorted.toArray))
  }

  @transient private lazy val patLen: Array[Int] = patterns.map(_.length)

  private def delta: Array[Int] = dfa._1
  private def emitIdx: Array[Array[Int]] = dfa._2

  private def isWordByte(b: Byte): Boolean = {
    val c = b & 0xff
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
  }

  /** Per-pattern occurrence counts, aligned with the pattern list. */
  def counts(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val d = delta
    val emit = emitIdx
    val out = new Array[Int](patterns.length)
    var node = 0
    var i = 0
    while (i < bytes.length) {
      node = d(node * 256 + (bytes(i) & 0xff))
      val em = emit(node)
      var e = 0
      while (e < em.length) {
        val k = em(e)
        if (!boundary || {
          val start = i - patLen(k) + 1
          (start == 0 || !isWordByte(bytes(start - 1))) &&
            (i == bytes.length - 1 || !isWordByte(bytes(i + 1)))
        }) out(k) += 1
        e += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_ac_counts(text, patterns, boundary)` → `array<int>` of per-pattern
  * occurrence counts. The pattern list and boundary flag are plan constants
  * (SQL callers pass a foldable `array(...)` literal — the function builder
  * in [[GraftExtensions]] folds them); the automaton is built lazily once
  * per executor and the scan inlines into whole-stage codegen as a single
  * reference-object call.
  *
  * Why a native expression (ladder rung (b)): the declarative form
  * ([[graft.ext.Blocklist.matchCountsDeclarative]], the spec/oracle
  * template) dispatches nested interpreted HOF lambdas per pattern per
  * position — O(text × patterns) with per-element boxing; the kernel is
  * O(text + matches) for any pattern count. */
case class AcCountsExpression(
    child: Expression,
    patternStrings: Seq[String],
    boundary: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_ac_counts requires a string argument, got ${child.dataType.catalogString}")
    else if (patternStrings.isEmpty)
      TypeCheckResult.TypeCheckFailure("graft_ac_counts: empty pattern list")
    else if (patternStrings.exists(p => p == null || p.isEmpty))
      TypeCheckResult.TypeCheckFailure("graft_ac_counts: null/empty pattern")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ac_counts"

  @transient private lazy val automaton: AhoCorasick =
    new AhoCorasick(
      patternStrings.iterator.map(UTF8String.fromString(_).getBytes.clone()).toArray,
      boundary)

  override protected def nullSafeEval(input: Any): Any =
    automaton.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", automaton, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AcCountsExpression =
    copy(child = newChild)
}
