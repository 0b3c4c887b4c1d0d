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

/** `graft_nfc(text)`: Unicode NFC normalization (canonical composition) —
  * the first step of any text-normalization pipeline (é as e+◌́ and é as
  * U+00E9 must fingerprint/dedup identically). Spark has no built-in for
  * it; a codegen'd kernel keeps it inside whole-stage codegen next to the
  * lower/regexp steps it composes with. ASCII input short-circuits via
  * `Normalizer.isNormalized` (a quick-check table scan, no allocation) —
  * the overwhelmingly common case in a web corpus costs one pass. */
case class NfcNormalizeExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override protected def nullSafeEval(input: Any): Any =
    TextNative.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextNative.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpression =
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

/** `graft_gopher_counts(text)` → struct<n_words int, char_sum bigint,
  * n_symbol int, n_alpha int, n_stops int>: ALL five Gopher-rule token
  * counters in one fused scan.
  *
  * Why a kernel and not five HOF columns: higher-order functions are not
  * codegen-able, so a `.where(pass_gopher)` lets PushPredicateThroughProject
  * substitute the alias chain into the filter condition, and the
  * interpreted predicate then re-evaluates the split+filter pipeline once
  * per referenced signal — measured 3× the whole-plan cost on a 10M-doc
  * filter. The kernel is one static call inside whole-stage codegen, where
  * common-subexpression elimination collapses every repeated reference.
  * TextNativeSpec pins equality with the declarative HOF form. */
case class GopherCountsExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gopher_counts requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = TextNative.GopherStruct
  override def prettyName: String = "graft_gopher_counts"
  override protected def nullSafeEval(input: Any): Any =
    TextNative.gopherCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextNative.gopherCounts($c)")
  override protected def withNewChildInternal(newChild: Expression): GopherCountsExpression =
    copy(child = newChild)
}

/** `graft_chargrams(text, n, buckets)` → array<bigint>: the hashed
  * char-n-gram bucket stream of [[graft.ext.LangId.charGramBuckets]] as
  * one fused kernel — lower-case once, then per code-point position the
  * gram's md5, the value of its first 15 hex digits, % P % buckets.
  *
  * Why a kernel: the declarative form evaluates a per-gram interpreted
  * lambda chaining substring → md5 (rendered to a hex STRING) → conv
  * (BigInteger parse of that string) → casts — for language ID this runs
  * once per character of the corpus and dominated the three langid gates
  * (~5.9 s each, the bench ceiling). The kernel reuses one MessageDigest
  * and reads the digest bytes directly; Spark semantics are inherited by
  * construction (UTF8String.toLowerCase / substringSQL are the engines of
  * lower() / substring()). TextNativeSpec pins bit-identical outputs. */
case class CharGramBucketsExpression(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_chargrams requires a string argument, got ${child.dataType.catalogString}")
    else if (n < 1 || buckets < 1)
      TypeCheckResult.TypeCheckFailure(
        "graft_chargrams needs n >= 1 and buckets >= 1")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_chargrams"
  override protected def nullSafeEval(input: Any): Any =
    TextNative.charGramBuckets(input.asInstanceOf[UTF8String], n, buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextNative.charGramBuckets($c, $n, $buckets)")
  override protected def withNewChildInternal(newChild: Expression): CharGramBucketsExpression =
    copy(child = newChild)
}

object TextNative {

  private val P = TextHash.P

  val GopherStruct: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_words",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("char_sum", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_symbol",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_alpha",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_stops",
        org.apache.spark.sql.types.IntegerType, nullable = false)))

  /** The one stop-word source of truth is TextStats.Stopwords — the
    * kernel reads it through a hash set so list edits can't drift. */
  private val GopherStops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.ext.TextStats.Stopwords.foreach(s.add)
    s
  }

  /** == the five declarative Gopher counters over
    * `filter(split(text," "), t != "")`: token count, Σ per-token
    * length() (CODE POINTS, as Spark's length counts), tokens containing
    * '#' or "...", tokens containing an ASCII letter, tokens in the
    * [[graft.ext.TextStats.Stopwords]] list. One pass, no allocation
    * beyond the split. */
  def gopherCounts(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toString.split(" ", -1)
    var nWords = 0
    var charSum = 0L
    var nSymbol = 0
    var nAlpha = 0
    var nStops = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        nWords += 1
        charSum += t.codePointCount(0, t.length)
        if (t.contains("#") || t.contains("...")) nSymbol += 1
        var hasAlpha = false
        var j = 0
        while (!hasAlpha && j < t.length) {
          val c = t.charAt(j)
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) hasAlpha = true
          j += 1
        }
        if (hasAlpha) nAlpha += 1
        if (GopherStops.contains(t)) nStops += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, charSum, nSymbol, nAlpha, nStops))
  }

  /** Unicode NFC (canonical decomposition + canonical composition), per
    * UAX #15 — the same normal form DuckDB's `nfc_normalize` (utf8proc)
    * produces, so oracle outputs agree byte-for-byte. Already-normalized
    * input (all ASCII, most web text) returns the original buffer. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

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

  val WinnowStruct: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.IntegerType, nullable = false)))

  /** == [[graft.ext.Winnow]]'s declarative pick pipeline: per-gram
    * 31-multiplier polynomial hash over code points mod 2^31-1, then the
    * rightmost minimum of each window of w hashes, picks deduped by
    * position in window order. One fused loop: O(n·k) hashing + O(n·w)
    * window scan, no string allocation at all. */
  def winnow(text: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cps = text.toString.codePoints().toArray
    val m = cps.length - k + 1
    if (m < 1 || m < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 31 + cps(i + j)) % P; j += 1 }
      hs(i) = h
      i += 1
    }
    val order = new java.util.ArrayList[Integer]()
    val seen = new java.util.HashSet[Integer]()
    var j0 = 0
    while (j0 <= m - w) {
      var bh = Long.MaxValue
      var bp = 0
      var x = j0
      while (x < j0 + w) {
        if (hs(x) <= bh) { bh = hs(x); bp = x }
        x += 1
      }
      if (seen.add(bp)) order.add(bp)
      j0 += 1
    }
    val out = new Array[Any](order.size())
    var r = 0
    while (r < order.size()) {
      val p = order.get(r).intValue()
      out(r) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](hs(p), p + 1))
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** == the declarative LangId.charGramBucketsDeclarative: per code-point
    * position i (1-based), `conv(substr(md5(substring(lower(t), i, n)),
    * 1, 15), 16, 10) % P % buckets`. The first 15 hex digits of the
    * digest are bytes 0..6 in full plus the high nibble of byte 7 — 60
    * bits, always positive. Shorter-than-n texts yield an empty array. */
  def charGramBuckets(t: UTF8String, n: Int,
      buckets: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val lower = t.toLowerCase
    val len = lower.numChars()
    if (len < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val out = new Array[Long](len - n + 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < out.length) {
      md.reset()
      val d = md.digest(lower.substringSQL(i + 1, n).getBytes)
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      out(i) = (v % P) % buckets
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `graft_winnow(text, k, w)` → array<struct<h bigint, p int>>: the whole
  * winnowing selection as one codegen'd kernel — the interpreted HOF
  * pipeline (per-char ascii + per-window aggregate) was the bench's
  * slowest query by 4× before fusing. The declarative form in
  * [[graft.ext.Winnow]] remains the readable spec and oracle template;
  * WinnowSpec pins element-identical outputs. */
case class WinnowExpression(first: Expression, second: Expression,
    third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType &&
        second.dataType == org.apache.spark.sql.types.IntegerType &&
        third.dataType == org.apache.spark.sql.types.IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_winnow(text, k, w) takes (string, int, int)")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(TextNative.WinnowStruct,
      containsNull = false)
  override def prettyName: String = "graft_winnow"
  override protected def nullSafeEval(t: Any, k: Any, w: Any): Any =
    TextNative.winnow(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, w) => s"graft.plans.TextNative.winnow($t, $k, $w)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): WinnowExpression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
