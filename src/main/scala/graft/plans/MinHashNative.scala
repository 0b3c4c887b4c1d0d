package graft.plans

import graft.ext.TextHash
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import java.security.MessageDigest

/** Fused native kernel for the MinHash signature: tokenize → word 3-gram
  * shingles → md5-based 60-bit hash mod P → k-permutation minima, in one
  * pass with zero intermediate Catalyst arrays.
  *
  * Byte-identical to the declarative pipeline
  * `TextHash.minhashSignature(TextHash.shingles(text))` (asserted by
  * MinHashNativeSpec and the shared DuckDB oracles) — the declarative form
  * remains the readable spec; this is the codegen-friendly hot path invoked
  * by [[MinHashSigExpression]] from whole-stage-generated code.
  */
object MinHashNative {

  private val NGram = 3
  private val P = TextHash.P
  private val As: Array[Long] = TextHash.hashParams.map(_._1).toArray
  private val Bs: Array[Long] = TextHash.hashParams.map(_._2).toArray
  private val K = TextHash.NumHashes

  private val digestTL = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit value of the first 15 hex chars of md5(s), == Spark
    * `conv(substring(md5(s),1,15),16,10)`. */
  def hash60(s: String): Long = {
    val d = digestTL.get()
    d.reset()
    val bytes = d.digest(s.getBytes("UTF-8"))
    // first 15 hex digits = bytes 0..6 (56 bits) + high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xf0L) >>> 4)
  }

  /** Signature over the text's word 3-gram shingles (whole-text fallback
    * under 3 tokens), one md5 per shingle, k minima. */
  def signature(text: UTF8String): ArrayData = {
    val s = text.toString
    val toks = s.split(" ", -1)
    val mins = Array.fill(K)(P)
    @inline def absorb(shingle: String): Unit = {
      val h = hash60(shingle) % P
      var k = 0
      while (k < K) {
        val v = (As(k) * h + Bs(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    if (toks.length < NGram) {
      absorb(toks.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      val last = toks.length - NGram
      while (i <= last) {
        sb.setLength(0)
        sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
        absorb(sb.toString)
        i += 1
      }
    }
    new GenericArrayData(mins)
  }
}
