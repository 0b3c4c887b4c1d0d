package graft.plans

import graft.SparkSpec
import graft.ext.{Dedup, Multimodal}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** graft_avg_hash: hand-computed bit decomposition, edge cases, the
  * perceptual-locality property, and kernel == SQL-path agreement. */
class AvgHashSpec extends SparkSpec {

  test("hand-computed: per-window means vs global mean, exact integers") {
    // 6 bytes -> windows of bits: w = i*60/6 = 10i, so byte i alone owns
    // window 10i; windows 1..9, 11..19, ... stay empty (bit 0).
    // bytes (10, 20, 30, 40, 50, 60): total 210, mean 35 -> bits set for
    // bytes 40 (w=30), 50 (w=40), 60 (w=50).
    val h = AvgHashNative.avgHash(Array[Byte](10, 20, 30, 40, 50, 60))
    assert(h == ((1L << 30) | (1L << 40) | (1L << 50)), h.toBinaryString)
    // constant payload: no window strictly above the mean -> 0
    assert(AvgHashNative.avgHash(Array.fill[Byte](100)(7)) == 0L)
    // empty payload -> 0 by contract
    assert(AvgHashNative.avgHash(Array.emptyByteArray) == 0L)
    // unsigned bytes: -1 reads as 255
    val uns = AvgHashNative.avgHash(Array[Byte](-1, 0))
    assert(uns == 1L, s"byte -1 must read 255 (window 0 above mean): $uns")
    // 60-bit: non-negative for any input
    val big = AvgHashNative.avgHash(Array.tabulate[Byte](4096)(i => i.toByte))
    assert(big >= 0L && big < (1L << 60))
  }

  test("perceptual locality: a localized edit flips few bits; kernel == expression") {
    val base = Array.tabulate[Byte](600)(i => ((i * 37 + 11) % 251).toByte)
    val edited = base.clone()
    var i = 300
    while (i < 310) { edited(i) = (edited(i) + 90).toByte; i += 1 }
    val d = java.lang.Long.bitCount(
      AvgHashNative.avgHash(base) ^ AvgHashNative.avgHash(edited))
    // 10 edited bytes touch one window; mean-adjacent windows may also
    // flip — locality means FEW (possibly zero), never a rehash
    assert(d <= 8, s"localized edit flipped $d bits")
    // the registered expression evaluates the same kernel
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, base), Row(2L, edited)),
      StructType(Seq(StructField("id", LongType),
        StructField("bin", BinaryType))))
    val viaExpr = df.select(Multimodal.avgHash(col("bin")).as("h"))
      .orderBy("h").collect().map(_.getLong(0)).toSet
    assert(viaExpr == Set(AvgHashNative.avgHash(base),
      AvgHashNative.avgHash(edited)))
  }

  test("identical payloads pair at hamming 0 through hammingNeighbors") {
    val pay = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val other = "a completely different payload with other byte mass %%"
      .getBytes("UTF-8")
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, pay), Row(2L, pay), Row(3L, other)),
      StructType(Seq(StructField("id", LongType),
        StructField("bin", BinaryType))))
      .select(col("id"), Multimodal.avgHash(col("bin")).as("ph"))
    val pairs = Dedup.hammingNeighbors(df, "id", "ph", maxDist = 3)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // brute-force truth over the three kernel hashes (exactness contract)
    val hs = Map(1L -> AvgHashNative.avgHash(pay),
      2L -> AvgHashNative.avgHash(pay), 3L -> AvgHashNative.avgHash(other))
    val truth = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b, d.toLong)).toSeq.sorted
    assert(pairs == truth, s"$pairs vs $truth")
    assert(pairs.contains((1L, 2L, 0L)), "identical payloads must pair at 0")
  }
}
