package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reproducibility contracts of the sampling/splitting/packing family:
  * assignments must not depend on partition layout, splits must be total and
  * disjoint, and packed bins must match the single-partition reference. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "lang", "text")

  test("stratified sample is identical regardless of partitioning") {
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Sampling.stratifiedSample(df, "doc_id", "lang", Map("en" -> 30), 60)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val base = ids(docs)
    assert(base.nonEmpty && base.size < docs.count())
    assert(ids(docs.repartition(7)) == base, "row membership must be layout-independent")
    assert(ids(docs.coalesce(1)) == base)
  }

  test("split assignment is total, disjoint, and roughly proportional") {
    val counts = docs
      .groupBy(Sampling.splitAssign(col("doc_id"), 80, 10).as("split"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.count()
    assert(counts.values.sum == total, "every row gets exactly one split")
    assert(counts.keySet == Set("train", "valid", "test"))
    assert(counts("train") > total * 6 / 10, "train band must dominate")
  }

  test("weightedSample == independent A-ES reference; layout-independent") {
    import spark.implicits._
    def md5mod(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16) % TextHash.P
    }
    val rnd = new scala.util.Random(31)
    val items = (0 until 300).map(i => (i.toLong, 1L + rnd.nextInt(5000)))
    val df = items.toDF("id", "w")
    val want = items.map { case (id, w) =>
      val u = (md5mod(s"$id:t1") + 1).toDouble / TextHash.P
      (id, Math.round(Math.log(u) / w * 1e9))
    }.sortBy { case (id, k) => (-k, id) }.take(25)
      .zipWithIndex.map { case ((id, k), i) => (id, k, i + 1L) }
    val got = Sampling.weightedSample(df, "id", "w", k = 25, salt = "t1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got $got\nwant $want")
    val got2 = Sampling.weightedSample(df.repartition(7), "id", "w", 25, "t1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got2 == got, "selection must not depend on partition layout")
  }

  test("weightedSample: weight drives inclusion; nonpositive weights excluded") {
    import spark.implicits._
    // 50 heavy (w=1000) + 50 light (w=10) items: across salts the heavy
    // half must dominate the k=20 draw
    val df = ((0 until 50).map(i => (i.toLong, 1000L)) ++
      (50 until 100).map(i => (i.toLong, 10L))).toDF("id", "w")
    val heavyShare = Seq("s1", "s2", "s3").map { salt =>
      Sampling.weightedSample(df, "id", "w", k = 20, salt)
        .where(col("id") < 50).count()
    }
    assert(heavyShare.forall(_ >= 15), s"heavy items must dominate: $heavyShare")
    val withBad = df.union(Seq((200L, 0L), (201L, -5L)).toDF("id", "w"))
    val ids = Sampling.weightedSample(withBad, "id", "w", 200, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(!ids(200L) && !ids(201L) && ids.size == 100,
      "nonpositive weights never sampled")
  }

  test("epochPosition: bijective on a dense range, epoch-keyed, JVM-reference exact") {
    val n = 20000L
    val ids = spark.range(0, n, 1, 8).toDF("id")
    val pos = ids.select(col("id"),
      Sampling.epochPosition(col("id"), 0).as("p0"),
      Sampling.epochPosition(col("id"), 1).as("p1"))
    val agg = pos.agg(
      countDistinct(col("p0")), countDistinct(col("p1")),
      sum(when(col("p0") === col("p1"), 1L).otherwise(0L)),
      max(greatest(col("p0"), col("p1"))), min(least(col("p0"), col("p1"))))
      .first()
    assert(agg.getLong(0) == n && agg.getLong(1) == n,
      s"a permutation cannot collide: $agg")
    assert(agg.getLong(2) < n / 100,
      s"epochs must be (near-)disjoint orders: $agg")
    assert(agg.getLong(4) >= 0L && agg.getLong(3) < (1L << 60))
    // independent JVM reference of the Feistel walk for one id
    def md5mod(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16) % (1L << 30)
    }
    def ref(id: Long, epoch: Int): Long = {
      var l = (id >> 30) & ((1L << 30) - 1)
      var r = id & ((1L << 30) - 1)
      for (i <- 0 until 4) {
        val f = md5mod(s"fst:$epoch:$i:$r")
        val nl = r; val nr = l ^ f
        l = nl; r = nr
      }
      (l << 30) | r
    }
    val row = pos.where(col("id") === 12345L).first()
    assert(row.getLong(1) == ref(12345L, 0) && row.getLong(2) == ref(12345L, 1))
  }

  test("temperature mix: sqrt rates, largest stratum fully kept, reproducible") {
    val out = Sampling.temperatureMix(docs.select("doc_id", "lang"), "lang", "doc_id")
    val kept = out.groupBy("lang", "rate_pct").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    val pop = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mx = pop.values.max
    // rate formula holds per stratum, and the largest stratum keeps 100%
    pop.foreach { case (lang, n) =>
      val expected = math.max(1, math.floor(100 * math.sqrt(n.toDouble / mx)).toInt)
      assert(kept(lang)._1 == expected, s"$lang rate")
      if (n == mx) assert(kept(lang)._2 == n, "largest stratum must keep every row")
      else assert(kept(lang)._2 <= n)
    }
    // same salt reproduces the identical kept set
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val again = Sampling.temperatureMix(docs.select("doc_id", "lang"), "lang", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == again)
  }

  test("temperature mix: a micro-stratum clamps to a 1% rate, never 0%") {
    // 200k "en" rows vs 3 "rare" rows: the unclamped rate would be
    // floor(100·sqrt(3/200000)) = 0 — the stratum would silently vanish.
    // The rare ids are picked (deterministically, same salted hash as the
    // draw itself) to survive a 1% rate, so the clamp is observable in the
    // output rather than inferred from an empty result.
    val survivors = spark.range(900000L, 950000L).select(col("id").as("doc_id"))
      .where(Sampling.pctHash(col("doc_id"), "temp") < 1)
      .limit(3).collect().map(_.getLong(0))
    assert(survivors.length == 3, "need 3 ids that pass a 1% draw")
    val skewed = spark.range(0, 200000L).select(col("id").as("doc_id"), lit("en").as("lang"))
      .unionByName(spark.createDataFrame(Seq(survivors(0), survivors(1), survivors(2))
        .map(Tuple1(_))).toDF("doc_id")
        .select(col("doc_id"), lit("rare").as("lang")))
    val out = Sampling.temperatureMix(skewed, "lang", "doc_id")
      .groupBy("lang").agg(max("rate_pct").as("r"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out("rare")._1 == 1, s"micro-stratum rate must clamp to 1: $out")
    assert(out("rare")._2 == 3L, "the surviving rare ids must be kept")
    assert(out("en")._1 == 100)
  }

  test("vocab sketch: HLL estimate within rsd bounds of exact, deterministic") {
    val out = TextStats.vocabStats(docs, "text").head()
    val (nTok, approx, exact) = (out.getLong(0), out.getLong(1), out.getLong(2))
    assert(nTok > 0 && exact > 0)
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"HLL estimate $approx too far from exact $exact")
    // determinism: same input set → same registers → same estimate
    val again = TextStats.vocabStats(docs.repartition(9), "text").head().getLong(1)
    assert(again == approx, "sketch must be order/partition independent")
  }

  test("packSequences equals the single-partition window reference, bins are first-fit") {
    val sized = docs.select(col("doc_id"),
      size(TextStats.wsTokens(col("text"))).cast("long").as("toks"))
    val window = 512L
    val packed = Sampling.packSequences(sized.repartition(5), "doc_id", "toks", window)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: plain global window on one partition (fine at test size)
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ref = sized.coalesce(1)
      .withColumn("bin", floor((sum(col("toks")).over(w) - col("toks")) / lit(window)))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.toSeq == ref.toSeq, "distributed prefix sum must equal the window reference")
    // bins are contiguous and non-decreasing in id order
    packed.sliding(2).foreach {
      case Array(a, b) => assert(b._3 - a._3 <= (a._2 + b._2) / window + 1 && b._3 >= a._3)
      case _ =>
    }
  }

  test("mixturePlan: exact int64 arithmetic, hand-checked epochs and ppm") {
    import spark.implicits._
    // a: 10 docs × 10 tokens = 100 avail; b: 5 × 10 = 50 avail
    val corpus = ((0 until 10).map(i => (i.toLong, "a", 10L)) ++
      (0 until 5).map(i => (100L + i, "b", 10L)))
      .toDF("doc_id", "source", "toks")
    val weights = Seq(("a", 1L), ("b", 3L)).toDF("source", "parts")
    val plan = Sampling.mixturePlan(corpus, "source", "toks", weights, budget = 410L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    // a: target = 410·1 div 4 = 102 → 1 epoch + 2/100 → 20000 ppm
    // b: target = 410·3 div 4 = 307 → 6 epochs + 7/50 → 140000 ppm
    assert(plan.toSeq == Seq(("a", 100L, 102L, 1L, 20000L),
      ("b", 50L, 307L, 6L, 140000L)), plan.mkString(", "))
  }

  test("mixtureRealize: full epochs exact, fractional pass deterministic") {
    import spark.implicits._
    val corpus = ((0 until 200).map(i => (i.toLong, "a", 10L)) ++
      (0 until 100).map(i => (1000L + i, "b", 10L)))
      .toDF("doc_id", "source", "toks")
    val weights = Seq(("a", 1L), ("b", 6L)).toDF("source", "parts")
    // Σparts=7, budget 7000: a target 1000 → 0 epochs + 500000 ppm;
    // b target 6000 → 6 epochs + 0 ppm
    val plan = Sampling.mixturePlan(corpus, "source", "toks", weights, 7000L)
    val out = Sampling.mixtureRealize(corpus, "source", "doc_id", plan)
    val bySrc = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"), min("epoch").as("mn"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // b: exactly 6 copies of each doc, epochs 0..5
    assert(bySrc("b") == ((600L, 5L, 0L)), s"got ${bySrc("b")}")
    // a: fractional-only pass at 50% — count is a fixed function of the
    // hash, near half; every kept row sits in epoch 0
    val (na, mxa, mna) = bySrc("a")
    assert(mxa == 0L && mna == 0L)
    assert(na > 70L && na < 130L, s"≈50% of 200 docs expected, got $na")
    // determinism: rerun is identical row-for-row
    val again = Sampling.mixtureRealize(corpus, "source", "doc_id", plan)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
    // a source absent from the weights table is dropped entirely
    val planB = Sampling.mixturePlan(corpus, "source", "toks",
      Seq(("b", 1L)).toDF("source", "parts"), 600L)
    assert(Sampling.mixtureRealize(corpus, "source", "doc_id", planB)
      .where(col("source") === "a").count() == 0)
  }

  test("chunkWindows == brute-force reference across lengths, strides, tail modes") {
    import spark.implicits._
    def ref(n: Int, maxLen: Int, stride: Int, keepTail: Boolean): Seq[(Int, Int)] = {
      // (start, len) of each expected window over tokens 0..n-1
      val starts = Iterator.iterate(0)(_ + stride)
        .takeWhile(s => if (keepTail) s == 0 || s < n else s + maxLen <= n)
        .toSeq
      val kept = if (keepTail) {
        // starts advance while the previous window was truncated at maxLen:
        // 1 + ceil((n - maxLen) / stride) windows for n > maxLen, else 1
        val nw = if (n > maxLen) 1 + ((n - maxLen + stride - 1) / stride) else 1
        starts.take(nw)
      } else starts
      kept.map(s => (s, math.min(maxLen, n - s) max 0))
    }
    for {
      maxLen <- Seq(4, 7)
      stride <- Seq(2, 4, 7, 9) // overlap, disjoint, gap
      keepTail <- Seq(true, false)
      n <- 0 to 20
    } {
      val df = Seq((1L, (0 until n).map(_.toString))).toDF("doc_id", "toks")
      val got = Sampling.chunkWindows(df, "toks", maxLen, stride, keepTail)
        .orderBy("win_idx")
        .select("win_start", "win_len", "win_tokens")
        .collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt,
          r.getSeq[String](2)))
      val want = ref(n, maxLen, stride, keepTail)
      assert(got.map(g => (g._1, g._2)).toSeq == want,
        s"n=$n maxLen=$maxLen stride=$stride keepTail=$keepTail: " +
          s"got ${got.toSeq}, want $want")
      // window CONTENT is the exact token slice
      got.foreach { case (s, l, toks) =>
        assert(toks == (s until s + l).map(_.toString))
      }
    }
  }

  test("temporalEmbargoSplit: folds cover time, embargo purges neighbors, train never leaks") {
    import spark.implicits._
    // 100 rows at times 0..99; k=4 → cuts at 24,49,74 (smallest v with
    // cum >= ceil(p*n)); embargo 5 units
    val df = (0L until 100L).map(i => (i, i)).toDF("id", "t")
    val out = Sampling.temporalEmbargoSplit(df, "id", "t", k = 4, embargo = 5L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out.length == 400, "one row per (input row, fold)")
    // every row is test in EXACTLY one fold, and folds partition the line
    val testByFold = out.filter(_._2 == "test").groupBy(_._1)
      .view.mapValues(_.map(_._3).toSet).toMap
    assert(testByFold(0L) == (0L until 24L).toSet)
    assert(testByFold(1L) == (24L until 49L).toSet)
    assert(testByFold(2L) == (49L until 74L).toSet)
    assert(testByFold(3L) == (74L until 100L).toSet)
    // fold 1: purged = within 5 of [24,49) on either side
    val p1 = out.filter(r => r._1 == 1L && r._2 == "purged").map(_._3).toSet
    assert(p1 == ((19L until 24L) ++ (49L until 54L)).toSet, p1.toString)
    // train never overlaps test-or-purged for its fold
    for (f <- 0L until 4L) {
      val train = out.filter(r => r._1 == f && r._2 == "train").map(_._3).toSet
      val hot = out.filter(r => r._1 == f && r._2 != "train").map(_._3).toSet
      assert(train.intersect(hot).isEmpty && train.union(hot).size == 100)
    }
    // null timestamps are excluded, not misassigned
    val withNull = df.unionByName(Seq((999L, Option.empty[Long]))
      .toDF("id", "t"))
    assert(Sampling.temporalEmbargoSplit(withNull, "id", "t", 4, 5L)
      .where($"id" === 999L).count() == 0)
  }
}
