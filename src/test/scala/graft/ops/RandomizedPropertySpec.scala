package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized property tests (seeded → deterministic): each operator is
  * pitted against an obviously-correct naive reference over generated
  * inputs that cover the edges a hand-picked fixture misses — negative
  * coordinates, ties, empty sides, duplicate keys, single-element groups.
  * Five trials per property keeps the suite fast; the seed is fixed so a
  * failure is reproducible, not flaky. */
class RandomizedPropertySpec extends SparkSpec {

  test("property: binnedRangeJoin == naive inequality join on random inputs") {
    import spark.implicits._
    val rnd = new Random(4242)
    for (trial <- 0 until 5) {
      val nP = 50 + rnd.nextInt(150)
      val nI = 20 + rnd.nextInt(60)
      val span = 500
      val points = (0 until nP).map(i =>
        (i.toLong, (rnd.nextInt(2 * span) - span).toLong)).toDF("pid", "p")
      val intervals = (0 until nI).map { i =>
        val lo = (rnd.nextInt(2 * span) - span).toLong
        // mix of empty, inverted, short, and long intervals
        val hi = lo + (rnd.nextInt(120) - 20).toLong
        (i.toLong, lo, hi)
      }.toDF("iid", "lo", "hi")
      val binWidth = Seq(1L, 7L, 64L)(rnd.nextInt(3))
      val got = RangeJoin.binnedRangeJoin(points, intervals, "p", "lo", "hi", binWidth)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"trial $trial (binWidth=$binWidth) diverged")
    }
  }

  test("property: asOfDirectional == brute force on random keys/times with ties") {
    import spark.implicits._
    val rnd = new Random(777)
    for (trial <- 0 until 3) {
      val left = (0 until 80).map(i =>
        (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong)).toDF("event_id", "k", "t")
      val right = (0 until 120).map(_ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong)).toDF("k", "t")
      val l = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val r = right.collect().map(x => (x.getLong(0), x.getLong(1)))
      val dir = Seq(AsOfJoin.Backward, AsOfJoin.Forward, AsOfJoin.Nearest)(trial)
      val tol = if (trial % 2 == 0) Some(5L) else None
      val got = AsOfJoin.asOfDirectional(left, right, "k", "t", dir, tol, "m",
        merged = trial % 2 == 1)
        .collect().map(x => x.getLong(0) ->
          (if (x.isNullAt(x.fieldIndex("m"))) None
           else Some(x.getLong(x.fieldIndex("m"))))).toMap
      val want = l.map { case (id, k, t) =>
        val cands = r.filter(_._1 == k).map(_._2)
        val bwd = cands.filter(_ <= t).sorted.lastOption
          .filter(m => tol.forall(tv => t - m <= tv))
        val fwd = cands.filter(_ >= t).sorted.headOption
          .filter(m => tol.forall(tv => m - t <= tv))
        id -> (dir match {
          case AsOfJoin.Backward => bwd
          case AsOfJoin.Forward  => fwd
          case AsOfJoin.Nearest => (bwd, fwd) match {
            case (Some(b), Some(f)) => Some(if (f - t < t - b) f else b)
            case (b, f)             => b.orElse(f)
          }
        })
      }.toMap
      assert(got == want, s"trial $trial ($dir, tol=$tol) diverged")
    }
  }

  test("property: merge strategies agree and are idempotent on random stages") {
    import spark.implicits._
    val rnd = new Random(1337)
    val ts = java.sql.Timestamp.valueOf("2026-03-03 00:00:00")
    for (trial <- 0 until 3) {
      val target = (1 to 60).map(i =>
        (i.toLong, i.toLong, rnd.nextInt(5).toDouble)).toDF("_id", "k", "v")
        .withColumn("_updated_at", lit("2026-01-01 00:00:00").cast("timestamp"))
      // stage: random mix of unchanged copies, updates, brand-new keys,
      // and within-stage duplicate keys
      val stage = (0 until 50).map { _ =>
        val k = (1 + rnd.nextInt(90)).toLong
        val changed = rnd.nextBoolean()
        (1000L + k, k, if (changed) 99.0 else (k % 5).toDouble)
      }.toDF("_id", "k", "v")
      val spec = Merge.MergeSpec(uniqueKeys = Seq("k"))
      def normalize(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "v").collect().map(x => (x.getLong(0), x.getDouble(1))).toSet
      val viaBroadcast = Merge.merge(target, stage, ts,
        spec.copy(strategy = Merge.MergeStrategy.BroadcastStage))
      val viaFullOuter = Merge.merge(target, stage, ts,
        spec.copy(strategy = Merge.MergeStrategy.FullOuter))
      assert(normalize(viaBroadcast) == normalize(viaFullOuter),
        s"trial $trial: strategies disagree")
      // idempotency: merging the same stage again changes nothing
      val again = Merge.merge(viaBroadcast, stage, ts,
        spec.copy(strategy = Merge.MergeStrategy.BroadcastStage))
      assert(normalize(again) == normalize(viaBroadcast),
        s"trial $trial: merge not idempotent")
    }
  }

  test("property: packSequences == single-partition window reference") {
    import spark.implicits._
    val rnd = new Random(2025)
    for (trial <- 0 until 3) {
      val window = Seq(64L, 257L, 1000L)(trial)
      val docs = (0 until 300).map(i =>
        (i.toLong, (1 + rnd.nextInt(120)).toLong)).toDF("doc_id", "toks")
        .repartition(7)
      val got = graft.ext.Sampling.packSequences(docs, "doc_id", "toks", window)
        .select("doc_id", "bin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val want = docs.coalesce(1)
        .withColumn("bin", floor((sum(col("toks")).over(w) - col("toks")) / lit(window)))
        .select("doc_id", "bin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial (window=$window) diverged")
    }
  }

  test("property: cutDuplicatedSpans == brute-force mask on tiny-vocab corpora") {
    import spark.implicits._
    val rnd = new Random(313)
    for (trial <- 0 until 3) {
      val n = 2 + trial % 2 // gram lengths 2 and 3
      val vocab = Array("a", "b", "c")
      val corpus = (0 until 12 + rnd.nextInt(8)).map { d =>
        val len = 3 + rnd.nextInt(8)
        (d.toLong, (0 until len).map(_ => vocab(rnd.nextInt(3))).mkString(" "))
      }
      val got = graft.ext.Dedup
        .cutDuplicatedSpans(corpus.toDF("doc_id", "text").repartition(5),
          "text", "doc_id", n, minDocs = 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // brute force on gram STRINGS (the operator hashes; 60-bit collisions
      // are impossible over a 3-token vocabulary)
      def grams(text: String): Seq[String] = {
        val toks = text.split(" ").toSeq
        if (toks.length < n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      }
      val occ = corpus.flatMap { case (d, t) =>
        grams(t).zipWithIndex.map { case (g, p) => (g, d, p.toLong) }
      }
      val dup = occ.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val canon = occ.filter(o => dup(o._1)).groupBy(_._1)
        .map { case (g, os) => g -> os.map(o => (o._2, o._3)).min }
      val want = corpus.map { case (d, t) =>
        val cuts = grams(t).zipWithIndex.collect {
          case (g, p) if dup(g) && canon(g) != ((d, p.toLong)) => p.toLong
        }
        val toks = t.split(" ").toSeq
        d -> toks.zipWithIndex
          .filterNot { case (_, i) => cuts.exists(p => i >= p && i <= p + n - 1) }
          .map(_._1).mkString(" ")
      }.toMap
      assert(got == want, s"trial $trial (n=$n): " +
        s"diff=${(got.toSet diff want.toSet).take(3)} vs ${(want.toSet diff got.toSet).take(3)}")
    }
  }

  test("property: duplicatedSpanIntervals == brute-force interval merge") {
    import spark.implicits._
    val rnd = new Random(717)
    for (trial <- 0 until 3) {
      val n = 2 + trial % 2
      val vocab = Array("a", "b", "c")
      val corpus = (0 until 12 + rnd.nextInt(8)).map { d =>
        val len = 3 + rnd.nextInt(10)
        (d.toLong, (0 until len).map(_ => vocab(rnd.nextInt(3))).mkString(" "))
      }
      val got = graft.ext.Dedup
        .duplicatedSpanIntervals(corpus.toDF("doc_id", "text").repartition(5),
          "text", "doc_id", n, minDocs = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      def grams(text: String): Seq[String] = {
        val toks = text.split(" ").toSeq
        if (toks.length < n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      }
      val occ = corpus.flatMap { case (d, t) =>
        grams(t).zipWithIndex.map { case (g, p) => (g, d, p.toLong) }
      }
      val dup = occ.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      // brute force: per doc, sorted flagged positions folded into maximal
      // [start, end) intervals (merge when pos <= prev + n)
      val want = occ.filter(o => dup(o._1)).groupBy(_._2).toSeq.flatMap {
        case (d, os) =>
          val ps = os.map(_._3).distinct.sorted
          // intervals carry (start, end = last_pos + n, count); ascending
          // positions merge while pos <= prev_pos + n, i.e. pos <= end
          ps.foldLeft(List.empty[(Long, Long, Long)]) { (acc, p) =>
            acc match {
              case (s, e, c) :: rest if p <= e => (s, p + n, c + 1) :: rest
              case _                           => (p, p + n, 1L) :: acc
            }
          }.map { case (s, e, c) => (d, s, e, c) }
      }.toSet
      assert(got == want, s"trial $trial (n=$n): " +
        s"diff=${(got diff want).take(3)} vs ${(want diff got).take(3)}")
    }
  }

  test("property: semDedup == brute-force cluster-assign + lower-id neighbor rule") {
    import spark.implicits._
    val rnd = new Random(909)
    for (trial <- 0 until 3) {
      val dim = 4
      val n = 60 + rnd.nextInt(60)
      // small int coordinates force plenty of exact cosine ties
      val vecs = (0 until n).map { i =>
        (i.toLong, Array.fill(dim)((rnd.nextInt(7) - 3).toFloat / 3f))
      }.filter(_._2.exists(_ != 0f)) // zero vector has no cosine
      val df = vecs.toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .repartition(5)
      val nCells = 1 + rnd.nextInt(6)
      val threshold = Seq(0.5, 0.9, 0.999)(trial)
      val got = graft.ext.Similarity
        .semDedup(df, "embedding", "vec_id", nCells, threshold)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      // naive reference replaying the operator's exact-int64 arithmetic
      def dot(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).map { case (x, y) =>
          math.round(x.toDouble * y.toDouble * 1e15)
        }.sum.toDouble / 1e15
      def cos(a: Array[Float], b: Array[Float]): Double =
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      val book = vecs.sortBy(_._1).take(nCells)
      def cell(v: Array[Float]): Long =
        book.map { case (cid, cv) => (cos(v, cv), -cid, cid) }.max._3
      val assign = vecs.map { case (id, v) => id -> cell(v) }.toMap
      val want = vecs.map { case (id, v) =>
        val dup = vecs.exists { case (jd, jv) =>
          jd < id && assign(jd) == assign(id) && cos(jv, v) >= threshold
        }
        id -> (assign(id), !dup)
      }.toMap
      assert(got == want,
        s"trial $trial (n=${vecs.size}, cells=$nCells, t=$threshold): " +
          s"diff=${(got.toSet diff want.toSet).take(5)}")
    }
  }

  test("property: semDedupIncremental == brute-force cell-restricted pairing") {
    import spark.implicits._
    val rnd = new Random(1213)
    for (trial <- 0 until 3) {
      val dim = 4
      val nC = 40 + rnd.nextInt(40)
      val nB = 15 + rnd.nextInt(15)
      def mk(n: Int, idBase: Long) = (0 until n).map { i =>
        (idBase + i, Array.fill(dim)((rnd.nextInt(7) - 3).toFloat / 3f))
      }.filter(_._2.exists(_ != 0f))
      val corpus = mk(nC, 0L)
      val batch = mk(nB, 1000L)
      def toDf(v: Seq[(Long, Array[Float])]) = v.toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .repartition(5)
      val nCells = 1 + rnd.nextInt(6)
      val threshold = Seq(0.5, 0.9, 0.999)(trial)
      val got = graft.ext.Similarity
        .semDedupIncremental(toDf(corpus), toDf(batch), "embedding", "vec_id",
          nCells, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference replays the operator's arithmetic: assignment ranks by
      // dotScaled/cell_norm (query norm cancels), pairs verify by cosine
      def dotS(a: Array[Float], b: Array[Float]): Long =
        a.zip(b).map { case (x, y) =>
          math.round(x.toDouble * y.toDouble * 1e15)
        }.sum
      def nrm(a: Array[Float]): Double = math.sqrt(dotS(a, a).toDouble / 1e15)
      val book = corpus.sortBy(_._1).take(nCells)
        .map { case (id, v) => (id, v, nrm(v)) }
      def cell(v: Array[Float]): Long =
        book.map { case (cid, cv, cn) =>
          (dotS(v, cv).toDouble / cn, -cid, cid)
        }.max._3
      val want = (for {
        (bid, bv) <- batch
        (cid, cv) <- corpus
        if cell(bv) == cell(cv)
        if dotS(bv, cv).toDouble / 1e15 / (nrm(bv) * nrm(cv)) >= threshold
      } yield (bid, cid)).toSet
      assert(got == want,
        s"trial $trial (cells=$nCells, t=$threshold): " +
          s"diff=${(got diff want).take(5)} vs ${(want diff got).take(5)}")
    }
  }

  test("property: graft_kmv == k smallest distinct hashes; overlap == formula") {
    import spark.implicits._
    import graft.ext.{Sketches, TextHash}
    val rnd = new Random(9090)
    def h(s: String): Long = graft.plans.MinHashNative.hash60(s) % TextHash.P
    for (trial <- 0 until 4) {
      val k = Seq(4, 16, 64, 256)(trial)
      val nA = 10 + rnd.nextInt(400)
      val nB = 10 + rnd.nextInt(400)
      // overlapping id ranges with duplicates mixed in
      val aItems = (0 until nA).map(i => s"it-${rnd.nextInt(300)}")
      val bItems = (0 until nB).map(i => s"it-${100 + rnd.nextInt(300)}")
      val sa = Sketches.kmvSketch(aItems.map(Tuple1(_)).toDF("x"), col("x"), k)
        .collect()(0).getSeq[Long](0)
      // the sketch IS the bottom-k of the distinct hash set
      assert(sa == aItems.map(h).distinct.sorted.take(k),
        s"trial $trial: sketch != brute bottom-$k")
      val sb = Sketches.kmvSketch(bItems.map(Tuple1(_)).toDF("x"), col("x"), k)
        .collect()(0).getSeq[Long](0)
      val got = Sketches.kmvSketch(aItems.map(Tuple1(_)).toDF("x"), col("x"), k)
        .select(col("kmv").as("a"))
        .crossJoin(Sketches.kmvSketch(bItems.map(Tuple1(_)).toDF("x"), col("x"), k)
          .select(col("kmv").as("b")))
        .select(Sketches.kmvOverlap(col("a"), col("b"), k).as("o"))
        .select(col("o.est_inter"), col("o.est_union")).collect()(0)
      // brute formula over the same sketches
      val thetaA = if (sa.length < k) TextHash.P else sa.last
      val thetaB = if (sb.length < k) TextHash.P else sb.last
      val th = math.min(thetaA, thetaB)
      val fa = sa.filter(_ < th).toSet
      val fb = sb.filter(_ < th).toSet
      val scale = TextHash.P.toDouble / th.toDouble
      assert(got.getDouble(0) == (fa & fb).size.toDouble * scale, s"trial $trial inter")
      assert(got.getDouble(1) == (fa | fb).size.toDouble * scale, s"trial $trial union")
    }
  }

  test("property: mixture realize counts == integer plan formula per source") {
    import spark.implicits._
    import graft.ext.Sampling
    val rnd = new Random(3131)
    for (trial <- 0 until 4) {
      val nSrc = 2 + rnd.nextInt(5)
      val corpus = (0 until 300).map { i =>
        (i.toLong, s"s${rnd.nextInt(nSrc)}", (1 + rnd.nextInt(50)).toLong)
      }.toDF("doc_id", "source", "toks")
      val weights = (0 until nSrc).map(s => (s"s$s", (1 + rnd.nextInt(9)).toLong))
        .toDF("source", "parts")
      val budget = 1000L + rnd.nextInt(100000)
      val plan = Sampling.mixturePlan(corpus, "source", "toks", weights, budget)
      val got = Sampling.mixtureRealize(corpus, "source", "doc_id", plan)
        .groupBy("source").agg(count(lit(1))).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // brute: integer arithmetic + the same ppm hash per doc
      val rows = corpus.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val wts = weights.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val tp = wts.values.sum
      val want = rows.groupBy(_._2).flatMap { case (src, ds) =>
        val avail = ds.map(_._3).sum
        val target = budget * wts(src) / tp
        val epochs = target / avail
        val frac = (target % avail) * 1000000L / avail
        val fracN = ds.count { case (id, _, _) =>
          graft.plans.MinHashNative.hash60(s"$id:mix") % graft.ext.TextHash.P % 1000000L < frac
        }
        val n = epochs * ds.length + fracN
        if (n > 0) Some(src -> n) else None
      }
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("property: trainMerges == naive Sennrich reference on tiny-vocab corpora") {
    import spark.implicits._
    val rnd = new Random(6060)
    def naive(words: Seq[String], numMerges: Int): Seq[(String, String)] = {
      var vocab: Map[List[String], Long] = words.groupBy(identity)
        .map { case (w, ws) => w.map(_.toString).toList -> ws.size.toLong }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (out.length < numMerges && !done) {
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, n) =>
          syms.sliding(2).foreach {
            case List(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + n
            case _ =>
          }
        }
        if (pairs.isEmpty) done = true
        else {
          val best = pairs.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
          out += best
          vocab = vocab.groupBy { case (syms, _) =>
            // left-to-right non-overlapping merge of the best pair
            val b = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
                b += best._1 + best._2; i += 2
              } else { b += syms(i); i += 1 }
            }
            b.toList
          }.map { case (k, vs) => k -> vs.values.sum }
        }
      }
      out.toSeq
    }
    for (trial <- 0 until 3) {
      val alphabet = "abc".take(2 + rnd.nextInt(2))
      val words = (0 until 40).map { _ =>
        (0 until (1 + rnd.nextInt(5))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val corpus = words.grouped(8).map(g => Tuple1(g.mkString(" "))).toSeq.toDF("text")
      val got = graft.ext.Bpe.trainMerges(corpus, "text", numMerges = 6)
      val want = naive(words, 6)
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }
}
