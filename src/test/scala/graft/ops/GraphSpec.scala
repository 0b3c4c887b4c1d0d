package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Integer fixed-point PageRank: brute-force recurrence equality on
  * random graphs (dangling nodes, parallel edges, self-loops), authority
  * ordering, and mass conservation up to floor shedding. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** The identical integer recurrence, in-memory. */
  private def naive(
      edges: Seq[(Long, Long)], iters: Int, dPpm: Long): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> Graph.Mass / n).toMap
    for (_ <- 0 until iters) {
      val dang = nodes.filterNot(outdeg.contains).map(r).sum
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) =>
        in(d) += (r(s) * dPpm / 1000000L) / outdeg(s)
      }
      r = nodes.map(v => v ->
        ((Graph.Mass * (1000000L - dPpm) / 1000000L) / n +
          in(v) + (dPpm * dang / 1000000L) / n)).toMap
    }
    r
  }

  test("pageRank == naive integer recurrence on random graphs") {
    val rnd = new Random(2718)
    for (trial <- 0 until 3) {
      val nV = 5 + rnd.nextInt(20)
      val nE = 10 + rnd.nextInt(60)
      // self-loops and parallel edges included; some nodes dangle
      val edges = (0 until nE).map(_ =>
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val iters = 1 + rnd.nextInt(5)
      val got = Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive(edges, iters, 850000L), s"trial $trial diverged")
    }
  }

  test("authority ordering: a hub pointed at by everyone outranks the leaves") {
    val edges = (1L to 9L).map(i => (i, 0L)) ++ Seq((0L, 1L))
    val r = Graph.pageRank(edges.toDF("s", "d"), "s", "d", iterations = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // the hub and its sole target (which receives the hub's entire damped
    // mass, forming the 0↔1 cycle) both tower over the other leaves
    assert((2L to 9L).forall(i => r(0L) > 10 * r(i)), s"hub must dominate leaves: $r")
    assert((2L to 9L).forall(i => r(1L) > 10 * r(i)), s"hub target must dominate leaves: $r")
  }

  test("mass conserved up to floor shedding; damping 1e6 and 0 edge cases") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)) // 4 dangles into cycle
    val total = Graph.pageRank(edges.toDF("s", "d"), "s", "d", 8)
      .agg(sum("rank_q")).first().getLong(0)
    assert(total <= Graph.Mass && total > Graph.Mass - 1000L,
      s"mass must survive up to floors: $total")
    // d = 0: pure teleport — everyone gets exactly M div N
    val tele = Graph.pageRank(edges.toDF("s", "d"), "s", "d", 3, dampingPpm = 0L)
      .collect().map(_.getLong(1)).distinct
    assert(tele.toSeq == Seq(Graph.Mass / 4), s"pure teleport is uniform: $tele")
  }

  /** Union-find reference for connected components. */
  private def naiveCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  test("connectedComponents == union-find on random graphs") {
    val rnd = new Random(11)
    for (trial <- 0 until 5) {
      val n = 30 + rnd.nextInt(40)
      val edges = (0 until n).map(_ =>
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      val got = Graph.connectedComponents(
          edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naiveCC(edges), s"trial $trial: $got vs ${naiveCC(edges)}")
    }
  }

  test("connectedComponents: chain, disjoint pair, self-loop") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain → component 1
      (10L, 11L),                                 // pair → component 10
      (20L, 20L))                                 // self-loop → singleton 20
    val got = Graph.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }
}
