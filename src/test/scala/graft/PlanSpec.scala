package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality gates: the scale posture is asserted, not hoped for.
  * These run the declared queries' EXPLAIN output against the testdata and
  * fail if pushdown/pruning/broadcast regress. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q10: filter is pushed to the lineitem scan and columns are pruned") {
    val p = plan("q10_returned_items")
    assert(p.contains("EqualTo(l_returnflag,R)"), "filter must reach PushedFilters")
    assert(p.contains("BroadcastHashJoin"), "dim joins must broadcast")
    assert(!p.contains("l_shipdate"), "unused columns must be pruned from the scan")
  }

  test("q1: aggregation is partial+final (map-side combine)") {
    val p = plan("q1_pricing_summary").toLowerCase
    val aggs = "hashaggregate".r.findAllIn(p).length
    assert(aggs >= 2, s"must have partial+final aggregation, saw $aggs HashAggregate nodes")
    assert(p.contains("partial_sum"), "must have map-side partial aggregation")
  }

  test("q5: all five dimension joins broadcast — single fact scan, no fact shuffle join") {
    val p = plan("q5_local_supplier")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
    assert(!p.contains("SortMergeJoin"), "no sort-merge join of the fact table")
  }

  test("o1: ordered scan reads only projected columns") {
    val p = plan("o1_ordered_scan")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int"),
      "scan schema must be pruned to the projection")
  }

  test("merge broadcast strategy produces no full-outer sort-merge join") {
    val p = plan("j1_merge_upsert")
    // auto strategy at this size must pick the broadcast formulation
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }
}
