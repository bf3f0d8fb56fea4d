package graft.queries

import graft.SparkSpec

/** Plan-shape regression guard: the properties that make these queries
  * scale — filters reaching the parquet scan, column pruning, dims
  * broadcast, top-k as TakeOrderedAndProject — asserted on the executed
  * plan so a refactor can't silently trade them away.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf001)
      .queryExecution.executedPlan.toString

  test("q_filter_complex pushes predicates into the parquet scan") {
    val p = plan("q_filter_complex")
    assert(p.contains("PushedFilters: ["), p)
    // at least one real pushed predicate, not an empty list
    assert(!p.contains("PushedFilters: []"), p)
  }

  test("q_proj_net prunes the lineitem scan to the projected columns") {
    val p = plan("q_proj_net")
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    // the 16-column table must not be read wholesale
    assert(read.nonEmpty, p)
    assert(!read.contains("l_comment"), read)
    assert(!read.contains("l_shipmode"), read)
  }

  test("q_join_star broadcasts the dimension tables") {
    val p = plan("q_join_star")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q_sort_topk plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q_sort_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_join_merge keeps the large-large join on the merge path") {
    val p = plan("q_join_merge")
    assert(p.contains("SortMergeJoin"), p)
  }

  test("q_sim_topk broadcasts the query side (one corpus pass)") {
    val p = plan("q_sim_topk")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_agg_pricing aggregates partial then final (map-side combine)") {
    val p = plan("q_agg_pricing")
    assert(p.contains("partial_"), p) // HashAggregate(..., functions=[partial_sum...])
  }
}
