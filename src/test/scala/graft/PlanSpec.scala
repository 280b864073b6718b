package graft

/** Plan-shape regression guards for the scale-critical queries: the
  * properties that make these operators 100-TB-viable (pushdown, pruning,
  * broadcast dimension joins, equi-join candidate generation, map-side
  * partial aggregation) asserted on the physical plan, so a refactor that
  * silently degrades a plan fails the suite, not just the bench.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sparkPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan.toString

  test("s06: predicate and projection are pushed to the parquet scan") {
    val p = sparkPlan("s06_param_scan")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), " +
      "EqualTo(o_orderstatus,O)]"), p.take(800))
    // column pruning: untouched wide columns never leave the scan
    assert(!p.contains("o_comment") && !p.contains("o_clerk"))
  }

  test("s06 template path keeps the same pushdown as the DataFrame form") {
    val p = sparkPlan("s06_template_scan")
    assert(p.contains("EqualTo(o_orderstatus,O)"))
    assert(!p.contains("o_comment"))
  }

  test("j01: dimension lookup is a broadcast hash join") {
    assert(sparkPlan("j01_broadcast_lookup").contains("BroadcastHashJoin"))
  }

  test("q01: aggregation has a map-side partial stage") {
    // partial + final HashAggregate pair around the exchange
    val p = sparkPlan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
  }

  test("dedup/similarity candidate generation is never a cartesian") {
    Seq("dd03_minhash_lsh", "dd04_simhash", "dd06_embedding_neardup_lsh",
        "j05_fuzzy_top1").foreach { q =>
      val p = sparkPlan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
    }
  }
}
