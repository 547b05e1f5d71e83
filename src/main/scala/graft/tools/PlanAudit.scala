package graft.tools


/** One-pass plan audit over every SparkEntry query: flags nested-loop /
  * cartesian joins (the quadratic-plan smells) and counts exchanges, so a
  * scale regression shows up as a diff in this tool's output rather than
  * a slow cluster run. BNLJ is acceptable ONLY with a constant-size
  * broadcast build side (the ANN query-set pattern, s1/s4) — anything
  * else listed here is a bug.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.local(8)
    // Queries whose nested-loop join is a CONSTANT-size broadcast by
    // design (never grows with the corpus) — the legitimate BNLJ shape.
    val allowed = Map(
      "s1_ann_bruteforce_topk" ->
        "corpus scanned once against the broadcast fixed-size query set (theta join)",
      "s4_ann_ivf_topk" ->
        "corpus x broadcast constant-size centroid sample (IVF assignment/probing)",
      "s5_ann_quantized_topk" ->
        "int8 corpus scanned once against the broadcast fixed-size query set (theta join)",
      "t7_winnowing_fingerprints" ->
        "crossJoin(broadcast(<one-row nDocs frame>)) for the relational threshold",
      "t9_tfidf" ->
        "crossJoin(broadcast(<one-row nDocs frame>)) for the idf/df thresholds",
      "t11_surprisal" ->
        "crossJoin(broadcast(<one-row total-tokens frame>)) for the unigram model",
      "x6_kmv_overlap" ->
        "pair enumeration over the |event_type|-row post-aggregate sketch frame (constant size)",
      "x7_kmv_union" ->
        "pair enumeration over the |event_type|-row post-aggregate sketch frame (constant size)",
      "q41_daily_spine" ->
        "calendar spine x priority dim (calendar- and enum-bounded, not data-bounded)")
    // Iterative operators EXECUTE when their builder runs (label
    // propagation materializes per round), so "building the plan" would
    // run the whole algorithm and return only a scan of the checkpointed
    // result — nothing to audit. Their per-round join shape is the same
    // pair-graph equi-join audited via d2.
    val iterative = Map(
      "d6_dedup_clusters" ->
        "iterative label propagation; per-round shape == d2's audited joins",
      "d7_dedup_canonical" ->
        "consumes d6's materialized components; per-round shape == d2's audited joins")
    // d2's queries() entry returns the eagerly materialized pair-graph
    // view (a checkpointed-RDD scan — nothing to audit); audit the lazy
    // pipeline it materializes instead.
    val lazyTwin: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("d2_dedup_minhash_lsh" ->
        ((s, d) => graft.operators.Dedup.nearDupPairs(graft.Tables.documents(s, d))))
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        if (iterative.contains(name)) {
          println(f"[audit] $name%-28s SKIPPED [${iterative(name)}]")
        } else {
        val plan = lazyTwin.getOrElse(name, fn)(spark, sfDir)
          .queryExecution.executedPlan.toString
        val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        val cart = plan.linesIterator.count(_.contains("CartesianProduct"))
        val exch = plan.linesIterator.count(_.contains("Exchange"))
        val note =
          if (cart > 0 || (bnlj > 0 && !allowed.contains(name))) { flagged += 1; "  <== inspect" }
          else if (bnlj > 0) s"  [allowed: ${allowed(name)}]"
          else ""
        println(f"[audit] $name%-28s exchanges=$exch%2d bnlj=$bnlj cartesian=$cart$note")
        }
      } catch {
        case e: Throwable => println(s"[audit] $name FAILED to plan: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    println(s"[audit] queries with UNEXPECTED nested-loop/cartesian joins: $flagged")
    spark.stop()
  }
}
