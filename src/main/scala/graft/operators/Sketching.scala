package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import Num._

/** Approximate-sketch operators (SURVEY.md §2 I1–I17): the constant-memory
  * summaries a 100 TB pipeline uses where exact answers would shuffle the
  * world. Sketch internals are engine-specific, so raw estimates admit no
  * DuckDB hash oracle — queries whose output is provably exact (x3's
  * sketch+verify, x8's below-capacity roll-up) carry full oracles
  * directly, and the estimator queries (x1/x2/x4, and x17 via its
  * guaranteed-tracked subset) use the BOUNDS-ORACLE scheme: the driver
  * frame carries the exact answer plus a within-bounds boolean comparing
  * Spark's own estimate to it, and the oracle replays the exact side
  * pinning TRUE — an estimator regression flips the hash red without
  * pretending the sketch is deterministic.
  */
object Sketching {

  // I1 — HyperLogLog++ distinct counts per segment (rsd 1%): the
  // map-side-combinable alternative to COUNT(DISTINCT)'s expand+shuffle.
  //
  // FULL oracle via the bounds-oracle scheme (round-10 promotion): the
  // estimate itself is engine-specific, so the driver-checked frame
  // carries (exact, within_tol) where within_tol compares Spark's OWN
  // estimate to the exact count at 5% (> 4 sigma for rsd 1% — a real
  // estimator regression flips the boolean, a healthy one never does)
  // and the oracle replays the exact side and pins TRUE. The exact
  // COUNT(DISTINCT) leg exists for the GATE only — it is how any sketch
  // is verified at test scale; the production path at 100 TB is the
  // estimate alone (the scale story this operator documents).
  private val x1 = Relational.Q(
    "x1_approx_distinct",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          approx_count_distinct(col("o_custkey"), rsd = 0.01).as("approx_custs"),
          countDistinct(col("o_custkey")).as("exact_custs"),
          count(lit(1)).as("n_orders"))
        .select(col("o_orderpriority"), col("exact_custs"), col("n_orders"),
          (abs(col("approx_custs") - col("exact_custs")).cast("double") <=
            lit(0.05) * col("exact_custs").cast("double")).as("within_tol"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority,
        CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
        COUNT(*) AS n_orders,
        TRUE AS within_tol
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    // Bench times the SKETCH-ONLY production path (r10 advice: the exact
    // COUNT(DISTINCT) leg is the verify gate, not what a 100 TB run pays)
    benchFn = Some((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(approx_count_distinct(col("o_custkey"), rsd = 0.01).as("approx_custs"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))))

  // I2 — approximate quantiles (Greenwald-Khanna, rank error <= n/10000)
  // of the fact table's price column, per return flag.
  //
  // FULL oracle via the x1 bounds-oracle scheme: the frame carries the
  // EXACT percentiles (x5's machinery, replayed by DuckDB's
  // quantile_cont) plus within_tol = both approx legs within 2% of
  // exact (rank error n/10000 puts the true value error far below
  // that on this price distribution; the 2% band is the same one the
  // spec has enforced since round 1 — a GK regression flips the
  // boolean). Production at 100 TB runs the approx leg alone: GK state
  // is bounded per group while percentile() buffers every value.
  private val x2 = Relational.Q(
    "x2_approx_quantiles",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("am"),
          expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("ap"),
          expr("percentile(l_extendedprice, 0.5)").as("em"),
          expr("percentile(l_extendedprice, 0.99)").as("ep"),
          count(lit(1)).as("n_lines"))
        .select(col("l_returnflag"),
          r2(col("em")).as("median"), r2(col("ep")).as("p99"), col("n_lines"),
          (abs(col("am") - col("em")) <= lit(0.02) * col("em") &&
            abs(col("ap") - col("ep")) <= lit(0.02) * col("ep")).as("within_tol"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      SELECT l_returnflag,
        ${r2Sql("quantile_cont(l_extendedprice, 0.5)")} AS median,
        ${r2Sql("quantile_cont(l_extendedprice, 0.99)")} AS p99,
        COUNT(*) AS n_lines,
        TRUE AS within_tol
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    // Bench times GK alone — percentile()'s full value buffer is the
    // verify gate's cost, not the production path's
    benchFn = Some((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("am"),
          expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("ap"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag"))))

  // I3 — count-min-style heavy hitters: top tokens by frequency from a
  // bounded-width hashed-bucket aggregate (two shuffles, constant state
  // per bucket), cross-checked against the exact histogram in the spec.
  private val x3 = Relational.Q(
    "x3_heavy_hitters",
    (s, d) => {
      val tokens = Tables.spread(Tables.documents(s, d).select(col("text")))
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      // width-1024 hashed buckets: bucket counts are upper bounds on any
      // token's frequency (count-min with one row); candidates above the
      // threshold are then counted exactly — the classic sketch+verify.
      val bucketed = tokens
        .groupBy(pmod(xxhash64(col("token")), lit(1024L)).as("bucket"))
        .agg(count(lit(1)).as("bucket_count"))
        .filter(col("bucket_count") >= 100)
      tokens
        .join(broadcast(bucketed),
          pmod(xxhash64(col("token")), lit(1024L)) === col("bucket"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= 100)
        .orderBy(col("freq").desc, col("token"))
    },
    // The output is provably EXACT (bucket counts upper-bound any member
    // token's frequency, so pruning can never drop a true heavy hitter;
    // survivors are then counted exactly) — hence a full DuckDB oracle
    // even though the pruning itself is a sketch.
    Some("""
      SELECT token, COUNT(*) AS freq FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        FROM documents)
      GROUP BY token HAVING COUNT(*) >= 100
      ORDER BY freq DESC, token"""))

  // I4 — MERGEABLE distinct sketches (Apache DataSketches HLL via
  // hll_sketch_agg/hll_union_agg): the 100 TB pattern x1 can't express —
  // build one small sketch per partition/day ONCE, store it, and answer
  // any-grain distinct questions later by unioning sketches instead of
  // rescanning raw data. Here: per-priority customer sketches → one
  // union → global distinct estimate, all in two map-side-combinable
  // aggregates over constant-size state.
  //
  // FULL oracle via the x1 bounds-oracle scheme: the frame carries the
  // exact global distinct count plus within_tol = union-of-partials
  // estimate within 5% of exact (lgK 14 → rsd ~0.8%, so 5% is > 6
  // sigma). The union == single-pass equality stays in the spec (both
  // sides are engine-internal). Production at 100 TB stores the partial
  // sketches and never runs the exact leg — that is the whole point of
  // mergeable sketches.
  private val x4 = Relational.Q(
    "x4_sketch_union",
    (s, d) => {
      val perPriority = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"),
          count(lit(1)).as("n_orders"))
      val exact = Tables.orders(s, d)
        .agg(countDistinct(col("o_custkey")).as("exact_custs"))
      perPriority.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est_custs"),
          count(lit(1)).as("n_partial_sketches"),
          sum(col("n_orders")).as("n_orders"))
        .crossJoin(broadcast(exact))
        .select(col("exact_custs"), col("n_partial_sketches"), col("n_orders"),
          (abs(col("est_custs") - col("exact_custs")).cast("double") <=
            lit(0.05) * col("exact_custs").cast("double")).as("within_tol"))
    },
    Some("""
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
        CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_partial_sketches,
        COUNT(*) AS n_orders,
        TRUE AS within_tol
      FROM orders"""),
    // Bench times build-partials + union alone — the mergeable-sketch
    // production path never runs the exact leg (that IS its point)
    benchFn = Some((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"),
          count(lit(1)).as("n_orders"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est_custs"),
          count(lit(1)).as("n_partial_sketches"),
          sum(col("n_orders")).as("n_orders"))))

  // I5 — EXACT percentiles (the sort-based ground truth x2 approximates):
  // Spark's percentile() aggregates per group with a full value buffer —
  // right when the answer must be exact and groups fit in memory; at
  // 100 TB prefer x2's fixed-state sketch. Having both, oracle-checked
  // against each other's engines, documents the exact-vs-sketch tradeoff
  // with running code. Interpolation is (1-f)*lo + f*hi in both engines;
  // r2 quantization absorbs last-ulp differences.
  private val x5 = Relational.Q(
    "x5_exact_quantiles",
    (s, d) => {
      // r17: one multi-percentile state instead of two (the q15 note)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, array(0.5, 0.99))").as("pp"),
          count(lit(1)).as("n_lines"))
        .select(col("l_returnflag"),
          r2(element_at(col("pp"), 1)).as("median"),
          r2(element_at(col("pp"), 2)).as("p99"),
          col("n_lines"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      SELECT l_returnflag,
        ${r2Sql("quantile_cont(l_extendedprice, 0.5)")} AS median,
        ${r2Sql("quantile_cont(l_extendedprice, 0.99)")} AS p99,
        COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // I6 — KMV theta-sketch set overlap: shared distinct users between
  // every event-type pair, from ONE bounded-state sketch per type (the
  // custom KMinValues imperative aggregate, state = k longs) instead of
  // a per-pair distinct-join. Theta-sketch estimation: values below
  // theta = min(theta_a, theta_b) are a uniform rate-theta sample of
  // each set, so shared ~= |common below theta| / theta — and BELOW
  // capacity the sketch holds the whole distinct set, theta = 1, and the
  // answer is EXACT, which is why this query is fully oracle-checkable
  // at test scale (k=2048 > the 1.5k distinct users at sf0.1) while the
  // estimator path is spec-bounded on constructed >k data. The pair
  // enumeration cross-joins the 5-row per-type sketch frame (constant
  // size — the data-volume work all happened in the sketch aggregate),
  // and the interpreted filter/intersect HOFs touch only those 10 rows.
  /** Theta-sketch overlap estimate from two KMV arrays built at capacity
    * `k`: values below theta = min(theta_a, theta_b) are a uniform
    * rate-theta sample of each set, so |A∩B| ~= |common below theta| /
    * theta. Below capacity theta is exactly 1.0 and the estimate is the
    * exact intersection count. Shared by x6 and its estimator-regime spec
    * so the spec exercises THIS expression, not a copy. The filter HOFs
    * are interpreted — fine here, they only ever touch <= k-element
    * arrays on a post-aggregate frame, never a per-row hot path.
    *
    * `k` MUST be the capacity the sketches were built with: a KMinValues
    * sketch is exactly k longs when saturated and fewer when not, so
    * saturation is derived from the invariant `size(sketch) == k`.
    * Passing a different k silently mis-detects saturation and skews
    * theta (the sketch array does not carry its k) — keep the build and
    * query k in one constant, as x6 does.
    */
  def kmvOverlapEstimate(skA: org.apache.spark.sql.Column,
      skB: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    def theta(c: org.apache.spark.sql.Column) =
      when(size(c) === k, element_at(c, k)).otherwise(lit(Long.MaxValue))
    val th = least(theta(skA), theta(skB))
    val common = graft.functions.SortedIntersectSize(
      filter(skA, x => x < th), filter(skB, x => x < th)).cast("double")
    val thFrac = when(th === Long.MaxValue, lit(1.0))
      .otherwise(th / 1.8446744073709552e19 + 0.5)
    common / thFrac
  }

  private val x6 = Relational.Q(
    "x6_kmv_overlap",
    (s, d) => {
      val K = 2048
      val sk = Tables.events(s, d)
        // the oracle's equi-join never matches NULL = NULL; an unguarded
        // xxhash64(NULL) would hash to the seed and count as a shared
        // "user" in every sketch
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), xxhash64(col("user_id")).as("h"))
        .groupBy(col("event_type"))
        .agg(graft.functions.KMinValues(col("h"), K).as("sk"))
      val a = sk.select(col("event_type").as("type_a"), col("sk").as("sk_a"))
      val b = sk.select(col("event_type").as("type_b"), col("sk").as("sk_b"))
      a.crossJoin(b).filter(col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          round(kmvOverlapEstimate(col("sk_a"), col("sk_b"), K))
            .cast("long").as("shared_users"))
        .filter(col("shared_users") > 0)
        .orderBy(col("type_a"), col("type_b"))
    },
    Some("""
      WITH u AS (SELECT DISTINCT event_type, user_id FROM events)
      SELECT a.event_type AS type_a, b.event_type AS type_b,
        COUNT(*) AS shared_users
      FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Theta-sketch UNION estimate from two KMV arrays built at capacity
    * `k`: the union's sketch is the k smallest distinct values of the
    * concatenated sketches (the defining KMV merge — associative and
    * commutative, so sketches can be combined across shards/days before
    * estimating). If the merged sketch saturates at k values its k-th
    * value is the union's theta and |A∪B| ~= (k-1)/theta; below
    * capacity the merge holds the whole distinct union and the count is
    * EXACT. Same k contract as [[kmvOverlapEstimate]]. The array HOFs
    * are interpreted but only ever touch <= 2k-element arrays on a
    * post-aggregate frame.
    */
  def kmvUnionEstimate(skA: org.apache.spark.sql.Column,
      skB: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    // When BOTH inputs are unsaturated each sketch holds its ENTIRE set,
    // so the distinct union is fully available and must be returned
    // exactly — even when it has >= k members (slicing to k and
    // estimating would discard information we hold). Only when an input
    // sketch saturated (lost members) does the theta estimator apply.
    // One sorted-distinct union serves every branch (no separate slice:
    // element_at(sorted, k) IS the merged sketch's theta when the union
    // reaches k members).
    val sorted = array_sort(array_distinct(concat(skA, skB)))
    when(size(skA) < k && size(skB) < k, size(sorted).cast("double"))
      .otherwise(when(size(sorted) >= k,
          lit((k - 1).toDouble) / (element_at(sorted, k) / 1.8446744073709552e19 + 0.5))
        .otherwise(size(sorted).cast("double")))
  }

  /** Per-sketch distinct-count estimate: exact (= size) below capacity,
    * the (k-1)/theta KMV estimator at saturation. The companion to
    * [[kmvUnionEstimate]] for inclusion-exclusion arithmetic — using raw
    * `size(sk)` for set cardinality silently floors at k once the sketch
    * saturates, which turns exclusive counts into garbage.
    *
    * Boundary regime (round-5 ADVICE, documented by design): a sketch at
    * size == k is INDISTINGUISHABLE from a saturated one — the aggregate
    * discarded nothing iff the input had <= k distinct values, and the
    * retained array alone cannot witness which happened (a saturation
    * flag would have to travel in the sketch struct and survive merges).
    * The estimator therefore treats size == k as saturated: a set of
    * EXACTLY k distinct members estimates as (k-1)/theta rather than
    * returning k. That one-point regime is still inside the estimator's
    * ~1/sqrt(k-2) relative-error envelope (the k-th smallest hash IS
    * theta), so nothing downstream needs the distinction; callers that
    * need integer exactness AT k must size k strictly above their
    * cardinality bound — the x6/x7/x8 contract.
    */
  def kmvCardinalityEstimate(sk: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    when(size(sk) === k,
        lit((k - 1).toDouble) / (element_at(sk, k) / 1.8446744073709552e19 + 0.5))
      .otherwise(size(sk).cast("double"))

  // I7 — KMV union/difference algebra: the other half of x6's sketch
  // story — per event-type pair, distinct |A∪B| via the KMV merge (the
  // reason KMV is the production shape: per-shard/per-day sketches
  // combine WITHOUT the raw data) and the exclusive counts |A\B| and
  // |B\A| by inclusion-exclusion from the per-sketch sizes. Below
  // capacity everything is exact (k=2048 > distinct users at test SFs),
  // so the whole algebra is oracle-checked; the saturated regime is
  // spec-bounded like x6's. The pair frame is the same constant-size
  // post-aggregate cross join as x6.
  private val x7 = Relational.Q(
    "x7_kmv_union",
    (s, d) => {
      val K = 2048
      val sk = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), xxhash64(col("user_id")).as("h"))
        .groupBy(col("event_type"))
        .agg(graft.functions.KMinValues(col("h"), K).as("sk"))
      val a = sk.select(col("event_type").as("type_a"), col("sk").as("sk_a"))
      val b = sk.select(col("event_type").as("type_b"), col("sk").as("sk_b"))
      a.crossJoin(b).filter(col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          round(kmvUnionEstimate(col("sk_a"), col("sk_b"), K)).cast("long").as("union_users"),
          round(kmvCardinalityEstimate(col("sk_a"), K)).cast("long").as("ca"),
          round(kmvCardinalityEstimate(col("sk_b"), K)).cast("long").as("cb"))
        // below capacity the cardinality estimate IS the exact per-type
        // distinct count (it equals size(sk)), so the exclusive counts
        // are integer-exact inclusion-exclusion; at saturation size(sk)
        // would silently floor at k — the estimator keeps the exclusive
        // counts meaningful (estimates, spec-bounded) in both regimes
        .select(col("type_a"), col("type_b"), col("union_users"),
          (col("union_users") - col("cb")).as("only_a_users"),
          (col("union_users") - col("ca")).as("only_b_users"))
        .orderBy(col("type_a"), col("type_b"))
    },
    Some("""
      WITH u AS (SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL),
      t AS (SELECT DISTINCT event_type FROM u),
      c AS (SELECT event_type, COUNT(*) AS n FROM u GROUP BY 1),
      un AS (
        SELECT ta.event_type AS type_a, tb.event_type AS type_b,
          (SELECT COUNT(DISTINCT user_id) FROM u
           WHERE event_type = ta.event_type OR event_type = tb.event_type) AS union_users
        FROM t ta JOIN t tb ON ta.event_type < tb.event_type)
      SELECT un.type_a, un.type_b, un.union_users,
        un.union_users - cb.n AS only_a_users,
        un.union_users - ca.n AS only_b_users
      FROM un
      JOIN c ca ON ca.event_type = un.type_a
      JOIN c cb ON cb.event_type = un.type_b
      ORDER BY type_a, type_b"""))

  // I8 — KMV ROLL-UP: the store-sketches-once / merge-at-query-time
  // pattern with the custom mergeable aggregate (x4 shows it with the
  // built-in HLL; this is the same architecture with an EXACT oracle).
  // Stage 1 builds one bounded sketch per (event_type, day) — the
  // artifact a 100 TB pipeline materializes per partition/day. Stage 2
  // answers "distinct users per type over all days" WITHOUT raw data:
  // explode the retained values and re-aggregate KMinValues — correct
  // because any value among the k smallest globally is among its own
  // day's k smallest (pigeonhole), so the re-aggregated sketch is
  // BIT-IDENTICAL to a single pass over the raw column (spec-pinned in
  // the saturated regime). Below capacity the roll-up is exact, hence
  // the COUNT(DISTINCT) oracle. CAPACITY CONTRACT (round-5 ADVICE): the
  // exact oracle holds only while every event_type stays below K=2048
  // distinct users — above it the estimator regime begins and the check
  // would fail BY DESIGN, not by bug. SketchingSpec gates the assumption
  // (asserts per-type cardinality < K on the test corpus, with headroom),
  // so testdata outgrowing the capacity fails loudly in the suite rather
  // than cryptically in the driver gate.
  private val x8 = Relational.Q(
    "x8_kmv_rollup",
    (s, d) => {
      val K = 2048
      val daily = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          xxhash64(col("user_id")).as("h"))
        .groupBy(col("event_type"), col("day"))
        .agg(graft.functions.KMinValues(col("h"), K).as("sk"))
      daily
        .select(col("event_type"), col("day"), explode(col("sk")).as("h"))
        .groupBy(col("event_type"))
        .agg(countDistinct(col("day")).as("n_days"),
          graft.functions.KMinValues(col("h"), K).as("sk"))
        .select(col("event_type"), col("n_days"),
          round(kmvCardinalityEstimate(col("sk"), K)).cast("long").as("distinct_users"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type,
        CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
      FROM events WHERE user_id IS NOT NULL
      GROUP BY event_type ORDER BY event_type"""))

  /** I9's core: COUNT-MIN SKETCH cells over a key column — the
    * fixed-memory frequency summary (Cormode & Muthukrishnan 2005) that
    * answers point-frequency queries with one-sided error (estimate >=
    * truth, over by at most N/width w.h.p. per depth). The sketch IS a
    * DataFrame aggregation: each occurrence lands in `depth` cells
    * (cell_i = md5-56(i:key) mod width), ONE (dep, cell) hash aggregate
    * counts them — map-side combinable, and MERGEABLE BY CONSTRUCTION
    * because CMS is linear: per-shard/per-day sketches sum cell-wise to
    * exactly the single-pass sketch (no pigeonhole argument even needed;
    * SketchingSpec pins it). Result is depth×width rows regardless of
    * input size — the artifact a 100 TB pipeline stores per partition.
    */
  def countMinCells(keys: org.apache.spark.sql.DataFrame, depth: Int,
      width: Int): org.apache.spark.sql.DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape: $depth x $width")
    import graft.functions.{HashFunctions => H}
    keys
      .select(col("k"), explode(array((0 until depth).map(lit): _*)).as("dep"))
      .select(col("dep"),
        pmod(H.md5Hash56(concat(col("dep").cast("string"), lit(":"), col("k"))),
          lit(width.toLong)).as("cell"))
      .groupBy(col("dep"), col("cell"))
      .agg(count(lit(1)).as("c"))
  }

  // I9 — CMS point queries vs exact truth: sketch the corpus token
  // stream (4 x 512 cells), then estimate the 20 most frequent tokens'
  // counts as min-over-depths and print them NEXT TO the exact counts —
  // the one-sided error (cms_est >= exact_n) is visible per row and the
  // whole thing is integer arithmetic, so the oracle is a full
  // rows+schema+hash check (DuckDB rebuilds the same sketch from the
  // same hashes). The probe join broadcasts the parameter-bounded cell
  // frame (<= depth*width rows); nothing corpus-sized crosses it.
  private val x9 = Relational.Q(
    "x9_countmin_freq",
    (s, d) => {
      import graft.functions.{HashFunctions => H}
      val depth = 4
      val width = 512
      val toks = Tables.spread(Tables.documents(s, d))
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("k"))
        .persist() // feeds BOTH the sketch build and the exact probe counts
      val cells = countMinCells(toks, depth, width)
      val probes = toks.groupBy(col("k")).agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("k")).limit(20)
      probes
        .select(col("k"), col("exact_n"),
          explode(array((0 until depth).map(lit): _*)).as("dep"))
        .withColumn("cell",
          pmod(H.md5Hash56(concat(col("dep").cast("string"), lit(":"), col("k"))),
            lit(width.toLong)))
        .join(broadcast(cells), Seq("dep", "cell"))
        .groupBy(col("k"), col("exact_n"))
        .agg(min(col("c")).as("cms_est"))
        .select(col("k").as("token"), col("exact_n"), col("cms_est"),
          (col("cms_est") - col("exact_n")).as("overcount"))
        .orderBy(col("token"))
    },
    Some {
      val h = graft.functions.HashFunctions.md5Hash56Sql("(dep || ':' || k)")
      s"""
      WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS k
        FROM documents),
      cells AS (
        SELECT dep, $h % 512 AS cell, COUNT(*) AS c
        FROM toks, UNNEST([0, 1, 2, 3]) AS u(dep) GROUP BY 1, 2),
      probes AS (
        SELECT k, COUNT(*) AS exact_n FROM toks GROUP BY k
        ORDER BY exact_n DESC, k LIMIT 20),
      pc AS (
        SELECT k, exact_n, dep, $h % 512 AS cell
        FROM probes, UNNEST([0, 1, 2, 3]) AS u(dep))
      SELECT pc.k AS token, pc.exact_n,
        CAST(MIN(cells.c) AS BIGINT) AS cms_est,
        CAST(MIN(cells.c) - pc.exact_n AS BIGINT) AS overcount
      FROM pc JOIN cells USING (dep, cell)
      GROUP BY pc.k, pc.exact_n
      ORDER BY token"""
    })

  // I9b — the SAME sketch as x9's relational cells, built by the ONE-pass
  // bounded imperative aggregate (functions.CountMinSketch, the H3/KMV
  // pattern): no xdepth row expansion, no (dep, cell) shuffle — the only
  // bytes leaving a partition are the constant depth*width-long partial
  // buffers, merged by linearity. The flattened array unrolls to (dep,
  // cell, c) rows for the oracle, which rebuilds the identical cells in
  // DuckDB from the same md5-56 hashes — agg == relational is also
  // spec-pinned frame-exact (SketchingSpec).
  private val x10 = Relational.Q(
    "x10_countmin_agg",
    (s, d) => {
      val depth = 4
      val width = 512
      Tables.spread(Tables.documents(s, d))
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("k"))
        .agg(graft.functions.CountMinSketch(col("k"), depth, width).as("sk"))
        .select(posexplode(col("sk")).as(Seq("i", "c")))
        .select(expr(s"CAST(i DIV $width AS BIGINT)").as("dep"),
          pmod(col("i"), lit(width)).cast("long").as("cell"), col("c"))
        .filter(col("c") > 0)
        .orderBy(col("dep"), col("cell"))
    },
    Some {
      val h = graft.functions.HashFunctions.md5Hash56Sql("(dep || ':' || k)")
      s"""
      WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS k
        FROM documents),
      cells AS (
        SELECT dep, $h % 512 AS cell, COUNT(*) AS c
        FROM toks, UNNEST([0, 1, 2, 3]) AS u(dep) GROUP BY 1, 2)
      SELECT CAST(dep AS BIGINT) AS dep, CAST(cell AS BIGINT) AS cell,
        CAST(c AS BIGINT) AS c
      FROM cells ORDER BY dep, cell"""
    })

  /** I10's core: BLOOM-FILTER decontamination prefilter over any
    * (doc_id, text) frame — d8 re-shaped for the regime where even the
    * benchmark's distinct-gram set is too big to broadcast raw (billions
    * of 8-grams): the bench side compresses to ONE mBits-bit bitmap
    * ([[graft.functions.BloomBits]], built in one pass, merged by OR),
    * and every corpus gram is tested with `kHashes` shift-and-mask
    * expressions against the broadcast bitmap — NO false negatives by
    * construction, so the expensive exact-verify join runs ONLY on the
    * bloom-candidate docs and provably loses nothing. False-positive
    * rate ~(1-e^(-kn/m))^k is sized by the BENCHMARK gram count n (tiny,
    * fixed), never the corpus.
    *
    * Grams are hashed with md5-56 (not d8's xxhash64) so the bitmap
    * positions (pos_i = md5-56("i:hash") mod mBits) are recomputable by
    * the DuckDB oracle from the same values — which makes the oracle
    * itself verify the no-false-negative theorem at corpus scale: it
    * computes the exact side over ALL docs while the operator computes
    * it over candidates only; any false negative would hash-mismatch.
    *
    * Scale shape: corpus side is one narrow projection per gram (k
    * codegen'd bit tests against a one-row broadcast) + one slim
    * per-doc count agg; only candidate docs (the contaminated few plus
    * an FPR-sized sliver) reach the exact join. The corpus gram
    * pipeline is DELIBERATELY recomputed for the exact-verify pass
    * (the d9/d15 no-persist library contract: paying the tokenize +
    * gram window twice beats pinning a corpus-sized frame in block
    * storage the caller never asked for); a multi-pass production
    * pipeline stages the gram frame to parquet once (the d2
    * written-artifact discipline) and feeds both passes from the scan.
    */
  def bloomDecontaminate(docs: org.apache.spark.sql.DataFrame,
      isBench: org.apache.spark.sql.Column, n: Int = 8,
      mBits: Int = 1 << 18, kHashes: Int = 8): org.apache.spark.sql.DataFrame = {
    import graft.functions.{HashFunctions => H}
    val base = docs.select(col("doc_id"), col("text"))
    val benchGrams = Dedup.wordGramHashesMd5(base.filter(isBench), n)
    val corpusGrams = Dedup.wordGramHashesMd5(base.filter(!isBench), n)
    // the artifact: ONE row of mBits/64 longs
    val bloom = benchGrams
      .agg(graft.functions.BloomBits(col("g"), mBits, kHashes).as("words"))
    val hit = (0 until kHashes).map { i =>
      val pos = pmod(H.md5Hash56(concat(lit(s"$i:"), col("g").cast("string"))),
        lit(mBits.toLong))
      // (words[pos >> 6] >> (pos & 63)) & 1 — arithmetic shift is fine:
      // only the lowest bit survives the mask
      call_function("shiftright",
        element_at(col("words"),
          call_function("shiftright", pos, lit(6)).cast("int") + 1),
        pmod(pos, lit(64L)).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
    val perDoc = corpusGrams
      .crossJoin(broadcast(bloom))
      .withColumn("bloom_hit", hit)
      .groupBy(col("doc_id"))
      .agg(sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom_grams"))
    val candidates = perDoc.filter(col("n_bloom_grams") > 0).select(col("doc_id"))
    // exact verify over CANDIDATES ONLY — the prefilter's whole point
    val exact = corpusGrams
      .join(candidates, Seq("doc_id"), "left_semi")
      .join(broadcast(benchGrams.select(col("g")).distinct()), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
    base.filter(!isBench).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bloom_grams"), lit(0L)).as("n_bloom_grams"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("bloom_candidate", col("n_bloom_grams") > 0)
      .withColumn("contaminated", col("n_shared_grams") > 0)
      .orderBy(col("doc_id"))
  }

  // I10 — bloom decontamination prefilter vs exact truth, on d8's
  // benchmark slice (doc_id % 20 == 0). Full rows+schema+hash oracle:
  // DuckDB rebuilds the identical bitmap positions from the same md5-56
  // hashes — and computes the exact side WITHOUT the prefilter, so the
  // hash compare proves the bloom dropped no contaminated doc.
  private val x11 = Relational.Q(
    "x11_bloom_decontaminate",
    (s, d) => bloomDecontaminate(Tables.documents(s, d),
      col("doc_id") % 20 === 0),
    Some {
      def h56(e: String) = graft.functions.HashFunctions.md5Hash56Sql(e)
      val posExpr = h56("(CAST(i AS VARCHAR) || ':' || CAST(h AS VARCHAR))")
      s"""
      WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
        FROM documents),
      g AS (
        SELECT doc_id,
          unnest(list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] ||
            ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7]
            FOR i IN range(1, len(tk) - 6)])) AS gram
        FROM toks WHERE len(tk) >= 8),
      gh AS (SELECT doc_id, ${h56("gram")} AS h FROM g),
      bench AS (SELECT DISTINCT h FROM gh WHERE doc_id % 20 = 0),
      bpos AS (
        SELECT DISTINCT $posExpr % 262144 AS pos
        FROM bench, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS u(i)),
      cand AS (SELECT doc_id, h FROM gh WHERE doc_id % 20 != 0),
      cpos AS (
        SELECT doc_id, h, $posExpr % 262144 AS pos
        FROM cand, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS u(i)),
      ghit AS (
        SELECT doc_id, h, COUNT(b.pos) = 8 AS bloom_hit
        FROM cpos LEFT JOIN bpos b USING (pos) GROUP BY doc_id, h),
      nb AS (SELECT doc_id, COUNT(*) FILTER (bloom_hit) AS n_bloom FROM ghit GROUP BY doc_id),
      ns AS (SELECT doc_id, COUNT(*) AS n_shared FROM cand JOIN bench USING (h) GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(nb.n_bloom, 0) AS BIGINT) AS n_bloom_grams,
        CAST(COALESCE(ns.n_shared, 0) AS BIGINT) AS n_shared_grams,
        COALESCE(nb.n_bloom, 0) > 0 AS bloom_candidate,
        COALESCE(ns.n_shared, 0) > 0 AS contaminated
      FROM documents d
      LEFT JOIN nb ON d.doc_id = nb.doc_id
      LEFT JOIN ns ON d.doc_id = ns.doc_id
      WHERE d.doc_id % 20 != 0 ORDER BY d.doc_id"""
    })

  /** I11 / x12's core: MERGEABLE fixed-bin histogram quantiles — the
    * exact-reproducible counterpart to x2's approx_percentile and x4's
    * DataSketches HLL: per-group counts over fixed integer value bins
    * (bin = cents div binCents, money decimal-exact first, so binning
    * never rides on a float), quantile q read off the cumulative bin
    * counts as the SMALLEST bin whose running count reaches
    * ceil(q% of n) — all integer comparisons (cum*100 >= n*q). The
    * estimate is the bin UPPER EDGE, so error is one-sided and bounded
    * by binCents BY CONSTRUCTION, and — unlike a randomized KLL/REQ
    * sketch — two runs, any shard split, and the DuckDB oracle all
    * produce bit-identical answers.
    *
    * Mergeability (the x4/x8 store-once pattern): a histogram is a
    * (group, bin, count) frame; shard histograms merge by bin-wise SUM
    * — spec-pinned bit-equal to the single pass. Scale: ONE map-side-
    * combinable (group, bin) aggregate over the corpus; the cumulative
    * window runs on the HISTOGRAM frame (bins <= value-range/binCents,
    * parameter-bounded, never data-proportional — the PlanAudit
    * enum-window adjudication), so no corpus row ever enters a window.
    */
  def histogramQuantiles(rows: org.apache.spark.sql.DataFrame, group: String,
      cents: org.apache.spark.sql.Column, binCents: Long,
      quantilePcts: Seq[Int]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binCents >= 1, s"binCents must be >= 1, got $binCents")
    require(quantilePcts.nonEmpty && quantilePcts.forall(q => q >= 1 && q <= 100),
      s"quantile percents must be in [1,100], got $quantilePcts")
    val hist = rows.select(col(group), cents.as("cents"))
      .withColumn("bin", expr(s"cents div $binCents"))
      .groupBy(col(group), col("bin"))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col(group)).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col(group))))
    val aggs = quantilePcts.map(q =>
      min(when(col("cum") * 100 >= col("n") * q, col("bin")))
        .as(s"b$q")) :+ max(col("n")).as("n_rows")
    cum.groupBy(col(group))
      .agg(aggs.head, aggs.tail: _*)
      .select((col(group) +: quantilePcts.map(q =>
          ((col(s"b$q") + 1) * binCents - 1).as(s"p${q}_up_cents")) :+ col("n_rows")): _*)
      .orderBy(col(group))
  }

  // I11 — histogram quantiles of line prices per return flag at a
  // 100-unit bin: the oracle replays the identical integer binning,
  // running counts, and threshold picks, so the sketch's determinism
  // claim is cross-engine, not just cross-run.
  private val x12 = Relational.Q(
    "x12_histogram_quantiles",
    (s, d) => histogramQuantiles(Tables.lineitem(s, d), "l_returnflag",
      (Num.dec(col("l_extendedprice")) * 100).cast("long"),
      binCents = 10000L, quantilePcts = Seq(50, 90, 99)),
    Some(s"""
      WITH b AS (
        SELECT l_returnflag,
          CAST(${Num.decSql("l_extendedprice")} * 100 AS BIGINT) // 10000 AS bin,
          COUNT(*) AS c
        FROM lineitem GROUP BY 1, 2),
      cw AS (
        SELECT l_returnflag, bin, c,
          SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          SUM(c) OVER (PARTITION BY l_returnflag) AS n
        FROM b)
      SELECT l_returnflag,
        CAST((MIN(CASE WHEN cum * 100 >= n * 50 THEN bin END) + 1) * 10000 - 1 AS BIGINT) AS p50_up_cents,
        CAST((MIN(CASE WHEN cum * 100 >= n * 90 THEN bin END) + 1) * 10000 - 1 AS BIGINT) AS p90_up_cents,
        CAST((MIN(CASE WHEN cum * 100 >= n * 99 THEN bin END) + 1) * 10000 - 1 AS BIGINT) AS p99_up_cents,
        CAST(MAX(n) AS BIGINT) AS n_rows
      FROM cw GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // I11 — Frequent Directions matrix sketch over the embedding table
  // (see [[FrequentDirections]]): the deterministic mergeable
  // covariance compression behind one-pass distributed PCA. PROMOTED to
  // a bounds oracle (r11 verdict item 2): the float SVD keeps the
  // sketch VALUES engine-specific, but the GLPW guarantee
  // 0 <= x'(A'A - B'B)x <= ||A||_F^2 / l is checkable — the gate
  // evaluates it on 8 deterministic unit probes (basis e_1..e_7 + the
  // ones/sqrt(d) direction; the A-side quadratic forms are one
  // map-side-combinable distributed aggregate, the B side is local over
  // <= l sketch rows) and DuckDB replays (n_vectors, dim) exactly and
  // pins within_bound TRUE. A shrink overshoot, a lost shard, or a
  // broken merge breaks the deficit band and flips the hash red. The
  // spec still pins the full spectral claims (PSD undershoot, bound,
  // exact low-rank recovery, shard-merge preservation); benchFn keeps
  // the production sketch-build spelling.
  private def x13Sketch(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val rows = FrequentDirections.sketch(Tables.embeddings(s, d), 16, 64)
    rows.zipWithIndex.map { case (r, i) =>
      (i.toLong, math.floor(math.sqrt(r.map(x => x * x).sum) * 10000.0 + 0.5) / 10000.0)
    }.toSeq.toDF("row_idx", "row_norm")
  }

  private val x13 = Relational.Q(
    "x13_frequent_directions",
    (s, d) => {
      import s.implicits._
      val l = 16
      val dim = 64
      val e = Tables.embeddings(s, d)
      val b = FrequentDirections.sketch(e, l, dim)
      // A-side quadratic forms in ONE wide aggregate: ||A||_F^2,
      // x'A'Ax for x = e_1..e_7, and for x = ones/sqrt(d)
      val aggCols =
        Seq(count(lit(1)).as("n"),
          sum(aggregate(col("embedding"), lit(0.0),
            (a, x) => a + x.cast("double") * x.cast("double"))).as("fro"),
          sum(pow(aggregate(col("embedding"), lit(0.0),
            (a, x) => a + x.cast("double")), 2.0) / lit(dim.toDouble)).as("ones")) ++
        (0 until 7).map(j =>
          sum(pow(element_at(col("embedding"), j + 1).cast("double"), 2.0)).as(s"c$j"))
      val row = e.agg(aggCols.head, aggCols.tail: _*).head()
      val nVectors = row.getLong(0)
      val froA = row.getDouble(1)
      val aSide = row.getDouble(2) +: (0 until 7).map(j => row.getDouble(3 + j))
      // B-side quadratic forms over the <= l local sketch rows
      val bOnes = b.map(r => math.pow(r.sum, 2) / dim).sum
      val bSide = bOnes +: (0 until 7).map(j => b.map(r => r(j) * r(j)).sum)
      val bound = froA / l
      val eps = 1e-6 * froA + 1e-9
      val within = aSide.zip(bSide).forall { case (xa, xb) =>
        val deficit = xa - xb
        deficit >= -eps && deficit <= bound + eps
      }
      Seq((nVectors, dim.toLong, l.toLong, aSide.size.toLong, within))
        .toDF("n_vectors", "dim", "sketch_rows", "n_probes", "within_bound")
    },
    Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
        CAST(MAX(len(embedding)) AS BIGINT) AS dim,
        CAST(16 AS BIGINT) AS sketch_rows,
        CAST(8 AS BIGINT) AS n_probes,
        TRUE AS within_bound
      FROM embeddings"""),
    benchFn = Some(x13Sketch _))

  // I12 — AMS F2 sketch (Alon, Matias & Szegedy 1996): estimate the
  // SECOND MOMENT F2 = sum_i f_i^2 of the token-frequency vector — the
  // self-join size, the quantity an optimizer wants before it picks a
  // join strategy — from M=9 counters, each a random +-1 projection
  // Z_j = sum_i s_j(i)*f_i with E[Z_j^2] = F2 and the estimate the
  // median of the Z_j^2. Like x9's CMS the sketch is LINEAR (shard
  // sketches ADD — the mergeability spec), and the signs are
  // md5-derived, so every Z_j is an exact integer both engines agree
  // on: FULL oracle even though the operator is an approximation.
  // Scale shape: one corpus pass builds the vocab frame (map-side
  // combinable); the xM sign expansion explodes the VOCAB, never the
  // corpus; Z sums are map-side combinable; state is M longs.
  private val x14 = Relational.Q(
    "x14_ams_f2",
    (s, d) => {
      import graft.functions.{HashFunctions => H}
      val M = 9
      val tf = Tables.documents(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      tf.select(col("tok"), col("f"),
          explode(sequence(lit(1), lit(M))).as("j"))
        .select(col("j").cast("long").as("j"),
          (when(pmod(H.md5Hash56(
              concat(lit("ams"), col("j").cast("string"), lit("|"), col("tok"))), lit(2L)) === 0,
            lit(1L)).otherwise(lit(-1L)) * col("f")).as("contrib"))
        .groupBy(col("j")).agg(sum(col("contrib")).as("z"))
        .select(col("j"), col("z"), (col("z") * col("z")).as("z2"))
        .orderBy(col("j"))
    },
    Some(s"""
      WITH tf AS (
        SELECT tok, COUNT(*) AS f FROM (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
          FROM documents)
        GROUP BY tok),
      e AS (
        SELECT u.j,
          CASE WHEN ${graft.functions.HashFunctions.md5Hash56Sql("'ams' || u.j || '|' || tok")} % 2 = 0
               THEN f ELSE -f END AS contrib
        FROM tf, LATERAL (SELECT unnest(range(1, 10)) AS j) u),
      zs AS (SELECT j, CAST(SUM(contrib) AS BIGINT) AS z FROM e GROUP BY j)
      SELECT j, z, z * z AS z2 FROM zs ORDER BY j"""))

  // I14 — own HYPERLOGLOG distinct as a ONE-PASS mergeable imperative
  // aggregate with an EXACT cross-engine oracle (functions.HllRegisters,
  // Flajolet et al. 2007; SQL-registered `hll_registers(key, p)`): the
  // 2^p max-rho register array IS the aggregation state, built from
  // md5-56 — so where x1 (built-in HLL++) and x4 (DataSketches) are
  // rows-only with error-bound specs, THIS operator's registers,
  // zero-register count, and integer Z all hash-check against a DuckDB
  // replay of the same arithmetic. The estimator stays exact-integer
  // until ONE IEEE division (z_int = sum 2^(48-rho) fits a long; the
  // alpha*m^2*2^48 constant is interpolated as the SAME literal into
  // both engines), so even the float estimate is bit-identical.
  // Linear-counting correction deliberately lives OUTSIDE the
  // oracle-checked frame (ln is engine-dependent in the last ulp) —
  // v_zero is emitted so callers can apply it.
  // Scale: one map-side-combinable agg, constant 2^p-long state per
  // group, merge = element-wise max (per-shard/per-day sketches roll up
  // without raw data — the x8 story for distinct counts).
  // Geometry: p=7 (m=128 registers) keeps every group in the RAW-
  // estimator regime (n >= 2.5m needs ~320 distinct; per-flag orderkeys
  // are 1.1k/11k/110k across SFs) — the regime where the published
  // 1.04/sqrt(m) analysis applies and no linear-counting ln is needed.
  private val x15 = Relational.Q(
    "x15_hll_distinct",
    (s, d) => {
      val P = 7
      val C = graft.functions.HllRegisters.alphaM(P) *
        (1L << P).toDouble * (1L << P).toDouble * math.pow(2.0, 57 - P)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.HllRegisters(col("l_orderkey").cast("string"), P).as("regs"))
        .select(col("l_returnflag"),
          expr("aggregate(regs, 0L, (acc, r) -> acc + IF(r = 0L, 1L, 0L))").as("v_zero"),
          expr(s"aggregate(regs, 0L, (acc, r) -> acc + shiftleft(1L, cast(${57 - P} - r AS int)))").as("z_int"))
        .select(col("l_returnflag"), col("v_zero"), col("z_int"),
          r4(lit(C) / col("z_int").cast("double")).as("est_distinct"))
        .orderBy(col("l_returnflag"))
    },
    Some {
      val P = 7
      val m = 1 << P
      val top = 57 - P
      val C = graft.functions.HllRegisters.alphaM(P) *
        m.toDouble * m.toDouble * math.pow(2.0, top)
      val h = graft.functions.HashFunctions.md5Hash56Sql("CAST(l_orderkey AS VARCHAR)")
      s"""
      WITH h AS (
        SELECT DISTINCT l_returnflag, $h AS h FROM lineitem),
      rr AS (
        SELECT l_returnflag, CAST(h % $m AS BIGINT) AS idx,
          MAX(CASE WHEN h // $m = 0 THEN $top
              ELSE $top - length(bin(h // $m)) END) AS rho
        FROM h GROUP BY 1, 2),
      grid AS (
        SELECT fl.l_returnflag, g.idx
        FROM (SELECT DISTINCT l_returnflag FROM lineitem) fl
        CROSS JOIN (SELECT unnest(range(0, $m)) AS idx) g),
      regs AS (
        SELECT grid.l_returnflag, COALESCE(rr.rho, 0) AS rho
        FROM grid LEFT JOIN rr
          ON grid.l_returnflag = rr.l_returnflag AND grid.idx = rr.idx),
      agg AS (
        SELECT l_returnflag,
          CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
          CAST(SUM(CAST(1 AS BIGINT) << CAST($top - rho AS INTEGER)) AS BIGINT) AS z_int
        FROM regs GROUP BY 1)
      SELECT l_returnflag, v_zero, z_int,
        ${r4Sql(s"$C / CAST(z_int AS DOUBLE)")} AS est_distinct
      FROM agg ORDER BY l_returnflag"""
    })

  // I15 — JOIN-SIZE ESTIMATION from CMS inner products (Cormode &
  // Muthukrishnan 2005 §4.2 — the question an optimizer asks BEFORE
  // picking a join strategy: how many rows will this key-equi join
  // emit?): sketch each side's join-key stream into the x9 cell frames,
  // estimate |A ⋈ B| per depth as the cell-wise inner product
  // sum_c a_d[c]·b_d[c], take min over depths. The estimate is
  // ONE-SIDED (>= truth: every true key pair lands in a shared cell;
  // collisions only add) — spec'd universally — and both sketches stay
  // depth×width-bounded artifacts a planner can keep per table/partition
  // and combine WITHOUT touching data (cells add by linearity, so the
  // per-day sketches x9 stores answer tomorrow's join-size question
  // too). The fixture asks the funnel-planning question on real data:
  // how big is the click ⋈ purchase user join? The exact inner product
  // is computed alongside ONLY as the oracle-checked comparison column
  // (the x9 probes convention) — at 100 TB the exact answer is
  // precisely what the sketch exists to avoid. All integers; FULL
  // oracle.
  private val x16 = Relational.Q(
    "x16_join_size",
    (s, d) => {
      val depth = 4
      val width = 512
      val ev = Tables.events(s, d).persist()
      def side(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id").cast("string").as("k"))
      val a = countMinCells(side("click"), depth, width)
      val b = countMinCells(side("purchase"), depth, width)
        .withColumnRenamed("c", "cb")
      val ips = a.join(b, Seq("dep", "cell"))
        .groupBy(col("dep"))
        .agg(sum(col("c") * col("cb")).as("ip"))
      val exact = side("click").groupBy(col("k")).agg(count(lit(1)).as("ca"))
        .join(side("purchase").groupBy(col("k")).agg(count(lit(1)).as("cb2")), Seq("k"))
        .agg(coalesce(sum(col("ca") * col("cb2")), lit(0L)).as("exact_n"))
      s.range(depth).select(col("id").cast("int").as("dep"))
        .join(ips, Seq("dep"), "left")
        .select(col("dep").cast("long").as("dep"), coalesce(col("ip"), lit(0L)).as("ip"))
        .crossJoin(broadcast(exact))
        .select(col("dep"), col("ip"), col("exact_n"),
          (col("ip") - col("exact_n")).as("overcount"))
        .orderBy(col("dep"))
    },
    Some {
      val h = graft.functions.HashFunctions.md5Hash56Sql("(dep || ':' || k)")
      s"""
      WITH ca AS (
        SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE event_type = 'click'),
      cb AS (
        SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE event_type = 'purchase'),
      cellsa AS (
        SELECT dep, $h % 512 AS cell, COUNT(*) AS c
        FROM ca, UNNEST([0, 1, 2, 3]) AS u(dep) GROUP BY 1, 2),
      cellsb AS (
        SELECT dep, $h % 512 AS cell, COUNT(*) AS c
        FROM cb, UNNEST([0, 1, 2, 3]) AS u(dep) GROUP BY 1, 2),
      ips AS (
        SELECT a.dep, CAST(SUM(a.c * b.c) AS BIGINT) AS ip
        FROM cellsa a JOIN cellsb b USING (dep, cell) GROUP BY 1),
      exact AS (
        SELECT COALESCE(CAST(SUM(x.n * y.n) AS BIGINT), 0) AS exact_n FROM
          (SELECT k, COUNT(*) AS n FROM ca GROUP BY 1) x
          JOIN (SELECT k, COUNT(*) AS n FROM cb GROUP BY 1) y USING (k)),
      deps AS (SELECT unnest(range(0, 4)) AS dep)
      SELECT CAST(deps.dep AS BIGINT) AS dep,
        COALESCE(ips.ip, 0) AS ip, exact.exact_n,
        COALESCE(ips.ip, 0) - exact.exact_n AS overcount
      FROM deps LEFT JOIN ips ON deps.dep = ips.dep CROSS JOIN exact
      ORDER BY dep"""
    })

  /** I16 core — MISRA-GRIES frequent items over the corpus token stream
    * (functions.MisraGries — Misra & Gries 1982; ACHPWY 2012 merge): the
    * BOUNDED-memory one-pass answer to "what are the heavy tokens" when
    * even the vocabulary is too big to aggregate exactly (URLs, n-grams,
    * user ids at 100 TB — x3's exact groupBy pays a vocabulary-size
    * shuffle; this pays k pairs per partition). Emits each tracked key
    * with its UNDERcount estimate alongside the exact count and the
    * guarantee radius n/(k+1), so the defining inequalities
    *
    *   est <= exact  and  exact - est <= n/(k+1)
    *
    * are visible as data — and every token with exact > n/(k+1) is
    * provably in the output. The exact join is the fixture's witness
    * (affordable at test vocab); production reads just the sketch.
    * Counts are merge-order dependent (the published contract is the
    * bound, not a unique value), so rows-only + bound specs — the
    * x1/x4 class.
    */
  def misraGriesTopK(docs: org.apache.spark.sql.DataFrame, k: Int = 8)
      : org.apache.spark.sql.DataFrame = {
    val words = docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
    val sketch = words.agg(
        graft.functions.MisraGries(col("w"), k).as("mg"),
        count(lit(1)).as("n_total"))
      .select(explode(col("mg")).as("e"), col("n_total"))
      .select(col("e.key").as("word"), col("e.est").as("est"), col("n_total"))
    val exact = words.groupBy(col("w")).agg(count(lit(1)).as("exact_cnt"))
    sketch.join(exact, col("word") === col("w"))
      .select(col("word"), col("est"), col("exact_cnt"),
        (col("n_total") / lit(k + 1)).cast("long").as("max_deficit"))
      .orderBy(col("est").desc, col("word"))
  }

  /** x17's driver frame — FULL oracle via the GUARANTEED-TRACKED subset
    * (the x1 bounds-oracle scheme adapted to a set-valued sketch): the
    * sketch's tracked KEY SET is merge-order dependent, but every key
    * with exact > n/(k+1) is PROVABLY tracked (the Misra-Gries
    * frequent-items theorem), so the frame rows are exactly that
    * deterministic set — (word, exact_cnt, max_deficit) all exact
    * integers DuckDB replays — plus within_bounds, true iff the key IS
    * tracked and its estimate obeys est <= exact <= est + n/(k+1). A
    * sketch bug (dropped heavy hitter, broken bound) flips the boolean;
    * the oracle pins TRUE. Production reads just the sketch; the exact
    * side is the gate's witness (the x1 contract). k = 40 sits the
    * corpus in the REAL lossy regime (vocab >> k, so subtractions
    * happen) while keeping the guaranteed set non-empty: the top
    * fixture tokens hold ~3.5% share, so the n/41 (~2.4%) threshold
    * admits ~30 provably-tracked rows at every SF (k = 8's n/9 admits
    * none — an empty frame would gate nothing).
    */
  def misraGriesVerified(docs: org.apache.spark.sql.DataFrame, k: Int = 40)
      : org.apache.spark.sql.DataFrame = {
    val words = docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
    val sketch = words.agg(graft.functions.MisraGries(col("w"), k).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.key").as("w"), col("e.est").as("est"))
    val nTot = words.agg(count(lit(1)).as("n_total"))
    words.groupBy(col("w")).agg(count(lit(1)).as("exact_cnt"))
      .crossJoin(broadcast(nTot))
      .filter(col("exact_cnt") > expr(s"n_total div ${k + 1}"))
      .join(sketch, Seq("w"), "left")
      .select(col("w").as("word"), col("exact_cnt"),
        expr(s"n_total div ${k + 1}").as("max_deficit"),
        (col("est").isNotNull && col("est") <= col("exact_cnt") &&
          col("exact_cnt") - col("est") <= expr(s"n_total div ${k + 1}"))
          .as("within_bounds"))
      .orderBy(col("exact_cnt").desc, col("word"))
  }

  // I16 — FULL oracle since round 10 (misraGriesVerified's
  // guaranteed-tracked frame); misraGriesTopK stays the production
  // read (all tracked keys) with merge-order-dependent estimates
  // covered by the spec's deficit bound, superset guarantee, and exact
  // recovery below capacity.
  private val x17 = Relational.Q(
    "x17_misra_gries",
    (s, d) => misraGriesVerified(Tables.documents(s, d)),
    Some("""
      WITH w AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
      tot AS (SELECT COUNT(*) AS n_total FROM w),
      e AS (SELECT w, COUNT(*) AS exact_cnt FROM w GROUP BY 1)
      SELECT e.w AS word, e.exact_cnt,
        CAST(t.n_total // 41 AS BIGINT) AS max_deficit,
        TRUE AS within_bounds
      FROM e CROSS JOIN tot t
      WHERE e.exact_cnt > t.n_total // 41
      ORDER BY exact_cnt DESC, word"""))

  // I18 — MERGEABLE quantiles (round 11): the x4 mergeable-HLL story
  // applied to rank queries, which neither x2 (GK state is engine-
  // internal and not unionable from SQL) nor x12 (fixed bins assume the
  // value range up front) provides: build one small MRL sketch per
  // partition/day ONCE, store it, answer any-grain quantile questions
  // later by UNIONING sketches instead of rescanning raw data. Here:
  // per-priority o_totalprice sketches → one union → global median/p90,
  // gated by the x1 bounds-oracle scheme (k=1024 → rank error <= L/k
  // ~ 0.8% under ANY merge order — the deterministic MRL bound is what
  // makes a shuffle-order-dependent estimate safe to gate); the oracle
  // replays the exact percentiles and pins within_tol TRUE. Production
  // at 100 TB stores the per-partition sketches and never runs the
  // exact leg — the benched entry (benchFn) is the sketch path alone.
  private val x18 = Relational.Q(
    "x18_mergeable_quantiles",
    (s, d) => {
      import graft.functions.{MrlQuantile, MrlSketchAgg, MrlUnionAgg}
      val partials = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(MrlSketchAgg(col("o_totalprice"), 1024).as("sk"),
          count(lit(1)).as("n_orders"))
      val exact = Tables.orders(s, d)
        .agg(expr("percentile(o_totalprice, 0.5)").as("em"),
          expr("percentile(o_totalprice, 0.90)").as("ep"))
      val sk = partials
        .agg(MrlUnionAgg(col("sk")).as("u"),
          count(lit(1)).as("n_partial_sketches"),
          sum(col("n_orders")).as("n_orders"))
        .select(MrlQuantile(col("u"), 0.5).as("am"),
          MrlQuantile(col("u"), 0.90).as("ap"),
          col("n_partial_sketches"), col("n_orders"))
      // gate on RANK error — the quantity MRL actually bounds (<= L·n/k
      // ranks under ANY merge order, the spec's formula verbatim). The
      // r11 advice: the old 5% relative VALUE tolerance only followed
      // from the rank bound on near-uniform data, so a concentrated
      // fixture distribution could flake the gate without any sketch
      // regression. Rank of the estimate = count(values <= estimate),
      // one extra map-side-combinable pass over orders (verify-only;
      // benchFn stays the sketch path alone).
      val nD = col("n_orders").cast("double")
      val levels = greatest(lit(1L), ceil(log(2.0, nD / lit(1024.0))) + lit(1L))
      val rankBound = floor(levels.cast("double") * nD / lit(1024.0)) + lit(1L)
      val gate = Tables.orders(s, d).crossJoin(broadcast(sk))
        .groupBy(col("n_partial_sketches"), col("n_orders"), col("am"), col("ap"))
        .agg(sum(when(col("o_totalprice") <= col("am"), 1L).otherwise(0L)).as("rank_m"),
          sum(when(col("o_totalprice") <= col("ap"), 1L).otherwise(0L)).as("rank_p"))
      gate.crossJoin(broadcast(exact))
        .select(col("n_partial_sketches"), col("n_orders"),
          r2(col("em")).as("median"), r2(col("ep")).as("p90"),
          (abs(col("rank_m") - ceil(nD * lit(0.5))) <= rankBound &&
            abs(col("rank_p") - ceil(nD * lit(0.9))) <= rankBound).as("within_tol"))
    },
    Some(s"""
      SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_partial_sketches,
        COUNT(*) AS n_orders,
        ${r2Sql("quantile_cont(o_totalprice, 0.5)")} AS median,
        ${r2Sql("quantile_cont(o_totalprice, 0.90)")} AS p90,
        TRUE AS within_tol
      FROM orders"""),
    benchFn = Some((s, d) => {
      import graft.functions.{MrlQuantile, MrlSketchAgg, MrlUnionAgg}
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(MrlSketchAgg(col("o_totalprice"), 1024).as("sk"),
          count(lit(1)).as("n_orders"))
        .agg(MrlUnionAgg(col("sk")).as("u"),
          count(lit(1)).as("n_partial_sketches"),
          sum(col("n_orders")).as("n_orders"))
        .select(col("n_partial_sketches"), col("n_orders"),
          MrlQuantile(col("u"), 0.5).as("est_median"),
          MrlQuantile(col("u"), 0.90).as("est_p90"))
    }))

  val all: Seq[Relational.Q] = Seq(x1, x2, x3, x4, x5, x6, x7, x8, x9, x10, x11, x12,
    x13, x14, x15, x16, x17, x18)
}
