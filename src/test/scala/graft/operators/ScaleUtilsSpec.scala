package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class ScaleUtilsSpec extends SparkSpec {

  test("bucketed tables join without an exchange") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '/tmp/graft-warehouse'")
    // managed-table locations outlive the session's in-memory catalog;
    // clear both so reruns don't trip LOCATION_ALREADY_EXISTS
    spark.sql("DROP TABLE IF EXISTS graft_bkt.orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_bkt.lineitem_b")
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    Seq("orders_b", "lineitem_b")
      .foreach(t => rmrf(new java.io.File(s"/tmp/graft-warehouse/$t")))
    ScaleUtils.writeBucketed(
      Tables.orders(spark, sfDir), "graft_bkt.orders_b", Seq("o_orderkey"), 4)
    ScaleUtils.writeBucketed(
      Tables.lineitem(spark, sfDir), "graft_bkt.lineitem_b", Seq("l_orderkey"), 4)
    val joined = spark.table("graft_bkt.lineitem_b")
      .join(spark.table("graft_bkt.orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // bucketed join: sort-merge with NO shuffle exchange on the join keys
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"join shuffled despite bucketing:\n${plan.take(800)}")
    // same answer as the unbucketed join
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(joined.orderBy("o_orderpriority").collect().toSeq == expected)
  }

  test("salted equi-join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").cast("decimal(18,2)").as("q"))
      .orderBy("o_orderpriority").collect().toSeq
    val salted = ScaleUtils.saltedEquiJoin(li, o, Seq("l_orderkey"), salts = 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").cast("decimal(18,2)").as("q"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(salted == plain)
  }

  test("salted equi-join rejects right-preserving outer join types") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey")
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey").as("l_orderkey"))
    intercept[IllegalArgumentException] {
      ScaleUtils.saltedEquiJoin(li, o, Seq("l_orderkey"), salts = 4, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      ScaleUtils.saltedEquiJoin(li, o, Seq("l_orderkey"), salts = 4, joinType = "full")
    }
    // left-preserving types stay allowed
    assert(ScaleUtils.saltedEquiJoin(li, o, Seq("l_orderkey"), salts = 4,
      joinType = "left_semi").columns.sameElements(Array("l_orderkey")))
  }

  test("runtime bloom filter prunes the fact side of a shuffled join with a selective dim filter") {
    // The 100 TB lever: a selective predicate on the build side is turned
    // into a bloom filter applied to the probe-side SCAN, so most fact
    // rows die before the exchange. Local test files sit under every
    // default threshold, so pin them to force what a real fact table
    // would trigger on its own; broadcast is disabled because runtime
    // filters only apply to shuffled joins (a broadcast join already
    // prunes at the probe).
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      val dim = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").cast("decimal(18,2)").as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n${optimized.take(1200)}")
      // and the filtered plan still returns the exact answer
      val expected = fact.join(dim.hint("broadcast"), col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").cast("decimal(18,2)").as("q"))
      assert(joined.collect().toSeq == expected.collect().toSeq)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("partitioned layout (G24): static directory pruning and DYNAMIC partition pruning both fire") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    ScaleUtils.writePartitioned(events, dir, Seq("event_type"))
    val table = spark.read.parquet(dir)
    // the layout preserves the data (partition column round-trips)
    assert(table.count() == events.count())
    // STATIC pruning: the literal filter lands in PartitionFilters, and
    // the scan touches strictly fewer files than the full table
    val one = table.filter(col("event_type") === "click")
    val onePlan = one.queryExecution.executedPlan.toString
    assert(onePlan.contains("PartitionFilters") && onePlan.contains("event_type"),
      s"partition filter not pushed to the scan:\n${onePlan.take(800)}")
    val filesOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select(input_file_name()).distinct().count()
    assert(filesOf(one) < filesOf(table),
      "filtered scan reads as many files as the full scan — no directory pruning")
    // DYNAMIC pruning: a fact ⋈ dim join keyed on the partition column
    // with a selective dim filter plants a runtime subquery into the
    // fact scan — no literal filter anywhere on the fact side. Local
    // test files sit under DPP's cost heuristic (useStats estimates
    // ~zero benefit on KB-sized tables), so pin the heuristic to the
    // ratio fallback — the bloom-test convention: force on tiny data
    // what a real fact table triggers on its own.
    val confs = Map(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "1000")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // the dim must be a TABLE, not a local relation: Catalyst constant-
      // folds a filter over a LocalRelation into a pre-filtered literal,
      // and DPP requires a live selective Filter on the filtering side
      val dimDir = java.nio.file.Files.createTempDirectory("graft-part-dim").toString
      Seq(("click", 1L), ("view", 2L), ("purchase", 3L), ("share", 4L))
        .toDF("event_type", "type_code")
        .write.mode("overwrite").parquet(dimDir)
      val dim = spark.read.parquet(dimDir)
      val dpp = spark.read.parquet(dir)
        .join(dim.filter(col("type_code") === 1L), Seq("event_type"))
        .agg(count(lit(1)).as("n"))
      val dppPlan = dpp.queryExecution.executedPlan.toString
      assert(dppPlan.contains("dynamicpruning"),
        s"dynamic partition pruning did not fire:\n${dppPlan.take(1200)}")
      // and the pruned plan returns the exact answer
      val expected = events.filter(col("event_type") === "click").count()
      assert(dpp.head().getLong(0) == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("z-ordered layout (G18): per-file footer rectangles are compact in BOTH columns") {
    import spark.implicits._
    // a full 64x64 grid: the worst case for single-column clustering
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y)).toDF("x", "y")
    val zdir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val xdir = java.nio.file.Files.createTempDirectory("graft-xsort").toString
    ScaleUtils.writeZOrdered(grid, zdir, "x", "y", files = 16, bits = 6)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xdir)
    def fileStats(dir: String): Seq[(Int, Int, Int, Int, Long, Long)] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y")),
              countDistinct(floor(col("x") / 16)), countDistinct(floor(col("y") / 16)))
            .head()
          (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5))
        }
    val zStats = fileStats(zdir)
    val xStats = fileStats(xdir)
    assert(zStats.size == 16 && xStats.size == 16)
    // The alignment-ROBUST invariant: tiles are aligned 256-z blocks
    // (16x16 squares), and a contiguous z range of ~256 values
    // intersects at most 3 aligned blocks wherever the sampled range
    // splits land — so each file touches <= 3 of the 4 bands in EACH
    // axis. (A raw min-max span bound would be wrong: consecutive
    // Morton tiles across the midpoint are spatially far apart, so the
    // straddling file can legitimately span all of x.)
    zStats.foreach { case (x0, x1, y0, y1, xBands, yBands) =>
      assert(xBands <= 3 && yBands <= 3,
        s"z file x[$x0,$x1] y[$y0,$y1] touches $xBands x-bands / $yBands y-bands")
    }
    // the x-sorted baseline is perfect on x but prunes NOTHING on y
    assert(xStats.forall { case (_, _, y0, y1, _, yBands) => y1 - y0 == 63 && yBands == 4 })
    // planning-time pruning argument, concretely: a point predicate on y
    // matches few z files but every x-sorted file. Bound 8: the 4 tiles
    // of y-band 2 live in <= 4 ranges plus <= 4 straddling neighbours.
    val yProbe = 37
    val zHits = zStats.count { case (_, _, y0, y1, _, _) => y0 <= yProbe && yProbe <= y1 }
    val xHits = xStats.count { case (_, _, y0, y1, _, _) => y0 <= yProbe && yProbe <= y1 }
    assert(zHits <= 8, s"y=$yProbe should touch few z-ordered files, got $zHits/16")
    assert(xHits == 16, "every x-sorted file contains every y")
    // and the layout is lossless
    assert(spark.read.parquet(zdir).count() == 4096)
  }

  test("stats manifest (G22): range reads skip files, lose nothing, and compose with pushdown") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    // 4096 rows range-partitioned into 16 files sorted by key: each
    // file owns a contiguous ~256-key slice
    val rows = (0 until 4096).map(i => (i.toLong, s"payload-$i")).toDF("key", "payload")
    rows.repartitionByRange(16, col("key")).sortWithinPartitions(col("key"))
      .write.mode("overwrite").parquet(dir)
    val manifest = ScaleUtils.buildStatsManifest(spark.read.parquet(dir), "key")
    assert(manifest.count() == 16, "one manifest row per file")
    assert(manifest.agg(sum(col("n_rows"))).head().getLong(0) == 4096L)
    // a narrow range touches few files and returns exactly the filter answer
    val (files, frame) = ScaleUtils.readSkipping(spark, manifest, "key", 1000L, 1100L)
    assert(files.size <= 3, s"101-key range should touch <= 3 of 16 files, got ${files.size}")
    val got = frame.select("key").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (1000L to 1100L).toSeq, "skipping must lose nothing")
    // boundary keys are INCLUSIVE on both ends
    val (_, edge) = ScaleUtils.readSkipping(spark, manifest, "key", 4095L, 4095L)
    assert(edge.count() == 1L)
    // a disjoint range opens zero files — and the empty frame carries
    // the REAL table schema (the r9 ADVICE fix: a zero-column
    // emptyDataFrame broke any caller selecting statCol or unioning
    // with a non-empty read)
    val (none, empty) = ScaleUtils.readSkipping(spark, manifest, "key", 10000L, 20000L)
    assert(none.isEmpty && empty.count() == 0L)
    assert(empty.schema == frame.schema,
      s"empty-range schema ${empty.schema} != read schema ${frame.schema}")
    assert(empty.select(col("key")).unionByName(frame.select(col("key"))).count() == 101L,
      "empty-range frame must union with a real read")
  }
}
