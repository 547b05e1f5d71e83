package graft.sources

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}
import graft.streaming.{NibblerSink, Trigger}

/** Sources/sinks coverage (SURVEY.md §2 G1–G6) + the §5 pushdown claims. */
class SourcesSpec extends SparkSpec {

  test("bounded parquet streaming source respects maxFilesPerTrigger") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bounded").toString
    val docs = Tables.documents(spark, sfDir)
    docs.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = graft.streaming.SourcePresets.parquetDir(spark, dir, docs.schema, maxFilesPerTrigger = 1)
    val batchSizes = new ConcurrentLinkedQueue[Long]()
    val q = NibblerSink.start[org.apache.spark.sql.Row](
      stream.asInstanceOf[org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]],
      NibblerSink.Config(
        processor = (_, ds) => { batchSizes.add(ds.count()); () },
        size = Long.MaxValue, tickerDuration = 200.millis))
    try {
      q.processAllAvailable()
      // 4 files, 1 per trigger -> at least 4 micro-batches, none the full table
      assert(batchSizes.size >= 4, s"batches=$batchSizes")
      assert(batchSizes.asScala.forall(_ < docs.count()))
      assert(batchSizes.asScala.sum == docs.count())
    } finally q.stop()
  }

  test("csv round-trip preserves rows and schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val orders = Tables.orders(spark, sfDir)
    orders.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(orders.schema).csv(dir)
    assert(back.count() == orders.count())
    assert(back.schema == orders.schema)
    val a = orders.agg(sum("o_totalprice").cast("decimal(18,2)")).head.getDecimal(0)
    val b = back.agg(sum("o_totalprice").cast("decimal(18,2)")).head.getDecimal(0)
    assert(a == b)
  }

  test("json round-trip preserves rows") {
    val dir = Files.createTempDirectory("graft-json").toString
    val nation = Tables.nation(spark, sfDir)
    nation.write.mode("overwrite").json(dir)
    val back = spark.read.schema(nation.schema).json(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("binaryFile source ingests opaque payloads with path/length metadata") {
    // the multimodal ingest path (SURVEY F1): image/audio files land as
    // one row per file — (path, modificationTime, length, content) —
    // with glob pushdown selecting the modality, no decode on the scan
    val dir = Files.createTempDirectory("graft-bin")
    val payloads = Map("a.img" -> Array[Byte](1, 2, 3, 4),
      "b.img" -> Array[Byte](5, 6), "skip.txt" -> Array[Byte](9))
    payloads.foreach { case (n, bytes) => Files.write(dir.resolve(n), bytes) }
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img") // modality filter applied at listing, not after read
      .load(dir.toString)
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        col("length"), col("content"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Array[Byte]]("content")))
    assert(rows.map(_._1).toSet == Set("a.img", "b.img"), "glob filter leaked non-modality files")
    rows.foreach { case (name, len, content) =>
      assert(content.sameElements(payloads(name)), s"$name bytes differ")
      assert(len == payloads(name).length)
    }
  }

  test("parquet schema evolution: mergeSchema unions old and new columns, old rows null-extend") {
    // the long-lived-dataset shape: a column added mid-stream must not
    // strand files written before it
    val dir = Files.createTempDirectory("graft-evolve").toString
    val v1 = Tables.nation(spark, sfDir).select(col("n_nationkey"), col("n_name"))
    v1.write.mode("overwrite").parquet(s"$dir/p=1")
    val v2 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"),
        col("n_regionkey").as("added_later"))
    v2.write.mode("overwrite").parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.contains("added_later"))
    assert(merged.count() == v1.count() + v2.count())
    // old files' rows surface with the new column null, not dropped/errored
    assert(merged.filter(col("p") === 1 && col("added_later").isNull).count() == v1.count())
    assert(merged.filter(col("p") === 2 && col("added_later").isNotNull).count() == v2.count())
  }

  test("orc round-trip preserves rows and pushes filters") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val orders = Tables.orders(spark, sfDir)
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      orders.orderBy("o_orderkey").collect().toSeq)
    // ORC scans push predicates just like parquet
    val plan = back.filter(col("o_orderstatus") === "F")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(500))
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.orders(spark, sfDir).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    assert(pruned.count() ==
      Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F").count())
  }

  test("selective scan pushes filters and prunes columns (q04)") {
    val df = SparkEntry.queries("q04_forecast_revenue")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), "no pushdown section in scan")
    assert(plan.contains("IsNotNull(l_discount)") || plan.contains("l_discount"),
      "discount filter not pushed")
    // column pruning: untouched wide columns must not be read
    val scanSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanSchema.contains("l_returnflag"), s"no pruning: $scanSchema")
  }

  test("aggregate query reads only the grouped/aggregated columns (q01)") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scanSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanSchema.contains("l_orderkey"), s"no pruning: $scanSchema")
    assert(scanSchema.contains("l_quantity"))
  }

  test("rate source drives NibblerSink with ticker semantics") {
    val seen = new ConcurrentLinkedQueue[(Trigger, Long)]()
    val rate = graft.streaming.SourcePresets.rate(spark, 50)
    import spark.implicits._
    val q = NibblerSink.start[Long](rate.select(col("value").as[Long]),
      NibblerSink.Config[Long](
        processor = (t, ds) => { seen.add((t, ds.count())); () },
        size = 10000, // never "full" at 50 rows/sec
        tickerDuration = 300.millis))
    try {
      val deadline = System.nanoTime() + 20.seconds.toNanos
      while (seen.size < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.size >= 2, "rate source produced no ticker batches")
      assert(seen.asScala.forall(_._1 == Trigger.Ticker))
    } finally q.stop()
  }

  test("write-audit-publish (G16): dirty snapshots quarantine, clean ones version atomically") {
    import spark.implicits._
    import graft.operators.Publish
    val root = Files.createTempDirectory("graft-wap").toString
    val audit = Publish.columnAudit(
      "doc_id_not_null" -> col("doc_id").isNull,
      "text_not_empty" -> (col("text").isNull || length(col("text")) === 0))
    // v0: nothing published yet — the read path must say so loudly
    assert(Publish.currentVersion(spark, root).isEmpty)
    intercept[Exception] { Publish.readPublished(spark, root) }

    // dirty snapshot: planted null doc_id + empty text -> quarantined
    val dirty = Seq((Option(1L), "ok"), (Option.empty[Long], "ok"), (Option(3L), ""))
      .toDF("doc_id", "text")
    val r1 = Publish.writeAuditPublish(dirty, root, audit, token = "attempt-1")
    assert(!r1.published && r1.version.isEmpty)
    assert(r1.violations.toSet == Set("doc_id_not_null" -> 1L, "text_not_empty" -> 1L))
    assert(Publish.currentVersion(spark, root).isEmpty,
      "a failed audit must not move the pointer")

    // clean retry REUSING the failed attempt's token publishes v=1 —
    // the token names the attempt, so its stale staging is replaced,
    // never an errorifexists wedge (the crashed-compaction retry path)
    val clean = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val r2 = Publish.writeAuditPublish(clean, root, audit, token = "attempt-1")
    assert(r2.published && r2.version == Some(1L), s"got $r2")
    assert(Publish.currentVersion(spark, root) == Some(1L))
    assert(Publish.readPublished(spark, root).count() == 2)

    // second release bumps to v=2 and repoints; v=1 stays readable
    // (immutable version dirs = time travel for readers holding the
    // old pointer)
    val next = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val r3 = Publish.writeAuditPublish(next, root, audit, token = "attempt-3")
    assert(r3.published && r3.version == Some(2L))
    assert(Publish.readPublished(spark, root).count() == 3)
    assert(spark.read.parquet(s"$root/v=1").count() == 2,
      "published versions are immutable — the old snapshot must survive")

    // ...and a dirty release AFTER a good one leaves the good one current
    val r4 = Publish.writeAuditPublish(dirty, root, audit, token = "attempt-4")
    assert(!r4.published)
    assert(Publish.currentVersion(spark, root) == Some(2L))
    assert(Publish.readPublished(spark, root).count() == 3)

    // orphan version dir (a crash between the rename and the pointer
    // swap): the next publish must allocate PAST it, never rename onto it
    new java.io.File(s"$root/v=3").mkdirs()
    val r5 = Publish.writeAuditPublish(next, root, audit, token = "attempt-5")
    assert(r5.published && r5.version == Some(4L),
      s"publish must skip the orphan v=3, got $r5")
    assert(Publish.readPublished(spark, root).count() == 3)

    // expectedBase: a publish staged against a superseded head aborts
    // loudly instead of silently reverting the newer release
    val stale = intercept[IllegalArgumentException] {
      Publish.writeAuditPublish(clean, root, audit, token = "attempt-6",
        expectedBase = Some(2L))
    }
    assert(stale.getMessage.contains("table moved"), stale.getMessage)
    assert(Publish.currentVersion(spark, root) == Some(4L))
  }

  test("two-phase WAP (G16, r12): a multi-table family audits EVERYTHING before ANY pointer moves") {
    import spark.implicits._
    import graft.operators.Publish
    val root = Files.createTempDirectory("graft-wap2").toString
    val ok = Publish.columnAudit("id_not_null" -> col("id").isNull)
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((Option.empty[Long], "bad")).toDF("id", "v")
    // stage both members; table B's audit fails -> NOTHING may publish
    val sa = Publish.stageAudit(a, s"$root/ta", ok, "fam-1")
    val sb = Publish.stageAudit(b, s"$root/tb", ok, "fam-1")
    assert(sa.isRight, "clean member must stage")
    sb match {
      case Left(q) =>
        assert(!q.published && q.violations == Seq("id_not_null" -> 1L))
      case Right(_) => fail("dirty member must quarantine at stage time")
    }
    // the torn-window contract: the clean member is staged but NOT
    // visible — both tables still have no published version
    assert(Publish.currentVersion(spark, s"$root/ta").isEmpty,
      "stageAudit must not move any pointer")
    assert(Publish.currentVersion(spark, s"$root/tb").isEmpty)
    // a clean family publishes each staged member via phase 2
    val sb2 = Publish.stageAudit(a, s"$root/tb", ok, "fam-2")
    val ra = Publish.publishStaged(spark, sa.toOption.get)
    val rb = Publish.publishStaged(spark, sb2.toOption.get)
    assert(ra.published && ra.version.contains(1L))
    assert(rb.published && rb.version.contains(1L))
    assert(Publish.readPublished(spark, s"$root/ta").count() == 2)
    // phase 2 without phase 1 refuses loudly
    val noStage = intercept[IllegalArgumentException] {
      Publish.publishStaged(spark,
        Publish.StagedSnapshot(s"$root/ta", "never-staged", None))
    }
    assert(noStage.getMessage.contains("nothing staged"), noStage.getMessage)
    // writeAuditPublish == stageAudit andThen publishStaged (the
    // single-table spelling is the two-phase one composed)
    val r = Publish.writeAuditPublish(a, s"$root/ta", ok, "fam-3")
    assert(r.published && r.version.contains(2L))
  }

  test("compaction (G17): small files fold into the next version; readers and history survive") {
    import spark.implicits._
    import graft.operators.Publish
    val root = Files.createTempDirectory("graft-compact").toString
    val noAudit = Publish.columnAudit("doc_id_not_null" -> col("doc_id").isNull)
    val df = (1L to 500L).map(i => (i, s"row $i")).toDF("doc_id", "text")
    val r1 = Publish.writeAuditPublish(df.repartition(20), root, noAudit, "seed")
    assert(r1.published && r1.version == Some(1L))
    def partFiles(v: Long) = new java.io.File(s"$root/v=$v").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(partFiles(1L) == 20, s"seed layout should be 20 files, got ${partFiles(1L)}")
    val rc = Publish.compact(spark, root, targetBytes = 1L << 40)
    assert(rc.published && rc.version == Some(2L), s"got $rc")
    assert(partFiles(2L) == 1, s"everything fits one target file, got ${partFiles(2L)}")
    // same rows through the pointer; the pre-compaction layout survives
    assert(Publish.readPublished(spark, root).as[(Long, String)].collect().toSet ==
      df.as[(Long, String)].collect().toSet)
    assert(partFiles(1L) == 20, "compaction must not touch the old version")

    // retention: keepLast=1 expires v=1 but NEVER the current version
    val expired = Publish.expireVersions(spark, root, keepLast = 1)
    assert(expired == Seq(1L), s"expired $expired")
    assert(!new java.io.File(s"$root/v=1").exists(), "v=1 must be gone")
    assert(Publish.readPublished(spark, root).count() == 500,
      "the current version must survive retention")
    assert(Publish.expireVersions(spark, root, keepLast = 1).isEmpty,
      "a second expiry pass has nothing to do")
  }

  test("retention sweep (G20): manifest pins survive the horizon, unreferenced history expires") {
    import spark.implicits._
    import graft.operators.Publish
    val base = Files.createTempDirectory("graft-sweep").toString
    val (rootA, rootB) = (s"$base/tableA", s"$base/tableB")
    val noAudit = Publish.columnAudit("doc_id_not_null" -> col("doc_id").isNull)
    def release(root: String, n: Int): Unit = (1 to n).foreach { i =>
      val r = Publish.writeAuditPublish(
        Seq((i.toLong, s"rel $i")).toDF("doc_id", "text"), root, noAudit, s"rel-$i")
      assert(r.published && r.version == Some(i.toLong))
    }
    release(rootA, 4) // history v1..v3 under current v4
    release(rootB, 3) // history v1..v2 under current v3
    def versions(root: String) = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong)
      .sorted.toSeq
    // the pin uses a TRAILING-SLASH spelling of rootA: matching must be
    // canonical-path, not string equality (a downstream artifact records
    // whatever spelling its writer used) — the ADVICE failure mode
    val manifest = Seq((s"$rootA/", 1L)).toDF("root", "version")
    val swept = Publish.retentionSweep(spark, Seq(rootA, rootB), manifest, keepLast = 1)
    // exact deletions: A keeps pinned v1 + current v4; B (absent from the
    // manifest) expires its whole pre-horizon history
    assert(swept == Seq(rootA -> 2L, rootA -> 3L, rootB -> 1L, rootB -> 2L),
      s"swept $swept")
    assert(versions(rootA) == Seq(1L, 4L),
      s"pinned v1 and current v4 must survive on A, got ${versions(rootA)}")
    assert(versions(rootB) == Seq(3L),
      s"only current v3 survives on B, got ${versions(rootB)}")
    assert(Publish.readPublished(spark, rootA).count() == 1)
    assert(Publish.readPublished(spark, rootB).count() == 1)
    // idempotent: nothing left past the horizon that isn't pinned
    assert(Publish.retentionSweep(spark, Seq(rootA, rootB), manifest, keepLast = 1).isEmpty)
    // dropping the pin releases v1 on the NEXT sweep — TTL applies the
    // moment a version becomes unreferenced, never before
    val unpinned = Publish.retentionSweep(spark, Seq(rootA, rootB),
      manifest.limit(0), keepLast = 1)
    assert(unpinned == Seq(rootA -> 1L), s"got $unpinned")
    assert(versions(rootA) == Seq(4L))
  }

  test("audited streaming sink (A32): dirty micro-batches quarantine with a report, clean ones land") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("graft-audited-sink")
    val (table, quarantine) = (s"$base/table", s"$base/quarantine")
    val audit = graft.operators.Publish.columnAudit(
      "text_not_empty" -> (col("text").isNull || length(col("text")) === 0))
    val src = MemoryStream[(Long, String)]
    val q = NibblerSink.startAudited(
      src.toDS().toDF("doc_id", "text"),
      audit, table, quarantine,
      new NibblerSink.BatchTracker(s"$base/marker"),
      checkpointLocation = s"$base/ckpt",
      tickerDuration = 100.millis)
    try {
      src.addData((1L, "alpha"), (2L, "beta")); q.processAllAvailable()
      src.addData((3L, ""), (4L, "fine")); q.processAllAvailable() // poison batch
      src.addData((5L, "gamma")); q.processAllAvailable()
      val landed = spark.read.parquet(table)
        .select("doc_id", "batch").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(landed.keySet == Set(1L, 2L, 5L),
        s"table must hold exactly the clean batches' rows, got $landed")
      assert(landed(1L) == landed(2L) && landed(1L) != landed(5L),
        "batch provenance partition column must survive")
      // the ENTIRE dirty batch quarantines (its clean row 4 included —
      // triage is per batch, the G16 discipline), with the report beside
      // it. Resolve the batch dir by listing: empty trigger firings can
      // shift batchId numbering, which is irrelevant to the contract.
      val qdirs = new java.io.File(quarantine).listFiles()
        .filter(_.getName.startsWith("batch="))
      assert(qdirs.length == 1, s"expected one quarantined batch: ${qdirs.mkString(",")}")
      val qRows = spark.read.parquet(qdirs.head.toString)
        .select("doc_id").as[Long].collect().toSet
      assert(qRows == Set(3L, 4L), s"quarantined rows: $qRows")
      val report = new String(java.nio.file.Files.readAllBytes(
        qdirs.head.toPath.resolve("_report.txt")), "UTF-8")
      assert(report.trim == "text_not_empty\t1", s"report: '$report'")
    } finally q.stop()
  }

  test("orphan GC (G21): crash residue is swept, live versions and in-flight attempts survive") {
    import spark.implicits._
    import graft.operators.Publish
    val root = Files.createTempDirectory("graft-gc").toString
    val audit = Publish.columnAudit("doc_id_not_null" -> col("doc_id").isNull)
    // a published version + its pointer: the protected surface
    val clean = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    assert(Publish.writeAuditPublish(clean, root, audit, token = "good").published)
    // residue class 1: an audit-failed staging dir (quarantine evidence)
    val dirty = Seq((Option.empty[Long], "x")).toDF("doc_id", "text")
    assert(!Publish.writeAuditPublish(dirty, root, audit, token = "crashed").published)
    assert(new java.io.File(s"$root/_staging/crashed").isDirectory)
    // residue class 2: a pointer swap that died between create and rename
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_LATEST.tmp.dead"), "v=9")

    // a LONG grace protects everything (the in-flight-attempt contract)
    assert(Publish.gcOrphans(spark, root, graceMs = 3600L * 1000).isEmpty,
      "young residue inside the grace window must survive")

    // grace 0 sweeps exactly the two residue classes
    val deleted = Publish.gcOrphans(spark, root, graceMs = 0L)
    assert(deleted.size == 2, s"expected staging + tmp pointer, got $deleted")
    assert(!new java.io.File(s"$root/_staging/crashed").exists())
    assert(!new java.io.File(s"$root/_LATEST.tmp.dead").exists())
    // the live surface is untouched and the table still reads
    assert(Publish.currentVersion(spark, root) == Some(1L))
    assert(Publish.readPublished(spark, root).count() == 2)
    // idempotent
    assert(Publish.gcOrphans(spark, root, graceMs = 0L).isEmpty)
    // and the next publish over the swept root works normally
    assert(Publish.writeAuditPublish(clean, root, audit, token = "after").published)
    assert(Publish.currentVersion(spark, root) == Some(2L))
  }

  test("time travel (G23): any retained version reads as published; expired versions fail loudly") {
    import spark.implicits._
    import graft.operators.Publish
    val root = Files.createTempDirectory("graft-timetravel").toString
    val audit = Publish.columnAudit("doc_id_not_null" -> col("doc_id").isNull)
    assert(Publish.writeAuditPublish(
      Seq((1L, "v1")).toDF("doc_id", "text"), root, audit, "t1").published)
    assert(Publish.writeAuditPublish(
      Seq((1L, "v2"), (2L, "v2")).toDF("doc_id", "text"), root, audit, "t2").published)
    // the pointer serves v2; time travel still reads v1 exactly
    assert(Publish.readPublished(spark, root).count() == 2)
    val v1 = Publish.readPublishedAt(spark, root, 1L).collect()
    assert(v1.length == 1 && v1.head.getString(1) == "v1")
    assert(Publish.readPublishedAt(spark, root, 2L).count() == 2)
    // a never-published version fails loudly, naming the available range
    val err = intercept[RuntimeException](Publish.readPublishedAt(spark, root, 9L))
    assert(err.getMessage.contains("9") && err.getMessage.contains("1,2"))
    // after retention expires v1, time travel to it fails loudly too
    Publish.expireVersions(spark, root, keepLast = 1)
    val gone = intercept[RuntimeException](Publish.readPublishedAt(spark, root, 1L))
    assert(gone.getMessage.contains("expired") || gone.getMessage.contains("available: 2"))
    assert(Publish.readPublishedAt(spark, root, 2L).count() == 2)
  }

  test("orphan GC (G21): liveness follows the NEWEST nested file, not the top-level dir mtime") {
    import spark.implicits._
    import graft.operators.Publish
    val root = Files.createTempDirectory("graft-gc-live").toString
    // a staging dir whose TOP-LEVEL mtime is old, but whose nested
    // write is fresh — the slow-audit in-flight shape the r9 ADVICE
    // flagged: on HDFS-like filesystems the parent mtime does not
    // advance while files land in subdirectories, so a dir-mtime
    // cutoff would sweep a live publish mid-flight
    val staged = new java.io.File(s"$root/_staging/slow/part")
    assert(staged.mkdirs())
    java.nio.file.Files.writeString(staged.toPath.resolve("data.parquet"), "fresh")
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    assert(new java.io.File(s"$root/_staging/slow").setLastModified(old))
    assert(new java.io.File(s"$root/_staging").setLastModified(old))
    // a 1-hour grace: the nested file is seconds old, so the attempt is
    // LIVE and must survive even though the dir looks 48h stale
    assert(Publish.gcOrphans(spark, root, graceMs = 3600L * 1000).isEmpty,
      "staging with a fresh nested file must be treated as in-flight")
    assert(staged.exists())
    // once everything under the token dir is old too, it sweeps; the
    // returned list reports only paths ACTUALLY removed
    new java.io.File(s"$root/_staging/slow/part/data.parquet").setLastModified(old)
    staged.setLastModified(old)
    new java.io.File(s"$root/_staging/slow").setLastModified(old)
    val swept = Publish.gcOrphans(spark, root, graceMs = 3600L * 1000)
    assert(swept.size == 1 && swept.head.endsWith("_staging/slow"))
    assert(!new java.io.File(s"$root/_staging/slow").exists())
  }

  test("jsonl ingest (G25): corrupt lines quarantine RAW, clean rows parse under the explicit schema") {
    import org.apache.spark.sql.types._
    import graft.streaming.SourcePresets
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val good = (1 to 40).map(i => s"""{"doc_id": $i, "text": "doc number $i", "score": ${i % 7}}""")
    val bad = Seq(
      """{"doc_id": 41, "text": "unterminated""",      // broken JSON
      """not json at all""",                            // not JSON
      """{"doc_id": "not-a-number", "text": 3}""")      // wrong field types
    // two files so the read spans partitions; corrupt lines interleaved
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.jsonl"),
      (good.take(20) :+ bad(0)).mkString("", "\n", "\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.jsonl"),
      (bad.drop(1) ++ good.drop(20)).mkString("", "\n", "\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("score", LongType)))
    val ingest = SourcePresets.jsonlIngest(spark, dir, schema)
    val (clean, quarantined) = (ingest.clean, ingest.quarantined)
    // every well-formed line parses with its fields intact
    val rows = clean.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 40, s"clean=${rows.length}")
    assert(rows.sortBy(_._1).map(_._1).sameElements(1L to 40L))
    assert(rows.forall { case (id, text, score) =>
      text == s"doc number $id" && score == id % 7 })
    // every malformed line lands in quarantine with its RAW bytes
    val q = quarantined.collect().map(_.getString(0)).toSet
    assert(q.size == 3, s"quarantined=${q.size}: $q")
    bad.foreach(b => assert(q.contains(b), s"raw line lost: $b"))
    // the type-mismatch line must NOT leak a schema-shaped null row into clean
    assert(!rows.exists(_._2 == null))
    // the handle releases the SHARED raw materialization (the old
    // clean.unpersist() was a no-op on a never-cached child): before
    // close the children resolve through InMemoryRelation, after close
    // they re-plan straight from the source
    // fresh Dataset each probe: withCachedData is memoized per
    // QueryExecution, so re-probing `clean` itself would see stale state
    def usesCache() = clean.select("*").queryExecution.withCachedData
      .toString.contains("InMemoryRelation")
    assert(usesCache(), "children must read the one persisted parse before close()")
    ingest.close()
    assert(!usesCache(), "close() must release the persisted raw frame")
  }

  test("jsonl streaming source (G25): explicit schema, bounded files per trigger") {
    import org.apache.spark.sql.types._
    import graft.streaming.SourcePresets
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-stream").toString
    (1 to 3).foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"f$f.jsonl"),
        (1 to 10).map(i => s"""{"doc_id": ${f * 100 + i}, "text": "m"}""")
          .mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val batches = new java.util.concurrent.atomic.AtomicInteger()
    val rows = new java.util.concurrent.atomic.AtomicLong()
    val q = SourcePresets.jsonlDir(spark, dir, schema, maxFilesPerTrigger = 1)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.incrementAndGet(); rows.addAndGet(df.count()); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(rows.get() == 30L, s"rows=${rows.get()}")
    assert(batches.get() >= 3, s"one file per trigger expected: ${batches.get()}")
  }

  test("warc reader (G26): encode→parse round trip, binary-safe bodies, fail-soft desync accounting") {
    import graft.operators.WarcCodec
    // a body containing CRLF CRLF and fake WARC/HTTP text must NOT
    // confuse the parser — blocks are Content-Length-delimited, never
    // delimiter-scanned
    val nasty = ("x\r\n\r\nWARC/1.0\r\nHTTP/1.1 999 FAKE\r\n\r\n" +
      "Content-Length: 9999\r\n").getBytes("US-ASCII") ++ Array[Byte](0, -1, 13, 10, 13, 10)
    val file = WarcCodec.encodeWarcInfo("software: graft\r\n") ++
      WarcCodec.encodeWarcResponse("https://a/1", 200, "text/html", nasty) ++
      WarcCodec.encodeWarcResponse("https://a/2", 404, "text/plain",
        Array.empty[Byte])
    val p = WarcCodec.parseWarcFile(file)
    assert(p.dropped_bytes == 0L, s"clean file dropped ${p.dropped_bytes}")
    assert(p.records.map(_.warc_type) == Seq("warcinfo", "response", "response"))
    val r1 = p.records(1)
    assert(r1.target_uri == "https://a/1" && r1.http_status == 200L
      && r1.content_type == "text/html" && r1.n_body_bytes == nasty.length.toLong)
    assert(r1.body.sameElements(nasty), "binary body must round-trip byte-exactly")
    assert(p.records(2).http_status == 404L && p.records(2).n_body_bytes == 0L)
    // truncation mid-block: the clean prefix survives, the rest is
    // COUNTED dropped — never silently parsed past a desync
    val truncated = file.dropRight(20)
    val pt = WarcCodec.parseWarcFile(truncated)
    assert(pt.records.map(_.target_uri).take(2) == Seq("", "https://a/1"))
    assert(pt.records.length == 2 && pt.dropped_bytes > 0L,
      s"got ${pt.records.length} records, dropped ${pt.dropped_bytes}")
    // a LYING Content-Length desyncs every later boundary: fail soft at
    // the lie, account the remainder
    val lying = new String(file, "ISO-8859-1")
      .replaceFirst("Content-Length: 17", "Content-Length: 19")
      .getBytes("ISO-8859-1")
    val pl = WarcCodec.parseWarcFile(lying)
    assert(pl.dropped_bytes > 0L, "desync must be accounted, not parsed through")
    // garbage never throws
    val rnd = new scala.util.Random(31)
    (1 to 100).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      WarcCodec.parseWarcFile(junk)
      WarcCodec.parseWarcFile("WARC/1.0\r\n".getBytes("US-ASCII") ++ junk)
    }
  }

  test("warc directory source (G26 disk leg): binaryFile read + parse, sidecars filtered, stream bounded") {
    import graft.operators.WarcCodec
    import graft.streaming.SourcePresets
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toString
    (1 to 3).foreach { f =>
      val bytes = WarcCodec.encodeWarcInfo("software: graft\r\n") ++
        (0 until f).map(i => WarcCodec.encodeWarcResponse(
          s"https://d/$f/$i", 200, "text/plain", s"body$f$i".getBytes("US-ASCII")))
          .foldLeft(Array.empty[Byte])(_ ++ _)
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"crawl-$f.warc"), bytes)
    }
    // a sidecar the glob must exclude — parsing it would be garbage rows
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "crawl-1.warc.sha1"),
      "not a warc".getBytes("US-ASCII"))
    val recs = WarcCodec.warcRecords(SourcePresets.warcDir(spark, dir)).collect()
    assert(recs.length == 3 + (1 + 2 + 3), s"got ${recs.length} records")
    assert(recs.count(_.getString(2) == "warcinfo") == 3)
    val uris = recs.filter(_.getString(2) == "response").map(_.getString(3)).toSet
    assert(uris == (for (f <- 1 to 3; i <- 0 until f) yield s"https://d/$f/$i").toSet)
    assert(recs.forall(_.getLong(7) == 0L), "clean files must drop zero bytes")
    // streaming leg: same records, bounded files per trigger
    val q = WarcCodec.warcRecords(
        SourcePresets.warcDirStream(spark, dir, maxFilesPerTrigger = 1))
      .writeStream.format("memory").queryName("warc_dir_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("warc_dir_stream").collect()
    assert(streamed.length == recs.length)
    assert(streamed.map(_.getString(3)).filter(_.nonEmpty).toSet == uris)
  }

  test("warc cdx (G26): the record index re-fetches every record with one bounded slice parse") {
    import spark.implicits._
    import graft.operators.WarcCodec
    val files = (1L to 5L).map { id =>
      val recs = WarcCodec.encodeWarcInfo("software: graft\r\n") +:
        (0 until (1 + id % 3).toInt).map(i =>
          WarcCodec.encodeWarcResponse(s"https://c/$id/$i",
            if (i == 1) 404 else 200, "text/html",
            Array.fill((3 + i * 7))((('a' + i) % 127).toByte)))
      (id, recs.reduce(_ ++ _))
    }
    val payloads = files.toMap
    val cdx = WarcCodec.warcCdx(files.toDF("file_id", "payload")).collect()
    assert(cdx.length == files.map(f => 2 + (f._1 % 3)).sum.toInt)
    // every CDX row re-fetches to EXACTLY the full-parse record
    cdx.foreach { row =>
      val (fid, idx) = (row.getLong(0), row.getLong(1))
      val full = WarcCodec.parseWarcFile(payloads(fid)).records(idx.toInt)
      val fetched = WarcCodec.fetchWarcRecord(payloads(fid),
        row.getLong(5), row.getLong(6))
      assert(fetched.nonEmpty, s"fetch failed for ($fid, $idx)")
      val g = fetched.get
      assert(g.warc_type == full.warc_type && g.target_uri == full.target_uri
        && g.http_status == full.http_status && g.body.sameElements(full.body),
        s"fetched record diverges at ($fid, $idx)")
      assert(row.getString(3) == full.target_uri && row.getLong(4) == full.http_status)
    }
    // offsets tile the file exactly: sorted (offset, bytes) spans are
    // contiguous from 0 to the file end (no gap, no overlap)
    files.foreach { case (fid, payload) =>
      val spans = cdx.filter(_.getLong(0) == fid)
        .map(r => (r.getLong(5), r.getLong(6))).sortBy(_._1)
      assert(spans.head._1 == 0L)
      spans.sliding(2).foreach {
        case Array((o1, b1), (o2, _)) => assert(o1 + b1 == o2, s"gap/overlap at $o2")
        case _ => ()
      }
      assert(spans.last._1 + spans.last._2 == payload.length.toLong)
    }
    // stale coordinates fail soft
    assert(WarcCodec.fetchWarcRecord(payloads(1L), 3L, 10L).isEmpty)
    assert(WarcCodec.fetchWarcRecord(payloads(1L), -1L, 10L).isEmpty)
    assert(WarcCodec.fetchWarcRecord(payloads(1L), 0L, 999999L).isEmpty)
  }

  test("warc gzip (G26): .warc.gz parses transparently — whole-file and per-record-member forms") {
    import graft.operators.WarcCodec
    val plain = WarcCodec.encodeWarcInfo("software: graft\r\n") ++
      WarcCodec.encodeWarcResponse("https://g/1", 200, "text/html",
        "hello gz".getBytes("US-ASCII")) ++
      WarcCodec.encodeWarcResponse("https://g/2", 404, "text/plain",
        Array[Byte](0, 1, 2, -1))
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    def key(p: WarcCodec.WarcParse) =
      p.records.map(r => (r.warc_type, r.target_uri, r.http_status, r.n_body_bytes))
    val expected = key(WarcCodec.parseWarcFile(plain))
    // whole-file gzip
    assert(key(WarcCodec.parseWarcFileAuto(gz(plain))) == expected)
    // the Common Crawl convention: ONE gzip member PER RECORD, concatenated
    val members = Seq(
      gz(WarcCodec.encodeWarcInfo("software: graft\r\n")),
      gz(WarcCodec.encodeWarcResponse("https://g/1", 200, "text/html",
        "hello gz".getBytes("US-ASCII"))),
      gz(WarcCodec.encodeWarcResponse("https://g/2", 404, "text/plain",
        Array[Byte](0, 1, 2, -1)))).reduce(_ ++ _)
    assert(key(WarcCodec.parseWarcFileAuto(members)) == expected,
      "concatenated gzip members must parse as one stream")
    // corrupt gzip tail: fail-soft, clean prefix survives via the
    // parser's dropped-bytes discipline
    val corrupt = gz(plain).dropRight(6)
    val pc = WarcCodec.parseWarcFileAuto(corrupt) // must not throw
    assert(pc.records.forall(r => expected.contains(
      (r.warc_type, r.target_uri, r.http_status, r.n_body_bytes))))
    // a .warc.gz file on disk flows through the directory source's glob
    val dir = java.nio.file.Files.createTempDirectory("graft-warcgz").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "c.warc.gz"), gz(plain))
    val recs = graft.operators.WarcCodec.warcRecords(
      graft.streaming.SourcePresets.warcDir(spark, dir)).collect()
    assert(recs.length == 3 && recs.count(_.getString(2) == "response") == 2)
  }

  test("warc.gz cdx (G26): per-member COMPRESSED offsets; random access byte-equal to the full walk; false magic inert") {
    import spark.implicits._
    import graft.operators.WarcCodec
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    // bodies: one carries a PLANTED gzip magic (1f 8b 08 00 + plausible
    // header tail) — a magic-scanning indexer would split here; the
    // deflate-grammar walk must not. One body is highly compressible,
    // one is binary junk.
    val falseMagic = "xx".getBytes("US-ASCII") ++
      Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x00, 1, 2, 3, 4, 0, 3) ++
      "more body after the plant".getBytes("US-ASCII")
    val bodies = Seq(
      falseMagic,
      Array.fill(5000)('a'.toByte),
      Array.tabulate(257)(i => (i * 131 % 251).toByte))
    val recsPlain = WarcCodec.encodeWarcInfo("software: graft\r\n") +:
      bodies.zipWithIndex.map { case (b, i) =>
        WarcCodec.encodeWarcResponse(s"https://gzcdx/$i",
          if (i == 1) 404 else 200, "application/octet-stream", b) }
    val members = recsPlain.map(gz)
    val file = members.reduce(_ ++ _)
    // member spans are exact: one per record, tiling the compressed file
    val spans = WarcCodec.gzipMemberSpans(file)
    assert(spans.length == members.length, s"got ${spans.length} members")
    assert(spans.head._1 == 0L && spans.last._1 + spans.last._2 == file.length.toLong)
    spans.zip(members.scanLeft(0L)(_ + _.length)).foreach { case ((off, len), expOff) =>
      assert(off == expOff, s"member offset drift: $off vs $expOff")
    }
    spans.sliding(2).foreach {
      case Seq((o1, b1), (o2, _)) => assert(o1 + b1 == o2, s"gap/overlap at $o2")
      case _ => ()
    }
    // CDX rows carry the compressed coordinates; fetch by them is
    // byte-equal to the full transparent walk
    val cdx = WarcCodec.warcCdx(Seq((7L, file)).toDF("file_id", "payload")).collect()
    assert(cdx.length == recsPlain.length)
    val full = WarcCodec.parseWarcFileAuto(file).records
    cdx.foreach { row =>
      val idx = row.getLong(1).toInt
      val fetched = WarcCodec.fetchWarcRecord(file, row.getLong(5), row.getLong(6))
      assert(fetched.nonEmpty, s"compressed fetch failed at rec $idx")
      val (g, f) = (fetched.get, full(idx))
      assert(g.warc_type == f.warc_type && g.target_uri == f.target_uri
        && g.http_status == f.http_status && g.body.sameElements(f.body),
        s"compressed fetch diverges at rec $idx")
    }
    // the false-magic bytes survive the round trip inside their body
    val planted = cdx.find(_.getString(3) == "https://gzcdx/0").get
    val got = WarcCodec.fetchWarcRecord(file, planted.getLong(5), planted.getLong(6)).get
    assert(got.body.sameElements(falseMagic))
    // a nonconforming MULTI-RECORD member: every record indexes at the
    // member's coordinates; fetchWarcRecords returns them all in order
    val multi = gz(recsPlain(1) ++ recsPlain(2)) // two responses, one member
    val file2 = members.head ++ multi
    val cdx2 = WarcCodec.warcCdx(Seq((8L, file2)).toDF("file_id", "payload")).collect()
    assert(cdx2.length == 3)
    val multiRows = cdx2.filter(_.getLong(5) == members.head.length.toLong)
    assert(multiRows.length == 2, "both records of the member share its span")
    val both = WarcCodec.fetchWarcRecords(file2,
      members.head.length.toLong, multi.length.toLong)
    assert(both.map(_.target_uri) == Seq("https://gzcdx/0", "https://gzcdx/1"))
    // truncated tail: clean member prefix survives, fail-soft
    val truncated = file.dropRight(7)
    val spansT = WarcCodec.gzipMemberSpans(truncated)
    assert(spansT.length == members.length - 1)
    // junk that merely starts with the magic: no members, no throw
    assert(WarcCodec.gzipMemberSpans(
      Array[Byte](0x1f, 0x8b.toByte, 0x08, 0, 0, 0, 0, 0, 0, 0, 42, 42)).isEmpty)
    assert(WarcCodec.gzipMemberSpans(Array.empty[Byte]).isEmpty)
  }

  test("warc reader streaming attach (A55): the batch operator parses arriving files unchanged") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.WarcCodec
    val files = (1L to 12L).map { id =>
      val recs = WarcCodec.encodeWarcInfo("software: graft\r\n") +:
        (0 until (1 + id % 3).toInt).map(i =>
          WarcCodec.encodeWarcResponse(s"https://s/$id/$i", 200, "text/html",
            Array.fill((5 + i).toInt)('z'.toByte)))
      (id, recs.reduce(_ ++ _))
    }
    val src = MemoryStream[(Long, Array[Byte])]
    val q = WarcCodec.warcRecords(src.toDS().toDF("file_id", "payload"))
      .writeStream.format("memory").queryName("warc_stream_test")
      .outputMode("append").start()
    try {
      val (a, b) = files.splitAt(6)
      src.addData(a: _*); q.processAllAvailable()
      src.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
      r.getString(2), r.getString(3), r.getLong(4), r.getString(5),
      r.getLong(6), r.getLong(7))
    val streamed = spark.table("warc_stream_test").collect().map(key).toSet
    val batch = WarcCodec.warcRecords(files.toDF("file_id", "payload"))
      .collect().map(key).toSet
    assert(streamed == batch, "streamed records must equal batch exactly")
    assert(streamed.count(_._3 == "response") == files.map(f => 1 + f._1 % 3).sum)
  }
}
