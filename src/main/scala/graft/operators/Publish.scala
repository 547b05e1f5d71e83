package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** G16 — WRITE-AUDIT-PUBLISH (WAP): the snapshot-publishing protocol a
  * production pipeline wraps around every corpus release — write the
  * candidate snapshot to an invisible staging location, run the
  * data-expectations audit against the STAGED bytes (what readers would
  * actually see, not the in-memory frame), and only then make it
  * visible with an atomic pointer swap. A failed audit leaves the
  * snapshot quarantined in staging; readers never observe it.
  *
  * Atomicity model (object-store realistic): visibility is a single
  * `_LATEST` pointer file naming the current version directory,
  * replaced via write-temp + rename — readers resolve the pointer then
  * read an immutable version dir, so there is no window where a
  * half-written snapshot is the current one. Version dirs are
  * append-only (`v=<n>`), so a reader holding an old pointer keeps a
  * consistent snapshot (time travel for free). A crash before the
  * pointer swap leaves only staging garbage + an unreferenced version
  * dir — both invisible, both safely re-runnable.
  *
  * At 100 TB the staged write is the same distributed parquet write the
  * final table needs anyway (no extra data pass); the audit is whatever
  * aggregate the caller supplies; the publish step moves ONE pointer
  * file regardless of data size.
  */
object Publish {

  final case class WapResult(published: Boolean, version: Option[Long],
      path: Option[String], violations: Seq[(String, Long)])

  /** Audit contract: a frame with (expectation: string, violations:
    * long, pass: boolean) rows — [[Relational.dataExpectations]]'s
    * shape. The snapshot publishes iff every row passes.
    */
  type Audit = DataFrame => DataFrame

  /** Build an [[Audit]] from (name, bad-row condition) pairs — each
    * check is one map-side-combinable aggregate counting rows where the
    * condition holds (the [[Relational.dataExpectations]] row shape).
    */
  def columnAudit(checks: (String, org.apache.spark.sql.Column)*): Audit = { df =>
    import org.apache.spark.sql.functions._
    require(checks.nonEmpty, "columnAudit needs at least one check — " +
      "an empty audit would publish anything")
    // ONE wide aggregate = one scan of the staged table (a per-check
    // union of independent aggregates would re-read the full snapshot
    // once per expectation — at 100 TB that is N extra table scans),
    // then explode the single row into the (expectation, violations,
    // pass) shape
    val aggs = checks.zipWithIndex.map { case ((_, bad), i) =>
      sum(when(bad, 1L).otherwise(0L)).as(s"c$i")
    }
    val rows = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("expectation"),
        coalesce(col(s"c$i"), lit(0L)).cast("long").as("violations"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("e"))
      .select(col("e.expectation"), col("e.violations"),
        (col("e.violations") === 0L).as("pass"))
  }

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Current version number per the `_LATEST` pointer, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val ptr = new Path(root, "_LATEST")
    val f = fs(spark, ptr)
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        Some(s.stripPrefix("v=").toLong)
      } finally in.close()
    }
  }

  /** Read the table THROUGH the pointer — the only sanctioned read path. */
  def readPublished(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no published version under $root"))
    spark.read.parquet(new Path(root, s"v=$v").toString)
  }

  /** G23 — TIME TRAVEL: read a specific published version (the
    * `VERSION AS OF` of table formats). Versions are immutable dirs and
    * the pointer swap never rewrites them, so any version still inside
    * the retention horizon reads exactly as it was published —
    * reproducing yesterday's training run, diffing releases (p10's
    * input shape), or pinning a derived artifact to its source. Reading
    * an expired or never-published version fails LOUDLY with the
    * available range rather than returning an empty frame (an absent
    * dir must not masquerade as an empty table).
    */
  def readPublishedAt(spark: SparkSession, root: String, version: Long): DataFrame = {
    val dir = new Path(root, s"v=$version")
    val f = fs(spark, dir)
    if (!f.exists(dir)) {
      val have = Option(f.globStatus(new Path(root, "v=*"))).getOrElse(Array.empty)
        .map(_.getPath.getName.stripPrefix("v=")).flatMap(_.toLongOption).sorted
      sys.error(s"version $version not on disk under $root " +
        s"(available: ${if (have.isEmpty) "none" else have.mkString(",")}) — " +
        "expired by retention or never published")
    }
    spark.read.parquet(dir.toString)
  }

  /** G17 — SMALL-FILE COMPACTION as a versioned publish: rewrite the
    * current version's many small files into ~`targetBytes` files and
    * publish the rewrite as the NEXT version via the same pointer swap —
    * readers never see a half-compacted table, the old layout stays
    * readable until the swap, and a crashed compaction leaves only an
    * unreferenced version dir. The file count is computed from the
    * CURRENT version's on-disk bytes (ceil(bytes/target), min 1);
    * `repartition` redistributes rows evenly across exactly that many
    * writers. The audit gate: compaction must be a pure LAYOUT change,
    * so the staged rewrite is checked against the source row count
    * before the pointer moves (a lost-row rewrite quarantines like any
    * failed audit).
    *
    * At 100 TB this is the nightly table-maintenance job: streaming
    * ingestion (A32) accretes per-micro-batch files; compaction folds
    * them into scan-efficient sizes without ever blocking readers.
    */
  def compact(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024): WapResult = {
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"nothing to compact: no published version under $root"))
    val cur = new Path(root, s"v=$v")
    val f = fs(spark, cur)
    val bytes = f.getContentSummary(cur).getLength
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val src = spark.read.parquet(cur.toString)
    val expected = src.count()
    val audit: Audit = staged => {
      import org.apache.spark.sql.functions._
      staged.agg(count(lit(1)).as("n"))
        .select(lit("row_count_preserved").as("expectation"),
          (abs(col("n") - lit(expected))).cast("long").as("violations"),
          (col("n") === lit(expected)).as("pass"))
    }
    // expectedBase: a release landing mid-compaction must abort this
    // publish loudly — publishing a rewrite of the OLD head would
    // silently revert the release
    writeAuditPublish(src.repartition(nFiles), root, audit, s"compact-v$v",
      expectedBase = Some(v))
  }

  /** Retention: delete published versions older than the `keepLast`
    * most recent (time-travel horizon). The CURRENT version is always
    * kept regardless of `keepLast`; staging and quarantine areas are
    * untouched (they are triage evidence, cleaned by their own policy).
    * Returns the versions deleted. Safe ordering: a version dir is only
    * ever deleted AFTER the pointer has moved past it, so no reader
    * resolving the current pointer can lose its snapshot — only readers
    * time-traveling beyond the retention horizon do, which is the
    * horizon's definition.
    */
  def expireVersions(spark: SparkSession, root: String, keepLast: Int,
      referenced: Set[Long] = Set.empty): Seq[Long] = {
    require(keepLast >= 1, "keepLast must retain at least the current version")
    val cur = currentVersion(spark, root).getOrElse(return Nil)
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    val versions = f.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .filter(_ <= cur) // an in-flight publish's dir is not ours to touch
      .sorted
    // a version pinned by a downstream artifact's lineage outlives the
    // horizon: deleting it would break that artifact's re-verification
    // path (G20) — TTL applies only to UNREFERENCED history
    val expire = versions.dropRight(keepLast).filterNot(referenced)
    expire.foreach(v => f.delete(new Path(root, s"v=$v"), true))
    expire
  }

  /** G20 — MANIFEST-DRIVEN retention sweep: the nightly TTL job across a
    * family of WAP tables, where "old" is not sufficient to delete — a
    * published downstream artifact (a trained model's lineage record, a
    * shard manifest, an ANN index built against corpus v=N) PINS the
    * exact versions it was derived from, and deleting a pinned version
    * silently breaks the artifact's re-verification path. The manifest
    * is (root, version) rows naming every version still referenced;
    * each root then expires versions that are simultaneously (a) past
    * the keepLast horizon, (b) unreferenced, and (c) not current.
    * Returns the (root, version) pairs actually deleted.
    *
    * The manifest collect is bounded by the count of PUBLISHED ARTIFACTS
    * (lineage rows), not data — the audit-report convention. At 100 TB
    * the sweep's cost is directory listings plus deletes; no table is
    * scanned.
    *
    * Pin matching is by CANONICAL path (FileSystem.makeQualified on both
    * the manifest's `root` values and the `roots` argument), never raw
    * string equality: a trailing slash or relative-vs-absolute spelling
    * difference would otherwise silently drop every pin for that root
    * and delete referenced versions — the exact failure this function
    * exists to prevent. Returned pairs keep the caller's spelling.
    */
  def retentionSweep(spark: SparkSession, roots: Seq[String],
      manifest: DataFrame, keepLast: Int): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions.col
    def canon(r: String): String = {
      val p = new Path(r)
      fs(spark, p).makeQualified(p).toString
    }
    val refs = manifest.select(col("root"), col("version")).collect()
      .map(r => (canon(r.getString(0)), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    roots.flatMap { root =>
      expireVersions(spark, root, keepLast, refs.getOrElse(canon(root), Set.empty))
        .map(root -> _)
    }
  }

  /** Stage `df`, audit the staged bytes with `audit`, publish on a clean
    * audit. `token` names the staging attempt (a retry supplies a fresh
    * one; stale staging dirs are quarantine evidence, never read).
    */
  /** Highest version present on disk OR named by the pointer — the
    * orphan-aware successor base. A crash between the version-dir
    * rename and the pointer swap leaves v=N on disk with the pointer
    * still at N-1; computing next from the pointer alone would retry
    * INTO the orphan (rename onto an existing dir: wedged on local FS,
    * dir-nesting corruption under the HDFS rename contract). Orphans
    * stay unreferenced garbage — never republished, never current.
    */
  private def maxVersionOnDisk(spark: SparkSession, root: String): Long = {
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    val dirs =
      if (!f.exists(rootPath)) Seq.empty
      else f.listStatus(rootPath).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong)
    (currentVersion(spark, root).toSeq ++ dirs).foldLeft(0L)(math.max)
  }

  /** A staged-and-audited snapshot whose pointer has NOT moved yet —
    * the handle between [[stageAudit]] and [[publishStaged]]. Multi-table
    * artifacts (the IVF-PQ index's lists/books/codes triple) stage and
    * audit EVERY member before publishing ANY member, so a dirty table
    * is rejected while the whole family still sits at the old version —
    * the torn-version window of audit-after-partial-publish cannot open.
    */
  final case class StagedSnapshot(root: String, token: String,
      expectedBase: Option[Long])

  /** Phase 1: stage `df` under `root` and audit the STAGED bytes.
    * Publishes nothing. Left = audit failure (the quarantined
    * WapResult); Right = a handle [[publishStaged]] can swap live.
    */
  def stageAudit(df: DataFrame, root: String, audit: Audit,
      token: String, expectedBase: Option[Long] = None): Either[WapResult, StagedSnapshot] = {
    val spark = df.sparkSession
    val stage = new Path(root, s"_staging/$token")
    val f = fs(spark, stage)
    // the token names the ATTEMPT: re-running it replaces its own stale
    // staging (a crashed or audit-failed prior run) instead of wedging
    // on errorifexists — quarantine evidence lives until the retry
    if (f.exists(stage)) f.delete(stage, true)
    df.write.mode("errorifexists").parquet(stage.toString)

    // audit what a reader would read: the staged files, not `df`
    val staged = spark.read.parquet(stage.toString)
    val report = audit(staged)
      .select("expectation", "violations", "pass").collect()
    val bad = report.filterNot(_.getBoolean(2))
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    if (bad.nonEmpty) Left(WapResult(published = false, None, None, bad))
    else Right(StagedSnapshot(root, token, expectedBase))
  }

  /** Phase 2: pointer-swap a snapshot [[stageAudit]] already vetted. */
  def publishStaged(spark: SparkSession, s: StagedSnapshot): WapResult = {
    val stage = new Path(s.root, s"_staging/${s.token}")
    val f = fs(spark, stage)
    require(f.exists(stage), s"nothing staged at $stage — stageAudit first")
    // single-publisher protocol; the base check turns the lost-update
    // race (a publish landing while this snapshot staged — e.g. a
    // compaction about to revert it) from silent data loss into a loud
    // abort, leaving only invisible staging behind
    val cur = currentVersion(spark, s.root)
    s.expectedBase.foreach { base =>
      require(cur.getOrElse(0L) == base,
        s"table moved during staging: expected base v=$base, " +
          s"current is v=${cur.getOrElse(0L)} — re-run against the new head")
    }
    val next = maxVersionOnDisk(spark, s.root) + 1L
    val versionDir = new Path(s.root, s"v=$next")
    require(f.rename(stage, versionDir),
      s"rename $stage -> $versionDir failed (concurrent publish?)")
    // pointer swap: write aside, then rename into place. The pointer is
    // either absent or a COMPLETE version reference — the delete+rename
    // gap can surface as "no published version" (callers retry), never
    // as a torn or half-written pointer.
    val tmp = new Path(s.root, s"_LATEST.tmp.${s.token}")
    val out = f.create(tmp, true)
    try out.write(s"v=$next".getBytes("UTF-8")) finally out.close()
    val ptr = new Path(s.root, "_LATEST")
    if (f.exists(ptr)) f.delete(ptr, false)
    require(f.rename(tmp, ptr), s"pointer swap to v=$next failed")
    WapResult(published = true, Some(next), Some(versionDir.toString), Nil)
  }

  def writeAuditPublish(df: DataFrame, root: String, audit: Audit,
      token: String, expectedBase: Option[Long] = None): WapResult =
    stageAudit(df, root, audit, token, expectedBase) match {
      case Left(quarantined) => quarantined
      case Right(staged) => publishStaged(df.sparkSession, staged)
    }

  /** G21 — ORPHAN GC: the lifecycle piece between WAP (G16) and version
    * retention (G19/G20). Crashed or audit-failed attempts leave two
    * invisible residue classes under a table root — `_staging/<token>`
    * dirs (staged-but-never-published snapshots; at 100 TB these hold
    * full-size parquet) and `_LATEST.tmp.<token>` files (pointer swaps
    * that died between create and rename). Neither is ever read by the
    * protocol, so they are pure storage leakage; this sweep deletes
    * those older than `graceMs` (the grace window protects IN-FLIGHT
    * attempts: a publisher mid-audit owns a young staging dir).
    *
    * Safety envelope: only the two residue classes are candidates —
    * `v=*` version dirs (live data, owned by expireVersions/
    * retentionSweep's pin-aware policy) and the `_LATEST` pointer are
    * never touched, so the sweep composes with retention instead of
    * racing it. Driver-side file-listing only (dir count, not data
    * size); idempotent; returns what it deleted.
    */
  def gcOrphans(spark: SparkSession, root: String,
      graceMs: Long = 24L * 3600 * 1000): Seq[String] = {
    require(graceMs >= 0, s"graceMs must be >= 0, got $graceMs")
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    if (!f.exists(rootPath)) return Nil
    val cutoff = System.currentTimeMillis() - graceMs
    val tmpPtrs = f.listStatus(rootPath).toSeq
      .filter(s => s.getPath.getName.startsWith("_LATEST.tmp.")
        && s.getModificationTime <= cutoff)
      .map(_.getPath)
    val stagingRoot = new Path(root, "_staging")
    // liveness = the NEWEST status anywhere under the token dir, not the
    // top-level dir mtime: on HDFS-like filesystems a directory's mtime
    // does not advance while files land in nested subdirectories, so a
    // legitimate publish whose audit+write outlives graceMs would look
    // idle and get swept mid-flight, failing its rename
    def newestMtime(p: Path): Long = {
      val st = f.getFileStatus(p)
      if (!st.isDirectory) st.getModificationTime
      else {
        val kids = f.listStatus(p)
        if (kids.isEmpty) st.getModificationTime
        else math.max(st.getModificationTime, kids.map(k => newestMtime(k.getPath)).max)
      }
    }
    val staged =
      if (!f.exists(stagingRoot)) Seq.empty
      else f.listStatus(stagingRoot).toSeq
        .filter(s => newestMtime(s.getPath) <= cutoff)
        .map(_.getPath)
    // report only paths ACTUALLY removed — a false delete (permissions,
    // concurrent rename) must not be misreported as swept
    (tmpPtrs ++ staged).filter(p => f.delete(p, true)).map(_.toString)
  }
}
