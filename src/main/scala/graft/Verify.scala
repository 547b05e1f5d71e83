package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, only @ _*) = args
    val unknown = only.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only.toSet).toMap
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Intent is recorded BEFORE the loop, in three parts, so a run
    // killed mid-loop cannot read as green in a reused outDir:
    // manifest.json names the attempted queries (comparator FAILs an
    // attempted query with no output dir), each attempted query's STALE
    // output dir from a previous run is deleted (otherwise the isdir
    // check would pass on old parquet), and oracle_sql.json is written
    // up front (otherwise the comparator would replay the previous
    // run's SQL against the previous run's outputs).
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      selected.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    selected.keys.foreach(name => rmrf(new java.io.File(s"$outDir/$name")))
    var failed = List.empty[String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed ::= name
      }
      spark.catalog.clearCache()
    }
    spark.stop()
    // nonzero exit on any per-query failure: a query that errors leaves
    // no output dir, and a downstream comparator must not be able to
    // read the gap as "filtered out" and report green
    if (failed.nonEmpty) {
      System.err.println(s"[verify] FAILED queries: ${failed.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
