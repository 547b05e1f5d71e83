package graft.tools

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QueryMetricsSpec extends SparkSpec {

  test("query metrics (G19): partition pruning is visible in harvested scan metrics") {
    // numFiles/filesSize are LISTING-level metrics: they reflect which
    // files the planner decided to touch (partition pruning), which is
    // exactly the 100 TB observability question — "did this query scan
    // the whole table or one partition?"
    val dir = java.nio.file.Files.createTempDirectory("graft-metrics").toString
    Tables.documents(spark, sfDir).write
      .partitionBy("lang").mode("overwrite").parquet(dir)
    val c = QueryMetrics.attach(spark)
    try {
      val t = spark.read.parquet(dir)
      t.agg(count(lit(1))).collect() // full scan: every partition's files
      t.filter(col("lang") === "en").agg(count(lit(1))).collect() // pruned
      // QueryExecutionListener fires asynchronously — poll the drain
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      var records = Seq.empty[QueryMetrics.QueryRecord]
      while (records.size < 2 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        records = records ++ c.drain()
      }
      assert(records.size >= 2, s"listener records: $records")
      val byFiles = records.sortBy(_.filesRead)
      val (pruned, full) = (byFiles.head, byFiles.last)
      assert(full.filesRead >= 1 && pruned.filesRead >= 1, s"$records")
      assert(full.outputRows > 0 && pruned.outputRows > 0, s"$records")
      // the claim that matters: the lang='en' scan touched FEWER files
      // and fewer bytes than the full scan — pruning shows up in ops data
      assert(pruned.filesRead < full.filesRead,
        s"partition pruning invisible: pruned=${pruned.filesRead} full=${full.filesRead}")
      assert(pruned.bytesRead < full.bytesRead,
        s"pruned bytes ${pruned.bytesRead} vs full ${full.bytesRead}")
      // observability data is just data: the summary frame aggregates
      val summary = QueryMetrics.summarize(spark, records)
        .agg(sum(col("bytesRead"))).head().getLong(0)
      assert(summary == records.map(_.bytesRead).sum)
    } finally spark.listenerManager.unregister(c)
  }

  test("streaming metrics: state footprint and input rows surface per micro-batch") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val c = QueryMetrics.attachStreaming(spark)
    val src = MemoryStream[(Long, String)]
    // a STATEFUL query (dropDuplicates keeps seen keys in the state
    // store) so the state metrics are non-trivial
    val q = src.toDS().toDF("id", "v").dropDuplicates("id")
      .writeStream.format("memory").queryName("metrics_stream_test")
      .outputMode("append").start()
    try {
      src.addData((1L, "a"), (2L, "b"), (1L, "dup")); q.processAllAvailable()
      src.addData((3L, "c")); q.processAllAvailable()
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      var records = Seq.empty[QueryMetrics.BatchRecord]
      while (!records.exists(_.stateRows == 3) && System.nanoTime() < deadline) {
        Thread.sleep(100)
        records = records ++ c.drain()
      }
      val named = records.filter(_.queryName == "metrics_stream_test")
      assert(named.nonEmpty, s"no progress records: $records")
      assert(named.map(_.inputRows).sum == 4, s"input rows: $named")
      // after both batches the dedup state holds exactly the 3 distinct keys
      assert(named.exists(_.stateRows == 3), s"state rows never reached 3: $named")
      assert(named.exists(_.stateBytes > 0), s"state bytes missing: $named")
    } finally {
      q.stop()
      spark.streams.removeListener(c)
    }
  }
}
