package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** One-off diagnostics — currently: where t29's warm seconds go (round
  * 10 item 7). Times each pipeline stage in isolation at sf0.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] $label run $i rows=$n ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        spark.catalog.clearCache()
      }
    }
    val docs = Tables.documents(spark, sfDir)
    val delim = "(?:\\s*(?:[^a-z\\s]|\\b(?:the|and|of|to|in|is|that|it|for|was)\\b)\\s*)+"
    val ph = docs
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), delim)).as("p"))
      .select(col("doc_id"), trim(col("p")).as("phrase"))
      .filter(col("phrase") =!= "")
    time("split-only")(ph.count())
    val phR = ph.repartition(col("doc_id"))
    val pw = phR.select(col("doc_id"),
      size(split(col("phrase"), "\\s+")).cast("long").as("plen"),
      explode(split(col("phrase"), "\\s+")).as("w"))
    val ws = pw.groupBy(col("doc_id"), col("w"))
      .agg(expr("(sum(plen) * 1000000) div count(1)").as("wscore"))
    time("ws-agg")(ws.count())
    val dpw = phR.select(col("doc_id"), col("phrase")).distinct()
      .select(col("doc_id"), col("phrase"),
        explode(split(col("phrase"), "\\s+")).as("w"))
    time("dpw-distinct")(dpw.count())
    val ps = dpw.join(ws, Seq("doc_id", "w"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(sum(col("wscore")).as("score"))
    time("ps-join")(ps.count())
    import org.apache.spark.sql.expressions.Window
    val rk = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("phrase"))
    val top = ps.withColumn("rk", row_number().over(rk)).filter(col("rk") <= 3)
      .select(col("doc_id"), col("phrase"), col("score"))
    time("window-no-sort")(top.count())
    time("window-sorted")(top.orderBy(col("doc_id"), col("score").desc, col("phrase")).count())
    time("full-t29")(graft.SparkEntry.queries("t29_rake_keyphrases")(spark, sfDir).count())
    spark.stop()
  }
}
