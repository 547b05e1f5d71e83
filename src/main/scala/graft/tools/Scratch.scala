package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{HashFunctions => H}

/** One-off diagnostics for d4's candidate volume. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    val tokenHashes = Tables.spread(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(H.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val voteCols = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"v$i")
    }
    val votes = tokenHashes.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
    val shCol = (0 until 64)
      .map(i => when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    val sh = votes.select(col("doc_id"), shCol.as("sh")).persist()
    println("[scratch] docs=" + sh.count())
    println("[scratch] distinct simhashes=" + sh.select("sh").distinct().count())
    val banded = sh.select(col("doc_id"), col("sh"), explode(H.simhashBands(col("sh"))).as("band"))
    val bandSizes = banded.groupBy("band").count()
    bandSizes.orderBy(col("count").desc).show(10, false)
    println("[scratch] raw candidate pairs (1-level)=" + bandSizes
      .agg(sum(col("count") * (col("count") - 1) / 2)).head().get(0))
    for ((p, c) <- Seq((6, 2), (7, 3), (8, 4))) {
      val bk = sh.select(col("doc_id"), explode(H.simhashCombinationKeys(col("sh"), p, c)).as("band"))
        .groupBy("band").count()
      println(s"[scratch] C($p,$c): max bucket=" + bk.agg(max("count")).head().get(0) +
        " pairs=" + bk.agg(sum(col("count") * (col("count") - 1) / 2)).head().get(0))
    }
    // hamming distribution of the minhash-verified (true) near-dup pairs
    val d2 = graft.SparkEntry.queries("d2_dedup_minhash_lsh")(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val withH = d2
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
    withH.groupBy("hamming").count().orderBy("hamming").show(30)
    spark.stop()
  }
}
