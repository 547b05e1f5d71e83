package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Streaming source presets with the backpressure knobs a nibbler user
  * needs at scale (SURVEY.md §5): a trigger's batch size must be bounded
  * at the SOURCE (files/offsets per trigger) so a 100 TB/day firehose
  * can't materialize an unbounded micro-batch — the streaming analog of
  * the reference's bounded `Size` (nibbler.go:33).
  */
object SourcePresets {

  /** Parquet-directory source, at most `maxFilesPerTrigger` files per
    * micro-batch. Pair with NibblerSink: one trigger ~ one "full" batch.
    */
  def parquetDir(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)

  /** Text-file QUEUE source: one record per line, one file per producer
    * append — the broker-shaped stand-in this sandbox can actually run
    * (no Kafka broker here; the [[kafka]] preset is the real-deployment
    * spelling with the same bound). A producer enqueues by dropping a
    * file into `dir`; the subscriber sees at most `maxFilesPerTrigger`
    * files per micro-batch — the Size bound at the SOURCE, exactly what
    * `maxOffsetsPerTrigger` does for Kafka offsets. Pair with
    * [[NibblerSink]] for the reference README's queue-subscriber story:
    * burst arrivals flush as size-capped BATCH_FULL batches, trickles
    * flush on the ticker.
    */
  def textQueue(
      spark: SparkSession,
      dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .text(dir)

  /** JSONL (newline-delimited JSON) streaming source under an EXPLICIT
    * schema — never inferSchema: inference is a full extra pass at
    * 100 TB and silently admits schema drift. At most
    * `maxFilesPerTrigger` files per micro-batch (the Size bound at the
    * source, the parquetDir/textQueue contract). Unparseable lines land
    * in the `_corrupt_record` column when the schema declares it (pair
    * with [[jsonlIngest]]'s quarantine discipline for the batch side).
    */
  def jsonlDir(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(dir)

  /** Batch JSONL ingest with CORRUPT-RECORD QUARANTINE (G25): parse
    * under the explicit schema in PERMISSIVE mode and split into
    * (clean, quarantined) — the WAP posture applied to format errors:
    * a malformed line never silently vanishes (it is preserved RAW in
    * the quarantine frame for replay after the producer is fixed) and
    * never poisons the clean frame (schema-shaped nulls from a bad
    * line are confined to quarantine). The one materialization
    * (persist) is REQUIRED correctness, not a cache hint: Spark
    * disallows filtering on the internal corrupt column of a lazy
    * JSON scan precisely because re-parsing could disagree, so the
    * split must read one parsed materialization.
    */
  final case class JsonlIngest(clean: DataFrame, quarantined: DataFrame,
      private val raw: DataFrame) extends AutoCloseable {
    /** Release the shared parsed materialization. Call after both the
      * clean and quarantine frames have been consumed (written/counted);
      * the children stay queryable afterwards but re-parse from source —
      * which is exactly the lazy-scan disagreement the persist guards
      * against, so consume first, then close.
      */
    override def close(): Unit = { raw.unpersist(); () }
  }

  def jsonlIngest(spark: SparkSession, dir: String, schema: StructType)
      : JsonlIngest = {
    import org.apache.spark.sql.functions.col
    require(!schema.fieldNames.contains("_corrupt_record"),
      "caller schema must not declare _corrupt_record; jsonlIngest adds it")
    val raw = spark.read
      .schema(StructType(schema.fields :+
        org.apache.spark.sql.types.StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .persist()
    // the persisted frame rides along as the releasable handle (the r11
    // advice: returning only derived children made the cache
    // unreleasable — the test's clean.unpersist() was a silent no-op)
    JsonlIngest(
      raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      raw.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record").as("raw_line")),
      raw)
  }

  /** WARC-directory source (G26's disk leg, round 12): whole crawl
    * files via Spark's `binaryFile` source — (path, modificationTime,
    * length, content) per file — projected to the (file_id, payload)
    * shape [[graft.operators.WarcCodec.warcRecords]] consumes (file_id =
    * a 63-bit hash of the path: stable, join-safe, no driver state).
    * The batch spelling reads a landed crawl drop; the streaming
    * spelling tails an arriving one with `maxFilesPerTrigger` as the
    * Size bound (a WARC file is the natural micro-batch unit — Common
    * Crawl caps them ~1 GB). `pathGlobFilter` keeps sidecar files
    * (checksums, manifests) out of the parse.
    */
  def warcDir(spark: SparkSession, dir: String,
      glob: String = "{*.warc,*.warc.gz}"): DataFrame =
    projectWarc(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir))

  def warcDirStream(spark: SparkSession, dir: String,
      glob: String = "{*.warc,*.warc.gz}", maxFilesPerTrigger: Int = 4): DataFrame = {
    // streaming sources require an explicit schema; binaryFile's is
    // fixed by the format (path/modificationTime/length/content)
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    projectWarc(spark.readStream.format("binaryFile")
      .schema(schema)
      .option("pathGlobFilter", glob)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(dir))
  }

  private def projectWarc(files: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    files.select(
      abs(xxhash64(col("path"))).as("file_id"),
      col("content").as("payload"))
  }

  /** TCP line socket source — the live network-consumer shape (Spark's
    * built-in test transport: the source CONNECTS to host:port and reads
    * newline-delimited records). No replay/offset tracking, so it is the
    * stand-in for exercising a push transport end to end where [[kafka]]
    * would run in production; durable pipelines use [[textQueue]] or
    * [[kafka]], whose sources can re-read on failure.
    */
  def socket(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host)
      .option("port", port.toString)
      .load()

  /** Rate source for load tests and ticker demos. */
  def rate(spark: SparkSession, rowsPerSecond: Long): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()

  /** Kafka-shaped source preset (documented for real deployments; the
    * kafka connector jar is not in this environment). `maxOffsetsPerTrigger`
    * is the Size bound: offsets per micro-batch across all partitions.
    */
  def kafka(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      maxOffsetsPerTrigger: Long = 1000000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
      .load()
}
