package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Num._

/** Text-analysis pack (SURVEY.md §2 E1–E6) over the documents table.
  *
  * Everything here is built from codegen'd built-ins (regexp_*, split,
  * higher-order array functions) — no UDFs — so a 100 TB corpus runs these
  * as a single whole-stage-codegen'd scan with full column pruning: each
  * operator reads only (doc_id, text).
  *
  * Oracle twins are spelled with identical arithmetic shapes so DuckDB
  * produces bit-identical numbers (see Num).
  */
object TextAnalysis {

  /** Common English-ish stopword alternation used by quality + langid. */
  private val StopEn = "the|and|of|to|in|is|that|it|for|was"
  private val StopDe = "der|die|das|und|ist|nicht|mit|ein|auf|wir"
  private val StopFr = "le|les|et|est|que|pour|dans|une|des|avec"
  private val StopEs = "el|los|las|y|es|en|un|para|por|como"

  // E1 — token/char stats.
  private val t1 = Relational.Q(
    "t1_token_stats",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_actual"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          length(regexp_replace(col("text"), "\\s", "")).cast("long").as("n_nonspace"))
        .withColumn("avg_token_len",
          r2(col("n_nonspace").cast("double") / col("n_tokens")))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id, length(text) AS n_chars_actual,
        len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
        length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
        ${r2Sql("CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(string_split_regex(trim(text), '\\s+'))")} AS avg_token_len
      FROM documents ORDER BY doc_id"""))

  // E2 — quality scoring from punct/digit/upper/stopword ratios.
  private val t2 = Relational.Q(
    "t2_quality_score",
    (s, d) => {
      val base = Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_actual"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("long").as("n_punct"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).cast("long").as("n_digit"),
        (length(col("text")) - length(regexp_replace(col("text"), "[A-Z]", ""))).cast("long").as("n_upper"),
        size(expr(s"regexp_extract_all(lower(text), '\\\\b(?:$StopEn)\\\\b', 0)")).cast("long").as("n_stop"))
      base.withColumn("quality",
          r4(lit(0.4) * (col("n_stop").cast("double") / col("n_tokens"))
            + lit(0.3) * (lit(1.0) - col("n_punct").cast("double") / col("n_chars_actual"))
            + lit(0.3) * (lit(1.0) - col("n_digit").cast("double") / col("n_chars_actual"))))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH base AS (
        SELECT doc_id, length(text) AS n_chars_actual,
          len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
          length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
          length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
          len(regexp_extract_all(lower(text), '\\b(?:$StopEn)\\b')) AS n_stop
        FROM documents)
      SELECT doc_id, n_chars_actual, n_tokens, n_punct, n_digit, n_upper, n_stop,
        ${r4Sql("0.4 * (CAST(n_stop AS DOUBLE) / n_tokens) + 0.3 * (1.0 - CAST(n_punct AS DOUBLE) / n_chars_actual) + 0.3 * (1.0 - CAST(n_digit AS DOUBLE) / n_chars_actual)")} AS quality
      FROM base ORDER BY doc_id"""))

  // E3 — language-ID heuristic: stopword hits per candidate language,
  // deterministic argmax. (The table's `lang` column is synthetic noise —
  // the check is engine-vs-engine on an identical definition.)
  private val t3 = Relational.Q(
    "t3_langid",
    (s, d) => {
      def hits(alt: String): Column =
        size(expr(s"regexp_extract_all(lower(text), '\\\\b(?:$alt)\\\\b', 0)"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang").as("claimed_lang"),
          hits(StopEn).cast("long").as("hits_en"), hits(StopDe).cast("long").as("hits_de"),
          hits(StopFr).cast("long").as("hits_fr"), hits(StopEs).cast("long").as("hits_es"))
        .withColumn("predicted_lang",
          when(col("hits_en") >= col("hits_de") && col("hits_en") >= col("hits_fr")
            && col("hits_en") >= col("hits_es") && col("hits_en") > 0, "en")
            .when(col("hits_de") >= col("hits_fr") && col("hits_de") >= col("hits_es")
              && col("hits_de") > 0, "de")
            .when(col("hits_fr") >= col("hits_es") && col("hits_fr") > 0, "fr")
            .when(col("hits_es") > 0, "es")
            .otherwise("und"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH h AS (
        SELECT doc_id, lang AS claimed_lang,
          len(regexp_extract_all(lower(text), '\\b(?:$StopEn)\\b')) AS hits_en,
          len(regexp_extract_all(lower(text), '\\b(?:$StopDe)\\b')) AS hits_de,
          len(regexp_extract_all(lower(text), '\\b(?:$StopFr)\\b')) AS hits_fr,
          len(regexp_extract_all(lower(text), '\\b(?:$StopEs)\\b')) AS hits_es
        FROM documents)
      SELECT doc_id, claimed_lang, hits_en, hits_de, hits_fr, hits_es,
        CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es AND hits_en > 0 THEN 'en'
             WHEN hits_de >= hits_fr AND hits_de >= hits_es AND hits_de > 0 THEN 'de'
             WHEN hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
             WHEN hits_es > 0 THEN 'es'
             ELSE 'und' END AS predicted_lang
      FROM h ORDER BY doc_id"""))

  // E4 — document fingerprint over whitespace-normalized text.
  private val t4 = Relational.Q(
    "t4_fingerprint",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("fingerprint"),
          length(col("text")).cast("long").as("n_chars_actual"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
        md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        length(text) AS n_chars_actual
      FROM documents ORDER BY doc_id"""))

  // E5 — explode tokens -> global term frequencies, top 50.
  private val t5 = Relational.Q(
    "t5_token_histogram",
    (s, d) => {
      Tables.documents(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(50)
    },
    Some("""
      SELECT token, COUNT(*) AS freq FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        FROM documents)
      GROUP BY token ORDER BY freq DESC, token LIMIT 50"""))

  // E6 — BPE-ish token estimate: regex piece segmentation + per-word
  // ceil(len/4) subword estimate via a higher-order array fold.
  private val t6 = Relational.Q(
    "t6_token_count_bpe",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\\\s]', 0)")).cast("long").as("n_pieces"),
          expr("aggregate(split(lower(trim(text)), '\\\\s+'), 0L, (acc, w) -> acc + CAST(ceil(length(w)/4.0) AS LONG))")
            .as("est_bpe_tokens"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_pieces,
        CAST(list_sum(list_transform(string_split_regex(lower(trim(text)), '\s+'),
          w -> CAST(ceil(length(w)/4.0) AS BIGINT))) AS BIGINT) AS est_bpe_tokens
      FROM documents ORDER BY doc_id"""))

  // E7 — winnowing fingerprints (Schleimer et al.): the rolling local-min
  // selection over positional k-gram hashes, built relationally (posexplode
  // + sliding window min, all codegen), then a fingerprint-sharing join.
  // Docs sharing >= 50% of the smaller fingerprint set are near-dup
  // candidates. Rows-only (no 64-bit hash common with DuckDB); the spec
  // checks it rediscovers the minhash-verified near-dups.
  private val t7 = Relational.Q(
    "t7_winnowing_fingerprints",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = 5  // gram length
      val w = 4  // winnow window
      // Gram hashing stays in whole-stage codegen: explode the POSITIONS
      // (a cheap int sequence), then hash each k-gram as a per-row column
      // expression. The earlier HOF spelling (transform(sequence, i ->
      // xxhash64(substr))) evaluated interpreted per element — the repo's
      // documented hot-path pitfall.
      val grams = graft.Tables.spread(
          graft.Tables.documents(s, d).select(col("doc_id"), lower(col("text")).as("lt")))
        .select(col("doc_id"), col("lt"),
          explode(sequence(lit(1), greatest(length(col("lt")) - (k - 1), lit(1)))).as("pos"))
        .select(col("doc_id"), col("pos"), xxhash64(col("lt").substr(col("pos"), lit(k))).as("gh"))
      val winnowWin = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(0, w - 1)
      val fps = grams
        .withColumn("fp", min(col("gh")).over(winnowWin))
        .select(col("doc_id"), col("fp"))
        .distinct()
        .persist()
      // drop ubiquitous fingerprints (shared by >25% of docs) — they carry
      // no near-dup signal and would explode the pair join; overlap ratios
      // are computed on the FILTERED sets so the discriminative
      // fingerprints carry full weight. The doc count arrives as a
      // broadcast one-row frame, keeping the whole operator lazily planned
      // (no driver-side action).
      val nDocsDf = fps.agg(count_distinct(col("doc_id")).as("n_docs"))
      val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocsDf))
        .filter(col("df") <= greatest(lit(2L), (col("n_docs") / lit(4)).cast("long")))
        .select(col("fp"))
      val filtered = fps.join(rare.select("fp"), Seq("fp")).persist()
      val sizes = filtered.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
      val shared = filtered.select(col("fp"), col("doc_id").as("doc_a"))
        .join(filtered.select(col("fp"), col("doc_id").as("doc_b")), Seq("fp"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
      shared
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_fp").as("n_fp_a")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_fp").as("n_fp_b")), Seq("doc_b"))
        .withColumn("overlap",
          col("n_shared").cast("double") / least(col("n_fp_a"), col("n_fp_b")))
        .filter(col("overlap") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("n_shared"), r4(col("overlap")).as("overlap"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    None)

  val all: Seq[Relational.Q] = Seq(t1, t2, t3, t4, t5, t6, t7)
}
