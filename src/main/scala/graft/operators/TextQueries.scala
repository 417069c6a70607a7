package graft.operators

import org.apache.spark.sql.functions._
import graft.ext.{AsOf, Dedup, TextAnalysis}
import QueryDsl._

/** Training-data text operators as catalog queries over `documents`.
  * Oracle SQL mirrors each Spark expression exactly (incl. the DuckDB 'g'
  * regex flag — DuckDB replaces first-match by default, Spark replaces all).
  */
object TextQueries {

  // DuckDB fragment: whole-word-occurrence count via space doubling.
  private def occSql(w: String): String =
    s"CAST((length(x) - length(replace(x, ' $w ', ''))) / ${w.length + 2} AS INTEGER)"
  private def hitsSql(lang: String): String =
    TextAnalysis.StopwordProfiles(lang).map(occSql).mkString(" + ")

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "d01_dedup_exact",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy(col("keep_id")),
      Some("""SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY keep_id""")),

    CatalogQuery(
      "d02_text_metrics",
      (s, dir) =>
        TextAnalysis.withTextMetrics(
            t(s, dir, "documents").select(col("doc_id"), col("text")), "text")
          .drop("text")
          .orderBy(col("doc_id")),
      Some(s"""WITH base AS (
          SELECT doc_id, text, ' ' || replace(lower(text), ' ', '  ') || ' ' AS x
          FROM documents),
        m AS (
          SELECT doc_id, text, x,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) END AS n_tokens,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) END AS digit_ratio,
            ${hitsSql("en")} AS stop_hits
          FROM base)
        SELECT doc_id, n_tokens, alpha_ratio, digit_ratio,
          CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1) AS stop_density,
          alpha_ratio * 0.5
            + least(CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1), 0.5) * 0.8
            + (CASE WHEN n_tokens BETWEEN 20 AND 10000 THEN 0.1 ELSE 0.0 END)
            - digit_ratio * 0.3 AS quality_score
        FROM m ORDER BY doc_id""")),

    CatalogQuery(
      "d03_langid",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            TextAnalysis.langid(col("text")).as("lang_pred"))
          .orderBy(col("doc_id")),
      Some(s"""WITH base AS (
          SELECT doc_id, lang, text, ' ' || replace(lower(text), ' ', '  ') || ' ' AS x
          FROM documents),
        sc AS (
          SELECT doc_id, lang,
            length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk,
            ${hitsSql("en")} AS en_h, ${hitsSql("de")} AS de_h,
            ${hitsSql("fr")} AS fr_h, ${hitsSql("es")} AS es_h
          FROM base)
        SELECT doc_id, lang,
          CASE WHEN cjk > 0 THEN 'zh'
               WHEN en_h >= de_h AND en_h >= fr_h AND en_h >= es_h THEN 'en'
               WHEN de_h >= fr_h AND de_h >= es_h THEN 'de'
               WHEN fr_h >= es_h THEN 'fr'
               ELSE 'es' END AS lang_pred
        FROM sc ORDER BY doc_id""")),

    CatalogQuery(
      "d04_fingerprint",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        FROM documents ORDER BY doc_id""")),

    CatalogQuery(
      "d05_minhash_portable",
      (s, dir) => {
        val shingles = Dedup.wordShingles(col("text"), 3)
        val sigCols = (0 until 8).map { seed =>
          aggregate(shingles, lit(Long.MaxValue),
            (acc, sh) => least(acc,
              conv(substring(md5(concat(lit(s"$seed:"), sh)), 1, 15), 16, 10).cast("long")))
            .as(s"h$seed")
        }
        t(s, dir, "documents")
          .select(col("doc_id") +: sigCols: _*)
          .orderBy(col("doc_id"))
      },
      Some {
        val hs = (0 until 8).map { seed =>
          s"list_min([CAST(('0x' || substr(md5('$seed:' || s), 1, 15)) AS BIGINT) FOR s IN shingles]) AS h$seed"
        }.mkString(",\n          ")
        s"""WITH w AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS words
          FROM documents),
        sh AS (
          SELECT doc_id,
            CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                 ELSE [array_to_string(words[i:i+2], ' ') FOR i IN generate_series(1, len(words) - 2)] END AS shingles
          FROM w)
        SELECT doc_id,
          $hs
        FROM sh ORDER BY doc_id"""
      }),

    CatalogQuery(
      "d06_ngram_jaccard_pairs",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), col("text"), substring(col("text"), 1, 30).as("pfx"))
        val a = d.as("a")
        val b = d.as("b")
        a.join(b, col("a.pfx") === col("b.pfx") && col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
            Dedup.ngramJaccard(col("a.text"), col("b.text"), 5).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH n AS (
          SELECT doc_id, substr(text, 1, 30) AS pfx,
            list_distinct(CASE WHEN length(text) < 5 THEN [text]
              ELSE [substring(text, i, 5) FOR i IN generate_series(1, length(text) - 4)] END) AS ng
          FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
            / len(list_distinct(list_concat(a.ng, b.ng))) AS jaccard
        FROM n a JOIN n b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
        ORDER BY id_a, id_b""")),

    // xxhash64-based ops: Spark-native hot path, no cross-engine oracle —
    // validated by unit tests + the driver's rows-only check.
    CatalogQuery(
      "d07_simhash_neardup",
      (s, dir) =>
        Dedup.simhashCandidatePairs(
            t(s, dir, "documents"), "doc_id", "text", maxHamming = 16)
          .orderBy(col("id_a"), col("id_b")),
      None),

    CatalogQuery(
      "d08_minhash_dedup",
      (s, dir) =>
        Dedup.minhashDedup(t(s, dir, "documents"), "doc_id", "text", threshold = 0.5)
          .select(col("doc_id"), col("dup_group"))
          .orderBy(col("doc_id")),
      None),

    // As-of join: most recent prior click for every purchase.
    CatalogQuery(
      "q28_asof_prior_click",
      (s, dir) => {
        val e = t(s, dir, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts"))
        AsOf.joinAsOf(purchases, clicks,
            keyCols = Seq("user_id"), leftTs = "ts", rightTs = "ts",
            rightCols = Seq("event_id"), rightTieBreak = "event_id")
          .select(col("user_id"), col("event_id"),
            col("asof_event_id").as("prior_click_id"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        j AS (SELECT p.user_id, p.event_id, c.event_id AS prior_click_id,
                row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
              FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts < p.ts)
        SELECT user_id, event_id, prior_click_id FROM j WHERE rn = 1
        ORDER BY event_id"""))
  )
}
