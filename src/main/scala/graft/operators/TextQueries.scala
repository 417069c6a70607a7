package graft.operators

import org.apache.spark.sql.functions._
import graft.ext.{AsOf, Classifier, Dedup, Drift, Parallelism, TextAnalysis}
import QueryDsl._

/** Training-data text operators as catalog queries over `documents`.
  * Oracle SQL mirrors each Spark expression exactly (incl. the DuckDB 'g'
  * regex flag — DuckDB replaces first-match by default, Spark replaces all).
  */
object TextQueries {

  // DuckDB fragments mirroring Classifier's micro-nats quantization:
  // ln(x) quantized to integer micro-nats, and the exact decimal scale
  // shift back to a DOUBLE (same shapes as Classifier.lnMicro/microShift).
  private def qMicroSql(x: String): String =
    s"CAST(CAST(ln($x) AS DECIMAL(28,6)) * 1000000 AS BIGINT)"
  private def shiftSql(m: String): String =
    s"CAST(CAST(CAST($m AS DECIMAL(20,0)) * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(26,6)) AS DOUBLE)"

  // DuckDB fragment: whole-word-occurrence count via space doubling.
  private def occSql(w: String): String =
    s"CAST((length(x) - length(replace(x, ' $w ', ''))) / ${w.length + 2} AS INTEGER)"
  private def hitsSql(lang: String): String =
    TextAnalysis.StopwordProfiles(lang).map(occSql).mkString(" + ")

  // Recursive-reachability connected components over the banded-minhash
  // candidate graph (threshold 0.5, 32 hashes, 8 bands) ending in
  // `comp(id, component)` — the oracle for minhashDedupCC, shared by d18
  // (groups) and d30 (leakage-safe split).
  private lazy val ccOracleCtes: String = {
    val hs = (0 until 32).map { seed =>
      s"list_min([CAST(('0x' || substr(md5('$seed:' || s), 1, 15)) AS BIGINT) FOR s IN shingles]) AS h$seed"
    }.mkString(", ")
    val sigList = (0 until 32).map(i => s"h$i").mkString("[", ", ", "]")
    val eq = (1 to 32)
      .map(i => s"(CASE WHEN sig_a[$i] = sig_b[$i] THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH RECURSIVE w AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS words
          FROM documents),
        sh AS (
          SELECT doc_id,
            CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                 ELSE [array_to_string(words[i:i+2], ' ') FOR i IN generate_series(1, len(words) - 2)] END AS shingles
          FROM w),
        hs AS (SELECT doc_id, $hs FROM sh),
        sig AS (SELECT doc_id, $sigList AS sig FROM hs),
        banded AS (SELECT doc_id, sig, bd,
                     array_to_string(sig[bd * 4 + 1 : bd * 4 + 4], '|') AS bk
                   FROM sig, (SELECT unnest(generate_series(0, 7)) AS bd)),
        pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.sig AS sig_a, b.sig AS sig_b
                  FROM banded a JOIN banded b
                    ON a.bd = b.bd AND a.bk = b.bk AND a.doc_id < b.doc_id),
        good AS (SELECT id_a, id_b FROM pairs
                 WHERE CAST($eq AS DOUBLE) / 32 >= 0.5),
        edges AS (SELECT id_a AS src, id_b AS dst FROM good
                  UNION SELECT id_b, id_a FROM good),
        reach AS (
          SELECT src AS id, dst AS r FROM edges
          UNION
          SELECT reach.id, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
        comp AS (SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id)"""
  }

  // Block-dedup oracle (first-occurrence winner per distinct block) —
  // shared by d27 (one-shot) and d31 (incremental index: two-batch
  // ingest in ascending id order must reproduce the one-shot result).
  private def blockDedupOracle(blockWords: Int): String = {
    val bw = blockWords
    s"""WITH nw AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
          FROM documents),
        w AS (
          SELECT doc_id, string_split(t, ' ') AS ws,
            CAST(CASE WHEN len(t) = 0 THEN 0 ELSE len(string_split(t, ' ')) END AS BIGINT) AS n_tokens
          FROM nw),
        ev AS (
          SELECT doc_id, ws, unnest(generate_series(0, (len(ws) + ${bw - 1}) // $bw - 1)) AS pos
          FROM w WHERE n_tokens > 0),
        b AS (
          SELECT doc_id, pos, array_to_string(ws[(pos*$bw+1):(pos*$bw+$bw)], ' ') AS blk
          FROM ev),
        h AS (
          SELECT doc_id, pos, blk,
            CAST(('0x' || substr(md5(blk), 1, 15)) AS BIGINT) AS h
          FROM b),
        win AS (
          SELECT h, min(struct_pack(i := doc_id, p := pos)) AS w FROM h GROUP BY h),
        k AS (
          SELECT h.doc_id, h.pos, h.blk,
            (h.doc_id = win.w.i AND h.pos = win.w.p) AS keep
          FROM h JOIN win USING (h)),
        per_doc AS (
          SELECT doc_id,
            count(*) AS n_blocks,
            sum(CASE WHEN keep THEN 1 ELSE 0 END) AS kept_blocks,
            sum(CASE WHEN keep THEN len(string_split(blk, ' ')) ELSE 0 END) AS kept_tokens,
            md5(coalesce(string_agg(blk, ' ' ORDER BY pos) FILTER (WHERE keep), '')) AS kept_md5
          FROM k GROUP BY doc_id)
        SELECT w.doc_id, w.n_tokens,
          CAST(coalesce(p.n_blocks, 0) AS BIGINT) AS n_blocks,
          CAST(coalesce(p.kept_blocks, 0) AS BIGINT) AS kept_blocks,
          CAST(coalesce(p.kept_tokens, 0) AS BIGINT) AS kept_tokens,
          CASE WHEN w.n_tokens = 0 THEN 0.0
               ELSE ${ratio6Sql("coalesce(p.kept_tokens, 0)", "w.n_tokens")} END AS kept_frac,
          coalesce(p.kept_md5, md5('')) AS kept_md5
        FROM w LEFT JOIN per_doc p USING (doc_id)
        ORDER BY w.doc_id"""
  }

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
            Parallelism.widen(t(s, dir, "documents"))
              .select(col("doc_id"), col("text")), "text")
          .drop("text")
          .orderBy(col("doc_id")),
      Some(s"""WITH base AS (
          SELECT doc_id, text, ' ' || regexp_replace(lower(text), '${TextAnalysis.WsClass}', '  ', 'g') || ' ' AS x
          FROM documents),
        m AS (
          SELECT doc_id, text, x,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE CAST(len(string_split_regex(trim(text), '${TextAnalysis.WsClass}+')) AS INTEGER) END AS n_tokens,
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

    // The doubled text is projected ONCE and langid's 20 stopword probes
    // run against that column — without the hoist every probe re-derives
    // the space-doubled text (a full-text regex pass each), and CASE WHEN
    // branches are excluded from Catalyst subexpression elimination.
    CatalogQuery(
      "d03_langid",
      (s, dir) =>
        Parallelism.widen(t(s, dir, "documents"))
          .select(col("doc_id"), col("lang"), col("text"),
            TextAnalysis.doubledText(col("text")).as("__x"))
          .select(col("doc_id"), col("lang"),
            TextAnalysis.langidIn(col("text"), col("__x")).as("lang_pred"))
          .orderBy(col("doc_id")),
      Some(s"""WITH base AS (
          SELECT doc_id, lang, text, ' ' || regexp_replace(lower(text), '${TextAnalysis.WsClass}', '  ', 'g') || ' ' AS x
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

    // Portable minhash signatures: per-seed md5-derived 60-bit hashes
    // (see Dedup.minhashSignaturesDf) — mirrored exactly by the oracle.
    CatalogQuery(
      "d05_minhash_portable",
      (s, dir) => {
        val sigs = Dedup.minhashSignaturesDf(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, shingleSize = 3, portable = true)
        sigs.select(col("id").as("doc_id") +:
            (0 until 8).map(i => element_at(col("sig"), i + 1).as(s"h$i")): _*)
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

    // Portable simhash: 60-bit md5-derived token hashes, 6 x 10-bit bands
    // (guaranteed recall for hamming <= 5 by pigeonhole), exact-hamming
    // filter — mirrored step-for-step by the DuckDB oracle.
    CatalogQuery(
      "d07_simhash_neardup",
      (s, dir) =>
        Dedup.simhashCandidatePairs(
            t(s, dir, "documents"), "doc_id", "text", maxHamming = 5, portable = true)
          .orderBy(col("id_a"), col("id_b")),
      Some {
        val bitSums = (0 until 60)
          .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
          .mkString(", ")
        val pack = (0 until 60)
          .map(i => s"(CASE WHEN b$i > 0 THEN (CAST(1 AS BIGINT) << $i) ELSE 0 END)")
          .mkString(" + ")
        s"""WITH base AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
          FROM documents),
        tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS tkn FROM base),
        h AS (SELECT doc_id, CAST(('0x' || substr(md5(tkn), 1, 15)) AS BIGINT) AS h FROM tok),
        v AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
        s AS (SELECT doc_id, $pack AS sim FROM v),
        banded AS (SELECT doc_id, sim, bd, (sim >> (bd * 10)) & 1023 AS bk
                   FROM s, (SELECT unnest(generate_series(0, 5)) AS bd)),
        pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.sim AS sim_a, b.sim AS sim_b
                  FROM banded a JOIN banded b
                    ON a.bd = b.bd AND a.bk = b.bk AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
        FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= 5
        ORDER BY id_a, id_b"""
      }),

    // Portable minhash dedup: 32 md5-derived min-hashes, 8 bands of 4,
    // est-Jaccard >= 0.5, star-clustering group representative (single
    // min-propagation pass) — the full pipeline mirrored in DuckDB.
    CatalogQuery(
      "d08_minhash_dedup",
      (s, dir) =>
        Dedup.minhashDedup(t(s, dir, "documents"), "doc_id", "text",
            threshold = 0.5, numHashes = 32, bands = 8, portable = true)
          .select(col("doc_id"), col("dup_group"))
          .orderBy(col("doc_id")),
      Some {
        val hs = (0 until 32).map { seed =>
          s"list_min([CAST(('0x' || substr(md5('$seed:' || s), 1, 15)) AS BIGINT) FOR s IN shingles]) AS h$seed"
        }.mkString(", ")
        val sigList = (0 until 32).map(i => s"h$i").mkString("[", ", ", "]")
        val eq = (1 to 32)
          .map(i => s"(CASE WHEN sig_a[$i] = sig_b[$i] THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH w AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS words
          FROM documents),
        sh AS (
          SELECT doc_id,
            CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                 ELSE [array_to_string(words[i:i+2], ' ') FOR i IN generate_series(1, len(words) - 2)] END AS shingles
          FROM w),
        hs AS (SELECT doc_id, $hs FROM sh),
        sig AS (SELECT doc_id, $sigList AS sig FROM hs),
        banded AS (SELECT doc_id, sig, bd,
                     array_to_string(sig[bd * 4 + 1 : bd * 4 + 4], '|') AS bk
                   FROM sig, (SELECT unnest(generate_series(0, 7)) AS bd)),
        pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.sig AS sig_a, b.sig AS sig_b
                  FROM banded a JOIN banded b
                    ON a.bd = b.bd AND a.bk = b.bk AND a.doc_id < b.doc_id),
        good AS (SELECT id_a, id_b FROM pairs
                 WHERE CAST($eq AS DOUBLE) / 32 >= 0.5),
        rep AS (SELECT id_b AS doc_id, min(id_a) AS rep FROM good GROUP BY 1)
        SELECT d.doc_id, least(coalesce(r.rep, d.doc_id), d.doc_id) AS dup_group
        FROM documents d LEFT JOIN rep r USING (doc_id) ORDER BY d.doc_id"""
      }),

    // BPE-ish token budgeting: letter runs + 1-3-digit chunks + punct runs,
    // with fertility (subword tokens per whitespace word).
    CatalogQuery(
      "d09_bpe_tokens",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
            TextAnalysis.tokenCount(col("text")).as("n_words"))
          .withColumn("fertility",
            col("n_bpe").cast("double") / greatest(col("n_words"), lit(1)))
          .orderBy(col("doc_id")),
      Some(s"""WITH m AS (
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '${TextAnalysis.BpeTokenPattern}')) AS INTEGER) AS n_bpe,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE CAST(len(string_split_regex(trim(text), '${TextAnalysis.WsClass}+')) AS INTEGER) END AS n_words
          FROM documents)
        SELECT doc_id, n_bpe, n_words,
          CAST(n_bpe AS DOUBLE) / greatest(n_words, 1) AS fertility
        FROM m ORDER BY doc_id""")),

    // Corpus vocabulary: explode normalized tokens, top-50 by frequency
    // (deterministic tie-break on the token) — the explode/lateral-view
    // shape every corpus-stats pipeline runs.
    CatalogQuery(
      "d10_top_tokens",
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(split(TextAnalysis.normalize(col("text")), " ")).as("token"))
          .filter(length(col("token")) > 0)
          .groupBy("token")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(50),
      Some("""WITH tok AS (
          SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
          FROM documents)
        SELECT token, count(*) AS n FROM tok WHERE length(token) > 0
        GROUP BY token ORDER BY n DESC, token LIMIT 50""")),

    // The production shape of quality scoring: FILTER the corpus on the
    // metric thresholds (keep docs worth training on), not just annotate.
    CatalogQuery(
      "d11_quality_filter",
      (s, dir) =>
        TextAnalysis.qualityFiltered(
            t(s, dir, "documents").select(col("doc_id"), col("text")), "text",
            minScore = 0.55, minTokens = 5, maxTokens = 5000, maxDigitRatio = 0.3)
          .select(col("doc_id"), col("n_tokens"), col("quality_score"))
          .orderBy(col("doc_id")),
      Some(s"""WITH base AS (
          SELECT doc_id, text, ' ' || regexp_replace(lower(text), '${TextAnalysis.WsClass}', '  ', 'g') || ' ' AS x
          FROM documents),
        m AS (
          SELECT doc_id,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE CAST(len(string_split_regex(trim(text), '${TextAnalysis.WsClass}+')) AS INTEGER) END AS n_tokens,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) END AS digit_ratio,
            ${hitsSql("en")} AS stop_hits
          FROM base),
        q AS (
          SELECT doc_id, n_tokens, digit_ratio,
            alpha_ratio * 0.5
              + least(CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1), 0.5) * 0.8
              + (CASE WHEN n_tokens BETWEEN 20 AND 10000 THEN 0.1 ELSE 0.0 END)
              - digit_ratio * 0.3 AS quality_score
          FROM m)
        SELECT doc_id, n_tokens, quality_score FROM q
        WHERE quality_score >= 0.55 AND n_tokens BETWEEN 5 AND 5000 AND digit_ratio < 0.3
        ORDER BY doc_id""")),

    // One-line corpus report: docs, tokens, vocabulary, mean doc length —
    // the numbers every dataset card leads with.
    CatalogQuery(
      "d12_corpus_stats",
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(TextAnalysis.normalize(col("text")), " ")).as("token"))
          .filter(length(col("token")) > 0)
        tok.agg(
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_tokens"),
          countDistinct(col("token")).as("vocab"),
          (count(lit(1)).cast("double") / countDistinct(col("doc_id"))).as("mean_doc_tokens"))
      },
      Some("""WITH tok AS (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
          FROM documents)
        SELECT count(DISTINCT doc_id) AS n_docs, count(*) AS n_tokens,
          count(DISTINCT token) AS vocab,
          CAST(count(*) AS DOUBLE) / count(DISTINCT doc_id) AS mean_doc_tokens
        FROM tok WHERE length(token) > 0""")),

    // PII scrub: per-doc match counts for each PII shape + the redacted
    // text — the compliance pass every training corpus runs before
    // anything else sees the bytes. Pure codegen'd regex, no UDF.
    CatalogQuery(
      "d13_pii_redaction",
      (s, dir) =>
        Parallelism.widen(t(s, dir, "documents")) // 7 regex passes per row
          .select(col("doc_id"),
            TextAnalysis.piiCount(col("text"), TextAnalysis.EmailPattern).as("n_emails"),
            TextAnalysis.piiCount(col("text"), TextAnalysis.Ipv4Pattern).as("n_ips"),
            TextAnalysis.piiCount(col("text"), TextAnalysis.PhonePattern).as("n_phones"),
            TextAnalysis.redactPii(col("text")).as("redacted"))
          .withColumn("has_pii", (col("n_emails") + col("n_ips") + col("n_phones")) > 0)
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
          CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
          CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS INTEGER) AS n_phones,
          regexp_replace(
            regexp_replace(
              regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
            '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted,
          (CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
            + CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER)
            + CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS INTEGER)) > 0 AS has_pii
        FROM documents ORDER BY doc_id""")),

    // Sliding-window chunking: 64-token chunks, stride 48 — the context-
    // window prep step between cleaning and tokenization. Chunk COUNT per
    // doc is tokens/stride, so the interpreted transform/slice lambdas run
    // once per CHUNK (cheap), not per token; the explode itself is the
    // same posexplode shape as d10/d12.
    CatalogQuery(
      "d14_doc_chunks",
      (s, dir) =>
        TextAnalysis.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
            chunkSize = 64, stride = 48)
          .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH t AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
          FROM documents
          WHERE length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) > 0),
        n AS (
          SELECT doc_id, toks,
            greatest(1, CAST(ceil((len(toks) - 64)::DOUBLE / 48) + 1 AS INTEGER)) AS n_chunks
          FROM t),
        x AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS i FROM n)
        SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
          array_to_string(toks[i*48+1 : i*48+64], ' ') AS chunk
        FROM x ORDER BY doc_id, chunk_idx""")),

    // Deterministic stratified sampling: per-language rates via a
    // portable hash bucket of the doc id — the same rows come back on
    // every run, any engine, any partitioning; no shuffle, no RNG state.
    // At 100 TB this is a pure scan+filter (sampling that repartitions or
    // seeds per-task RNG is neither reproducible nor cheap).
    CatalogQuery(
      "d15_stratified_sample",
      (s, dir) => {
        val bucket = pmod(
          TextAnalysis.portableHash60(col("doc_id").cast("string")), lit(1000))
        val rateMille = when(col("lang") === "en", 100)
          .when(col("lang") === "de", 500)
          .when(col("lang") === "es", 250)
          .otherwise(1000) // fr, zh: keep all
        t(s, dir, "documents")
          .filter(bucket < rateMille)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
          < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 500 WHEN 'es' THEN 250 ELSE 1000 END
        ORDER BY doc_id""")),

    // Sequence packing: greedily pack docs into fixed token budgets per
    // language stratum via a running-sum window — assigns every doc its
    // training-sequence id without materializing the packed text. One
    // keyed window (= one shuffle on lang), deterministic order.
    CatalogQuery(
      "d16_sequence_packing",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens"))
          .withColumn("cum_before",
            coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            floor(col("cum_before") / 2048.0).cast("int").as("pack_id"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH m AS (
          SELECT doc_id, lang,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE CAST(len(string_split_regex(trim(text), '${TextAnalysis.WsClass}+')) AS INTEGER) END AS n_tokens
          FROM documents),
        c AS (
          SELECT doc_id, lang, n_tokens,
            COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM m)
        SELECT doc_id, lang, n_tokens,
          CAST(floor(cum_before / 2048.0) AS INTEGER) AS pack_id
        FROM c ORDER BY doc_id""")),

    // Frequency-based quality: per-doc negative log-likelihood under the
    // corpus's own unigram LM — high = surprising (gibberish/rare-token
    // soup), low = boilerplate. Per-token log-probs quantize to integer
    // micro-nats and the avg rounds half-up in INTEGER math — sum/count
    // lands exactly on scale-6 midpoints, where Spark's and DuckDB's
    // double→decimal casts round differently (r4 hash-fail; see
    // TextAnalysis.unigramNll).
    CatalogQuery(
      "d19_unigram_nll",
      (s, dir) =>
        TextAnalysis.unigramNll(t(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""WITH tok AS (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
          FROM documents),
        t2 AS (SELECT doc_id, token FROM tok WHERE length(token) > 0),
        freq AS (SELECT token, count(*) AS n FROM t2 GROUP BY 1),
        tot AS (SELECT sum(n) AS N FROM freq),
        per AS (
          SELECT doc_id,
            CAST(CAST(ln(CAST(f.n AS DOUBLE) / CAST(t.N AS DOUBLE)) AS DECIMAL(28,6))
              * 1000000 AS BIGINT) AS lp_micro
          FROM t2 JOIN freq f USING (token) CROSS JOIN tot t),
        agg AS (SELECT doc_id, count(*) AS n_tokens, -sum(lp_micro) AS m FROM per GROUP BY 1)
        SELECT doc_id, n_tokens,
          CAST(CAST(CAST((2 * m + n_tokens) // (2 * n_tokens) AS DECIMAL(12,0))
            * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(18,6)) AS DOUBLE) AS unigram_nll
        FROM agg ORDER BY doc_id""")),

    // CCNet-style perplexity-band sampling: keep the middle-NLL half of
    // the corpus (low = boilerplate, high = gibberish). Band edges are
    // integer ORDER STATISTICS over the micro-NLL histogram — interpolated
    // percentiles differ across engines in the last ulp and flip boundary
    // docs (the d19 class); order statistics are exact everywhere.
    CatalogQuery(
      "d21_nll_band",
      (s, dir) =>
        TextAnalysis.unigramNllBand(t(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""WITH tok AS (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
          FROM documents),
        t2 AS (SELECT doc_id, token FROM tok WHERE length(token) > 0),
        freq AS (SELECT token, count(*) AS n FROM t2 GROUP BY 1),
        tot AS (SELECT sum(n) AS N FROM freq),
        per AS (
          SELECT doc_id,
            CAST(CAST(ln(CAST(f.n AS DOUBLE) / CAST(t.N AS DOUBLE)) AS DECIMAL(28,6))
              * 1000000 AS BIGINT) AS lp_micro
          FROM t2 JOIN freq f USING (token) CROSS JOIN tot t),
        agg AS (SELECT doc_id, count(*) AS n_tokens, -sum(lp_micro) AS m FROM per GROUP BY 1),
        mi AS (SELECT doc_id, n_tokens,
                 (2 * m + n_tokens) // (2 * n_tokens) AS micro FROM agg),
        h AS (SELECT micro, count(*) AS c FROM mi GROUP BY 1),
        cu AS (SELECT micro,
                 sum(c) OVER (ORDER BY micro ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM h),
        nn AS (SELECT count(*) AS n FROM mi),
        th AS (SELECT min(CASE WHEN cum > (n - 1) // 4 THEN micro END) AS v25,
                      min(CASE WHEN cum > (3 * (n - 1)) // 4 THEN micro END) AS v75
               FROM cu, nn)
        SELECT doc_id, n_tokens,
          CAST(CAST(CAST(micro AS DECIMAL(12,0))
            * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(18,6)) AS DOUBLE) AS unigram_nll
        FROM mi, th
        WHERE micro BETWEEN v25 AND v75 ORDER BY doc_id""")),

    // Gopher-style repetition metrics: the boilerplate/template-spam
    // signal exact dedup misses. Unigram + bigram duplication shares per
    // doc; ratios rounded half-up in exact integer math (ratio6) so both
    // engines compute the identical DECIMAL.
    CatalogQuery(
      "d20_repetition",
      (s, dir) =>
        TextAnalysis.repetitionMetrics(t(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(s"""WITH tokl AS (
          SELECT doc_id,
            list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
              x -> length(x) > 0) AS l
          FROM documents),
        tok AS (SELECT doc_id, unnest(l) AS tok FROM tokl),
        uni AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS nd, max(c) AS top
          FROM (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2) GROUP BY 1),
        bigl AS (
          SELECT doc_id, [l[i] || ' ' || l[i + 1] FOR i IN generate_series(1, len(l) - 1)] AS bl
          FROM tokl WHERE len(l) >= 2),
        big AS (SELECT doc_id, unnest(bl) AS big FROM bigl),
        bagg AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_big, count(*) AS nd_big, max(c) AS top_big
          FROM (SELECT doc_id, big, count(*) AS c FROM big GROUP BY 1, 2) GROUP BY 1)
        SELECT u.doc_id, u.n_tokens,
          ${ratio6Sql("nd", "n_tokens")} AS distinct_frac,
          ${ratio6Sql("top", "n_tokens")} AS top_token_frac,
          ${ratio6Sql("n_big - nd_big", "n_big")} AS dup_bigram_frac,
          ${ratio6Sql("top_big", "n_big")} AS top_bigram_frac
        FROM uni u LEFT JOIN bagg b USING (doc_id) ORDER BY doc_id""")),

    // Exact duplicate-span detection (Lee et al. substring dedup): word
    // 5-grams occurring in >= 2 distinct docs, per-doc span coverage.
    // Only (id, pos, hash) ever crosses a shuffle — never text.
    CatalogQuery(
      "d22_dup_spans",
      (s, dir) =>
        Dedup.dupSpans(t(s, dir, "documents"), "doc_id", "text",
            n = 5, portable = true)
          .orderBy(col("doc_id")),
      Some(s"""WITH w AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS l
          FROM documents),
        base AS (
          SELECT doc_id,
            CAST(CASE WHEN len(l) = 1 AND l[1] = '' THEN 0 ELSE len(l) END AS BIGINT) AS n_tokens
          FROM w),
        ev AS (
          SELECT doc_id, l, unnest(generate_series(1, len(l) - 4)) AS i
          FROM w WHERE len(l) >= 5),
        ng AS (
          SELECT doc_id, i,
            CAST(('0x' || substr(md5(array_to_string(l[i:i+4], ' ')), 1, 15)) AS BIGINT) AS h
          FROM ev),
        dup AS (
          SELECT h FROM (SELECT h, doc_id FROM ng GROUP BY 1, 2)
          GROUP BY h HAVING count(*) >= 2),
        dng AS (SELECT doc_id, i FROM ng JOIN dup USING (h)),
        per_doc AS (SELECT doc_id, count(*) AS dup_ngrams FROM dng GROUP BY 1),
        cov AS (
          SELECT doc_id, count(DISTINCT i + x) AS covered_tokens
          FROM (SELECT doc_id, i, unnest(generate_series(0, 4)) AS x FROM dng)
          GROUP BY 1)
        SELECT b.doc_id, b.n_tokens,
          coalesce(p.dup_ngrams, 0) AS dup_ngrams,
          coalesce(c.covered_tokens, 0) AS covered_tokens,
          ${ratio6Sql("coalesce(c.covered_tokens, 0)", "b.n_tokens")} AS covered_frac
        FROM base b
        LEFT JOIN per_doc p USING (doc_id)
        LEFT JOIN cov c USING (doc_id)
        ORDER BY b.doc_id""")),

    // Benchmark decontamination: corpus docs sharing word 3-grams with a
    // held-out "eval" slice (doc_id % 97 == 0 stands in for the benchmark
    // table). Eval side broadcast; only (id, hash) crosses any wire.
    CatalogQuery(
      "d17_eval_contamination",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.ngramContamination(
            corpus = docs.filter(col("doc_id") % 97 =!= 0),
            evalSet = docs.filter(col("doc_id") % 97 === 0),
            idCol = "doc_id", textCol = "text",
            shingleSize = 3, minOverlap = 2L, portable = true)
          .orderBy(col("corpus_id"), col("eval_id"))
      },
      Some("""WITH w AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS words
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                 ELSE [array_to_string(words[i:i+2], ' ') FOR i IN generate_series(1, len(words) - 2)] END) AS shingles
          FROM w),
        u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        h AS (SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM u),
        c AS (SELECT doc_id AS corpus_id, h FROM h WHERE doc_id % 97 <> 0),
        e AS (SELECT doc_id AS eval_id, h FROM h WHERE doc_id % 97 = 0),
        es AS (SELECT eval_id, count(*) AS n_eval FROM e GROUP BY 1),
        ov AS (SELECT corpus_id, eval_id, count(*) AS n_overlap
               FROM c JOIN e USING (h) GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT corpus_id, eval_id, n_overlap,
          CAST(n_overlap AS DOUBLE) / n_eval AS eval_frac
        FROM ov JOIN es USING (eval_id)
        ORDER BY corpus_id, eval_id""")),

    // TRANSITIVE near-dup groups: true connected components of the LSH
    // candidate graph (A~B, B~C puts A,C together even when they never
    // share a bucket) — min-label propagation on the engine side, a
    // recursive reachability CTE on the oracle side.
    CatalogQuery(
      "d18_minhash_dedup_cc",
      (s, dir) =>
        Dedup.minhashDedupCC(t(s, dir, "documents"), "doc_id", "text",
            threshold = 0.5, numHashes = 32, bands = 8, portable = true)
          .select(col("doc_id"), col("dup_group"))
          .orderBy(col("doc_id")),
      Some(s"""$ccOracleCtes
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS dup_group
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        ORDER BY d.doc_id""")),

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
        ORDER BY event_id""")),

    // Per-doc top-3 TF-IDF keywords (topic tagging / domain routing).
    // IDF quantized to integer micro-units BEFORE the tf multiply — the
    // d19 portability discipline — so score_micro is exact BIGINT math.
    CatalogQuery(
      "d24_tfidf_terms",
      (s, dir) =>
        TextAnalysis.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", topK = 3)
          .orderBy(col("doc_id"), col("rnk")),
      Some("""WITH tok AS (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
          FROM documents),
        t2 AS (SELECT doc_id, token FROM tok WHERE length(token) > 0),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM t2 GROUP BY 1, 2),
        dfq AS (SELECT token, count(*) AS dfc FROM tf GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM documents),
        sc AS (SELECT doc_id, token,
                 tf * CAST(CAST(ln(CAST(n AS DOUBLE) / CAST(dfc AS DOUBLE)) AS DECIMAL(28,6))
                   * 1000000 AS BIGINT) AS score_micro
               FROM tf JOIN dfq USING (token) CROSS JOIN nn),
        r AS (SELECT doc_id, token, score_micro,
                row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, token) AS rn
              FROM sc)
        SELECT doc_id, CAST(rn AS INTEGER) AS rnk, token, score_micro
        FROM r WHERE rn <= 3 ORDER BY doc_id, rnk""")),

    // Deterministic domain-mixture sampling: hit target language weights
    // exactly, sized by the scarcest stratum, selected by portable hash
    // order. Engine side selects via a bounded bucket histogram (no
    // per-stratum global rank); the oracle's per-stratum row_number is
    // the same selection because the bucket is the hash's top 16 bits.
    CatalogQuery(
      "d23_domain_mixture",
      (s, dir) =>
        TextAnalysis.mixtureSample(t(s, dir, "documents"), "doc_id", "lang",
            weightsPpm = Map("en" -> 400000L, "de" -> 150000L, "es" -> 150000L,
              "fr" -> 150000L, "zh" -> 150000L))
          .orderBy(col("doc_id")),
      Some("""WITH w(lang, wppm) AS (VALUES
            ('de', 150000), ('en', 400000), ('es', 150000), ('fr', 150000), ('zh', 150000)),
        h AS (SELECT doc_id, lang,
                CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
              FROM documents JOIN w USING (lang)),
        cnt AS (SELECT lang, wppm, count(*) AS n
                FROM documents JOIN w USING (lang) GROUP BY 1, 2),
        tt AS (SELECT min((n * 1000000) // wppm) AS t FROM cnt),
        k AS (SELECT lang, (wppm * t) // 1000000 AS keep FROM cnt, tt),
        r AS (SELECT doc_id, lang,
                row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
              FROM h)
        SELECT doc_id, lang FROM r JOIN k USING (lang) WHERE rn <= keep
        ORDER BY doc_id""")),

    // Count-min-sketch heavy hitters — the third sketch family (q29 HLL,
    // q43 quantiles, here CMS). Exact top-10 token counts hash-match;
    // Spark's CMS estimate must land within 5% of each exact count
    // (CMS over-counts by <= eps*N w.h.p.; eps=1e-3 against top counts
    // ~N/20 leaves 2.5x headroom, so the boolean is a sketch-quality
    // canary, not a flake). DuckDB ships no CMS — its boolean is the
    // trivial TRUE, same one-sided oracle shape as q29's HLL bound.
    // The sketch collect is metadata-plane (one binary row); the
    // estimate probe runs over exactly 10 rows.
    CatalogQuery(
      "d25_cms_heavy_hitters",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tok = t(s, dir, "documents")
          .select(explode(split(TextAnalysis.normalize(col("text")), " ")).as("token"))
          .filter(length(col("token")) > 0)
          .transform(graft.ext.Parallelism.checkpointTracked) // feeds the exact counts AND the sketch
        val exact = tok.groupBy(col("token")).agg(count(lit(1)).as("n"))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("n").desc, col("token"))))
          .filter(col("rnk") <= 10)
        // args are (eps, CONFIDENCE, seed): confidence 0.99 -> depth 7
        // hash rows (0.01 would mean depth 1 — a single row whose
        // over-count bound holds only with probability ~1/2, flipping the
        // boolean on unlucky distributions)
        val sketchBytes = tok
          .agg(count_min_sketch(col("token"), lit(0.001), lit(0.99), lit(42)).as("s"))
          .head().getAs[Array[Byte]](0)
        // deserialize ONCE; CountMinSketch is serializable, so the UDF
        // closure ships the ready sketch, not bytes to re-parse per call
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(sketchBytes))
        val est = udf((t: String) => cms.estimateCount(t))
        exact.withColumn("__est", est(col("token")))
          .select(col("token"), col("n"), col("rnk"),
            (col("__est") >= col("n") &&
              col("__est") <= (col("n") * 1.05).cast("long")).as("cms_within_5pct"))
          .orderBy(col("rnk"))
      },
      Some("""WITH tok AS (
          SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
          FROM documents),
        t2 AS (SELECT token FROM tok WHERE length(token) > 0),
        c AS (SELECT token, count(*) AS n FROM t2 GROUP BY 1),
        r AS (SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rn FROM c)
        SELECT token, n, CAST(rn AS INTEGER) AS rnk, true AS cms_within_5pct
        FROM r WHERE rn <= 10 ORDER BY rnk""")),

    // The persisted-index dedup path: ingest the corpus in two batches
    // (evens, then odds) through NearDupIndex — each batch detects against
    // everything indexed so far plus itself, without re-hashing the
    // corpus. The oracle derives the SAME pair set from d08's banded
    // CTEs: a same-parity pair surfaces in its own batch (higher id is
    // the newcomer), a mixed-parity pair surfaces in batch 2 (the odd id
    // is the newcomer, whatever the id order).
    CatalogQuery(
      "d26_neardup_index",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val tmp = java.nio.file.Files.createTempDirectory("graft-d26-").toString
        // throwaway index: no file stats (nothing ever data-skips it)
        implicit val st: graft.conf.GraftSettings =
          graft.conf.GraftSettings.default.copy(collectFileStats = false)
        val idx = new graft.ext.NearDupIndex(s, s"file://$tmp",
          numHashes = 32, bands = 8, shingleSize = 3, threshold = 0.5,
          portable = true)
        // detectAndAdd localCheckpoints its result before returning, so
        // the scratch index can be dropped once both batches ran
        val first = idx.detectAndAdd(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        val second = idx.detectAndAdd(docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        first.unionByName(second)
          .orderBy(col("id_new"), col("id_matched"))
      },
      Some {
        val hs = (0 until 32).map { seed =>
          s"list_min([CAST(('0x' || substr(md5('$seed:' || s), 1, 15)) AS BIGINT) FOR s IN shingles]) AS h$seed"
        }.mkString(", ")
        val sigList = (0 until 32).map(i => s"h$i").mkString("[", ", ", "]")
        val eq = (1 to 32)
          .map(i => s"(CASE WHEN sig_a[$i] = sig_b[$i] THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH w AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS words
          FROM documents),
        sh AS (
          SELECT doc_id,
            CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
                 ELSE [array_to_string(words[i:i+2], ' ') FOR i IN generate_series(1, len(words) - 2)] END AS shingles
          FROM w),
        hs AS (SELECT doc_id, $hs FROM sh),
        sig AS (SELECT doc_id, $sigList AS sig FROM hs),
        banded AS (SELECT doc_id, sig, bd,
                     array_to_string(sig[bd * 4 + 1 : bd * 4 + 4], '|') AS bk
                   FROM sig, (SELECT unnest(generate_series(0, 7)) AS bd)),
        pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.sig AS sig_a, b.sig AS sig_b
                  FROM banded a JOIN banded b
                    ON a.bd = b.bd AND a.bk = b.bk AND a.doc_id < b.doc_id),
        good AS (SELECT id_a, id_b, CAST($eq AS DOUBLE) / 32 AS est FROM pairs
                 WHERE CAST($eq AS DOUBLE) / 32 >= 0.5),
        dirn AS (SELECT
                   CASE WHEN id_a % 2 = id_b % 2 THEN greatest(id_a, id_b)
                        WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS id_new,
                   CASE WHEN id_a % 2 = id_b % 2 THEN least(id_a, id_b)
                        WHEN id_a % 2 = 1 THEN id_b ELSE id_a END AS id_matched,
                   est AS est_jaccard
                 FROM good)
        SELECT id_new, id_matched, est_jaccard FROM dirn
        ORDER BY id_new, id_matched"""
      }),

    // Corpus-wide exact block dedup (paragraph dedup, RefinedWeb/Dolma
    // style): each distinct 8-word block survives only at its globally
    // first (doc, pos) occurrence; the per-doc output reconstructs what
    // remains (kept counts + md5 of the surviving text). One hash-keyed
    // vote shuffle + one doc-keyed reconstruction shuffle — never
    // all-pairs, no per-key windows.
    CatalogQuery(
      "d27_block_dedup",
      (s, dir) =>
        Dedup.blockDedup(t(s, dir, "documents"), "doc_id", "text",
            blockWords = 8, portable = true)
          .orderBy(col("doc_id")),
      Some(blockDedupOracle(blockWords = 8))),

    // BPE tokenizer training, iteration 0: frequency-weighted adjacent
    // symbol-pair counts (chars + '</w>' end-of-word symbol) over the
    // DISTINCT-WORD vocabulary — the corpus is touched once by the word
    // count; pair work is vocab-sized, as in real BPE trainers. Top-20
    // merge candidates, deterministic tie-break.
    CatalogQuery(
      "d28_bpe_pairs",
      (s, dir) =>
        graft.ext.Bpe.pairCounts(t(s, dir, "documents"), "text", topK = 20)
          .orderBy(col("rnk")),
      Some("""WITH toks AS (
          SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
          FROM documents),
        wc AS (SELECT w, count(*) AS wc FROM toks WHERE len(w) > 0 GROUP BY w),
        inner_p AS (
          SELECT substr(w, i, 1) AS left_sym, substr(w, i + 1, 1) AS right_sym, wc
          FROM (SELECT w, wc, unnest(generate_series(1, len(w) - 1)) AS i
                FROM wc WHERE len(w) >= 2)),
        eow_p AS (
          SELECT substr(w, len(w), 1) AS left_sym, '</w>' AS right_sym, wc FROM wc),
        p AS (
          SELECT left_sym, right_sym, CAST(sum(wc) AS BIGINT) AS pair_count
          FROM (SELECT * FROM inner_p UNION ALL SELECT * FROM eow_p)
          GROUP BY 1, 2),
        k AS (SELECT left_sym, right_sym, pair_count,
                row_number() OVER (ORDER BY pair_count DESC, left_sym, right_sym) AS rn
              FROM p)
        SELECT CAST(rn AS INTEGER) AS rnk, left_sym, right_sym, pair_count
        FROM k WHERE rn <= 20 ORDER BY rnk""")),

    // Per-source curation dashboard — the standard pretraining per-domain
    // report: volume, exact-dup rate (fingerprint), mean length, short-doc
    // share. One scan, one hash aggregate; every ratio in exact integer
    // math (ratio6).
    CatalogQuery(
      "d29_source_report",
      (s, dir) =>
        Parallelism.widen(t(s, dir, "documents"))
          .select(col("source"),
            TextAnalysis.fingerprint(col("text")).as("__fp"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("__nt"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("__fp")).as("n_unique"),
            sum(col("__nt")).as("total_tokens"),
            sum(when(col("__nt") < 20, lit(1L)).otherwise(lit(0L))).as("__nshort"))
          .select(col("source"), col("n_docs"), col("n_unique"),
            ratio6(col("n_docs") - col("n_unique"), col("n_docs")).as("dup_frac"),
            col("total_tokens"),
            ratio6(col("total_tokens"), col("n_docs")).as("mean_tokens"),
            ratio6(col("__nshort"), col("n_docs")).as("short_frac"))
          .orderBy(col("source")),
      Some(s"""WITH m AS (
          SELECT source,
            md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
            CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
                 ELSE CAST(len(string_split_regex(trim(text), '${TextAnalysis.WsClass}+')) AS BIGINT) END AS nt
          FROM documents),
        a AS (
          SELECT source, count(*) AS n_docs, count(DISTINCT fp) AS n_unique,
            CAST(sum(nt) AS BIGINT) AS total_tokens,
            CAST(sum(CASE WHEN nt < 20 THEN 1 ELSE 0 END) AS BIGINT) AS nshort
          FROM m GROUP BY 1)
        SELECT source, n_docs, n_unique,
          ${ratio6Sql("n_docs - n_unique", "n_docs")} AS dup_frac,
          total_tokens,
          ${ratio6Sql("total_tokens", "n_docs")} AS mean_tokens,
          ${ratio6Sql("nshort", "n_docs")} AS short_frac
        FROM a ORDER BY source""")),

    // Leakage-safe train/val/test split: the 80/10/10 assignment hashes
    // the NEAR-DUP GROUP representative, so transitive near-duplicates
    // can never straddle a split boundary — the eval-contamination leak
    // a per-document hash split silently commits. Append-stable: new
    // docs joining an existing group inherit its split.
    CatalogQuery(
      "d30_leakage_safe_split",
      (s, dir) =>
        Dedup.leakageSafeSplit(t(s, dir, "documents"), "doc_id", "text",
            threshold = 0.5, numHashes = 32, bands = 8,
            trainPct = 80, valPct = 10, portable = true)
          .orderBy(col("doc_id")),
      Some(s"""$ccOracleCtes,
        g AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS dup_group
              FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
        b AS (SELECT doc_id, dup_group,
                CAST(('0x' || substr(md5('split:' || CAST(dup_group AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bk
              FROM g)
        SELECT doc_id, dup_group,
          CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val' ELSE 'test' END AS split
        FROM b ORDER BY doc_id""")),

    // The persisted-index path of the SAME computation as d27: ingest the
    // corpus as two batches (ascending id order) into a BlockDedupIndex —
    // the combined per-doc output must reproduce the one-shot blockDedup
    // result exactly, so d27's oracle gates the index build/probe/append
    // machinery too (the d26/e12 pattern).
    CatalogQuery(
      "d31_block_dedup_index",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val tmp = java.nio.file.Files.createTempDirectory("graft-d31-").toString
        // throwaway index: no file stats (nothing ever data-skips it)
        implicit val st: graft.conf.GraftSettings =
          graft.conf.GraftSettings.default.copy(collectFileStats = false)
        val idx = new graft.ext.BlockDedupIndex(s, s"file://$tmp",
          blockWords = 8, portable = true)
        val out1 = idx.detectAndAdd(docs.filter(col("doc_id") < 250), "doc_id", "text")
        val out2 = idx.detectAndAdd(docs.filter(col("doc_id") >= 250), "doc_id", "text")
        val out = out1.unionByName(out2)
          .orderBy(col("doc_id"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch index
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some(blockDedupOracle(blockWords = 8)))
  ,

    // WARC ingestion — the crawl-archive source format. Fixture: each
    // documents partition serializes to one gzip-per-record WARC blob
    // (the Common Crawl layout) via Warc.write; the OPERATOR under test
    // is Warc.recordsExploded, a partition-local explode of archive
    // bytes into records (no shuffle of payloads). Round-tripping
    // through real container bytes gates header parsing, multi-member
    // gzip, Content-Length framing and payload integrity (md5). The
    // oracle derives the same (uri, md5, length) rows straight from the
    // documents table.
    CatalogQuery(
      "d32_warc_ingest",
      (s, dir) => {
        import s.implicits._
        // widen: gzip-compressing one WARC member per record is per-row
        // heavy, and a single-file input would serialize the build
        val docs = graft.ext.Parallelism.widen(t(s, dir, "documents"))
        val warcFiles = docs
          .select(concat(lit("http://example.com/doc/"),
            col("doc_id").cast("string")).as("uri"), col("text"))
          .as[(String, String)]
          .mapPartitions { it =>
            Iterator.single(graft.ext.Warc.write(it.map { case (uri, text) =>
              graft.ext.Warc.WarcRecord("response", s"<urn:doc:$uri>", uri,
                "text/plain", "2026-01-01T00:00:00Z",
                text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }))
          }
          .toDF("content")
          .withColumn("file_id", monotonically_increasing_id())
        graft.ext.Warc.recordsExploded(warcFiles)
          .select(col("target_uri"), md5(col("payload")).as("payload_md5"),
            col("payload_len"))
          .orderBy(col("target_uri"))
      },
      Some("""SELECT 'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
        md5(text) AS payload_md5,
        CAST(octet_length(encode(text)) AS BIGINT) AS payload_len
        FROM documents ORDER BY target_uri""")),

    // Bigram-LM NLL — the next-order LM signal after d19: MLE conditional
    // transition probabilities over the corpus itself, per-doc mean
    // transition NLL in exact integer micro-nats (one ln() per distinct
    // transition is the only floating op, frozen immediately — the d19
    // portability discipline). Boilerplate (predictable transitions)
    // scores near 0, token soup scores high.
    CatalogQuery(
      "d33_bigram_nll",
      (s, dir) =>
        graft.ext.TextAnalysis.bigramNll(t(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""WITH w AS (
          SELECT doc_id,
            list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
              t -> length(t) > 0) AS ws
          FROM documents),
        big0 AS (
          SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
          FROM w WHERE len(ws) >= 2),
        big AS (SELECT doc_id, ws[i] AS prev, ws[i + 1] AS cur FROM big0),
        bgf AS (SELECT prev, cur, count(*) AS n FROM big GROUP BY 1, 2),
        pf AS (SELECT prev, count(*) AS pn FROM big GROUP BY 1),
        per AS (
          SELECT doc_id,
            CAST(CAST(ln(CAST(f.n AS DOUBLE) / CAST(p.pn AS DOUBLE)) AS DECIMAL(28,6))
              * 1000000 AS BIGINT) AS lp_micro
          FROM big JOIN bgf f USING (prev, cur) JOIN pf p USING (prev)),
        agg AS (SELECT doc_id, count(*) AS n_bigrams, -sum(lp_micro) AS m FROM per GROUP BY 1)
        SELECT doc_id, n_bigrams,
          CAST(CAST(CAST((2 * m + n_bigrams) // (2 * n_bigrams) AS DECIMAL(12,0))
            * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(18,6)) AS DOUBLE) AS bigram_nll
        FROM agg ORDER BY doc_id""")),

    // HTML -> text extraction (WET generation) — the step between WARC
    // ingestion (d32) and the text operators. Fixture: each doc's text is
    // entity-escaped and wrapped in markup with script/style/comment
    // noise; the operator must strip structure, decode entities and
    // collapse whitespace. Both engines build the SAME fixture and run
    // the SAME extraction chain, so the oracle gates each regex/replace
    // step bit-for-bit.
    CatalogQuery(
      "d34_html_to_text",
      (s, dir) => {
        val esc = replace(replace(replace(col("text"),
          lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
        val html = concat(
          lit("<html><head><title>t</title><style>p { color: red }</style>" +
            "<script>var x = 1 < 2;</script></head><body><!-- boilerplate --><p>"),
          esc,
          lit("</p><br><div>nav &amp; footer</div></body></html>"))
        // widen: four regex passes per row are the heavy stage — a
        // single-file input must not serialize them onto one core
        graft.ext.Parallelism.widen(t(s, dir, "documents"))
          .select(col("doc_id"),
            graft.ext.TextAnalysis.htmlToText(html).as("extracted"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH fixture AS (
          SELECT doc_id,
            '<html><head><title>t</title><style>p { color: red }</style>' ||
            '<script>var x = 1 < 2;</script></head><body><!-- boilerplate --><p>' ||
            replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
            '</p><br><div>nav &amp; footer</div></body></html>' AS html
          FROM documents),
        stripped AS (
          SELECT doc_id,
            regexp_replace(
              regexp_replace(
                regexp_replace(html,
                  '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
                '(?s)<!--.*?-->', ' ', 'g'),
              '<[^>]*>', ' ', 'g') AS s
          FROM fixture),
        decoded AS (
          SELECT doc_id,
            replace(replace(replace(replace(replace(replace(s,
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', CHR(39)), '&nbsp;', ' '), '&amp;', '&') AS s
          FROM stripped)
        SELECT doc_id,
          trim(regexp_replace(s, '[ \t\r\n]+', ' ', 'g')) AS extracted
        FROM decoded ORDER BY doc_id""")),

    // Duplicate-span REMOVAL (Lee et al. substring dedup, enforcement
    // side of d22): every occurrence of a duplicated 5-gram except the
    // globally first (min (doc,pos), intra-doc copies included) is
    // removed token-by-token; per-doc kept counts + md5 of the
    // reconstructed text. Coverage via the sweep-line (+1/-1 events +
    // running sum), never an n-fold position explode. The oracle mirrors
    // the full pipeline including the reconstruction md5.
    CatalogQuery(
      "d35_span_removal",
      (s, dir) =>
        graft.ext.Dedup.removeDupSpans(t(s, dir, "documents"), "doc_id", "text",
          n = 5, portable = true)
          .orderBy(col("doc_id")),
      Some {
        val N = 5
        s"""WITH nw AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
          FROM documents),
        w AS (
          SELECT doc_id, string_split(t, ' ') AS ws,
            CAST(CASE WHEN len(t) = 0 THEN 0 ELSE len(string_split(t, ' ')) END AS BIGINT) AS n_tokens
          FROM nw),
        ng0 AS (
          SELECT doc_id, ws, unnest(generate_series(0, len(ws) - $N)) AS pos
          FROM w WHERE n_tokens >= $N),
        ng AS (
          SELECT doc_id, pos,
            CAST(('0x' || substr(md5(array_to_string(ws[(pos+1):(pos+$N)], ' ')), 1, 15)) AS BIGINT) AS h
          FROM ng0),
        win AS (
          SELECT h, min(struct_pack(i := doc_id, p := pos)) AS w, count(*) AS occ
          FROM ng GROUP BY h),
        losers AS (
          SELECT ng.doc_id, ng.pos FROM ng JOIN win USING (h)
          WHERE win.occ >= 2 AND NOT (ng.doc_id = win.w.i AND ng.pos = win.w.p)),
        ev AS (
          SELECT doc_id, p, sum(d) AS d FROM (
            SELECT doc_id, pos AS p, 1 AS d FROM losers
            UNION ALL SELECT doc_id, pos + $N AS p, -1 AS d FROM losers) u
          GROUP BY 1, 2),
        tok0 AS (
          SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 1)) AS pos
          FROM w WHERE n_tokens > 0),
        tok AS (SELECT doc_id, pos, ws[pos + 1] AS tk FROM tok0),
        cov AS (
          SELECT t.doc_id, t.pos, t.tk,
            sum(coalesce(e.d, 0)) OVER (PARTITION BY t.doc_id ORDER BY t.pos
              ROWS UNBOUNDED PRECEDING) AS c
          FROM tok t LEFT JOIN ev e ON t.doc_id = e.doc_id AND t.pos = e.p),
        per_doc AS (
          SELECT doc_id,
            sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS kept_tokens,
            md5(coalesce(string_agg(tk, ' ' ORDER BY pos) FILTER (WHERE c = 0), '')) AS kept_md5
          FROM cov GROUP BY doc_id)
        SELECT w.doc_id, w.n_tokens,
          CAST(coalesce(p.kept_tokens, 0) AS BIGINT) AS kept_tokens,
          CASE WHEN w.n_tokens = 0 THEN 0.0
               ELSE ${graft.operators.QueryDsl.ratio6Sql("coalesce(p.kept_tokens, 0)", "w.n_tokens")} END AS kept_frac,
          coalesce(p.kept_md5, md5('')) AS kept_md5
        FROM w LEFT JOIN per_doc p USING (doc_id)
        ORDER BY w.doc_id"""
      }),

    // The composed crawl->corpus WET pipeline: markup-wrapped docs are
    // serialized into real per-partition WARC archives, re-ingested
    // through recordsExploded, text-extracted from the payload bytes and
    // quality-gated — the d32 + d34 + d11 operators chained end-to-end.
    // The oracle SKIPS the container (d32 already proves the WARC
    // round-trip is byte-preserving) and mirrors wrap -> extract ->
    // metrics -> gate, so a hash match proves the WHOLE chain, container
    // framing included, is lossless.
    CatalogQuery(
      "d36_crawl_wet_pipeline",
      (s, dir) => {
        import s.implicits._
        val esc = replace(replace(replace(col("text"),
          lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
        val html = concat(
          lit("<html><head><title>t</title><style>p { color: red }</style>" +
            "<script>var x = 1 < 2;</script></head><body><!-- boilerplate --><p>"),
          esc,
          lit("</p><br><div>nav &amp; footer</div></body></html>"))
        val warcFiles = graft.ext.Parallelism.widen(t(s, dir, "documents"))
          .select(concat(lit("http://example.com/doc/"),
            col("doc_id").cast("string")).as("uri"), html.as("html"))
          .as[(String, String)]
          .mapPartitions { it =>
            Iterator.single(graft.ext.Warc.write(it.map { case (uri, page) =>
              graft.ext.Warc.WarcRecord("response", s"<urn:doc:$uri>", uri,
                "text/html", "2026-01-01T00:00:00Z",
                page.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }))
          }
          .toDF("content")
          .withColumn("file_id", monotonically_increasing_id())
        val extracted = graft.ext.Warc.recordsExploded(warcFiles)
          .select(col("target_uri"),
            graft.ext.TextAnalysis.htmlToText(col("payload").cast("string")).as("text"))
        graft.ext.TextAnalysis.qualityFiltered(extracted, "text",
            minScore = 0.55, minTokens = 5, maxTokens = 5000, maxDigitRatio = 0.3)
          .select(col("target_uri"), col("n_tokens"), col("quality_score"))
          .orderBy(col("target_uri"))
      },
      Some(s"""WITH fixture AS (
          SELECT 'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
            '<html><head><title>t</title><style>p { color: red }</style>' ||
            '<script>var x = 1 < 2;</script></head><body><!-- boilerplate --><p>' ||
            replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
            '</p><br><div>nav &amp; footer</div></body></html>' AS html
          FROM documents),
        stripped AS (
          SELECT target_uri,
            regexp_replace(
              regexp_replace(
                regexp_replace(html,
                  '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
                '(?s)<!--.*?-->', ' ', 'g'),
              '<[^>]*>', ' ', 'g') AS s
          FROM fixture),
        decoded AS (
          SELECT target_uri,
            replace(replace(replace(replace(replace(replace(s,
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', CHR(39)), '&nbsp;', ' '), '&amp;', '&') AS s
          FROM stripped),
        extracted AS (
          SELECT target_uri,
            trim(regexp_replace(s, '[ \t\r\n]+', ' ', 'g')) AS text
          FROM decoded),
        base AS (
          SELECT target_uri, text, ' ' || regexp_replace(lower(text), '${TextAnalysis.WsClass}', '  ', 'g') || ' ' AS x
          FROM extracted),
        m AS (
          SELECT target_uri,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE CAST(len(string_split_regex(trim(text), '${TextAnalysis.WsClass}+')) AS INTEGER) END AS n_tokens,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) END AS digit_ratio,
            ${hitsSql("en")} AS stop_hits
          FROM base),
        q AS (
          SELECT target_uri, n_tokens, digit_ratio,
            alpha_ratio * 0.5
              + least(CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1), 0.5) * 0.8
              + (CASE WHEN n_tokens BETWEEN 20 AND 10000 THEN 0.1 ELSE 0.0 END)
              - digit_ratio * 0.3 AS quality_score
          FROM m)
        SELECT target_uri, n_tokens, quality_score FROM q
        WHERE quality_score >= 0.55 AND n_tokens BETWEEN 5 AND 5000 AND digit_ratio < 0.3
        ORDER BY target_uri""")),

    // Model-based quality filtering (FineWeb-Edu/DCLM shape): train a
    // multinomial Naive Bayes on a deterministic labeled third of the
    // corpus (label: lang='en' — the only supervised signal the fixture
    // tables carry), score EVERY document under the trained log-odds.
    // Every ln is quantized to integer micro-nats before any cross-token
    // arithmetic (the d19 portability discipline); the score is a plain
    // long sum, no division, no rounding step. The vocab-sized model
    // joins token-keyed (AQE broadcasts when small); only the one-row
    // prior/unseen scalars broadcast by hint.
    CatalogQuery(
      "d42_nb_quality",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = Classifier.nbTrain(
          docs.filter(col("doc_id") % 3 === 0)
            .withColumn("is_en", col("lang") === "en"),
          "text", "is_en")
        Classifier.nbScore(docs, "doc_id", "text", model).orderBy(col("doc_id"))
      },
      Some(s"""$nbCtesSql
        SELECT doc_id, n_tokens, m AS nb_score_micro, ${shiftSql("m")} AS nb_score,
          m > 0 AS keep
        FROM agg ORDER BY doc_id""")),

    // Operating-point sweep over the trained NB model: per candidate
    // threshold (bounded literal list), exact confusion counts against
    // the lang='en' truth plus precision/recall/F1 — the report a
    // pipeline owner reads to pick CorpusIngest's nbThresholdMicro. One
    // corpus scan for the whole sweep (explode by threshold, map-side
    // combine); counts exact LONGs, ratios single IEEE divisions.
    CatalogQuery(
      "d45_classifier_eval",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = Classifier.nbTrain(
          docs.filter(col("doc_id") % 3 === 0)
            .withColumn("is_en", col("lang") === "en"),
          "text", "is_en")
        val scored = Classifier.nbScore(docs, "doc_id", "text", model)
          .join(docs.select(col("doc_id"), (col("lang") === "en").as("y")), "doc_id")
        Classifier.evalThresholds(scored, "nb_score_micro", "y", EvalThresholds)
          .orderBy(col("threshold"))
      },
      Some(s"""$nbCtesSql,
        lbl AS (SELECT a.doc_id, a.m, (d.lang = 'en') AS y
          FROM agg a JOIN documents d USING (doc_id)),
        thr AS (SELECT CAST(x AS BIGINT) AS threshold
          FROM (VALUES ${EvalThresholds.map(v => s"($v)").mkString(", ")}) t(x)),
        e AS (SELECT threshold,
            CAST(sum(CASE WHEN m > threshold AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
            CAST(sum(CASE WHEN m > threshold AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
            CAST(sum(CASE WHEN m <= threshold AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
            CAST(sum(CASE WHEN m <= threshold AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
          FROM lbl CROSS JOIN thr GROUP BY 1)
        SELECT threshold, tp, fp, fn, tn,
          CASE WHEN tp + fp = 0 THEN 0.0
               ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
          CASE WHEN tp + fn = 0 THEN 0.0
               ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
          CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
               ELSE CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
        FROM e ORDER BY threshold""")),

    // Exact ROC AUC of the NB score against the truth — Mann-Whitney
    // over per-score class counts, with the global cumulative computed
    // by the DISTRIBUTED prefix sum (Prefix.cumSum: range exchange +
    // per-partition windows + a partition-count-sized offsets window —
    // never the single-task Window.orderBy trap). Integer-exact up to
    // the one final IEEE division (the q47 discipline); ties exact.
    CatalogQuery(
      "d46_nb_auc",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = Classifier.nbTrain(
          docs.filter(col("doc_id") % 3 === 0)
            .withColumn("is_en", col("lang") === "en"),
          "text", "is_en")
        val scored = Classifier.nbScore(docs, "doc_id", "text", model)
          .join(docs.select(col("doc_id"), (col("lang") === "en").as("y")), "doc_id")
        Classifier.aucExact(scored, "nb_score_micro", "y")
      },
      Some(s"""$nbCtesSql,
        lbl AS (SELECT a.m, (d.lang = 'en') AS y
          FROM agg a JOIN documents d USING (doc_id)),
        byscore AS (SELECT m AS s,
            CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
            CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n
          FROM lbl GROUP BY 1),
        cwin AS (SELECT p, n,
            CAST(sum(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn
          FROM byscore),
        tt AS (SELECT CAST(sum(p) AS BIGINT) AS pt, CAST(sum(n) AS BIGINT) AS nt,
            CAST(sum(p * (2 * (cn - n) + n)) AS BIGINT) AS u2 FROM cwin)
        SELECT pt AS p_total, nt AS n_total,
          CAST(u2 AS DOUBLE) / CAST(2 * pt * nt AS DOUBLE) AS auc
        FROM tt""")),

    // DSIR importance weighting (Xie et al. 2023) over hashed unigram
    // buckets: the model is AT MOST 512 rows regardless of corpus size —
    // the deliberate scale contrast with d42's vocab-sized model (the
    // bucket table broadcasts unconditionally; scoring never shuffles
    // the model). Target distribution: lang='en'; raw: the whole corpus
    // (DSIR's own setup). Same micro-nats quantization discipline.
    CatalogQuery(
      "d43_dsir_weights",
      (s, dir) =>
        Classifier.dsirWeights(
          t(s, dir, "documents").withColumn("is_en", col("lang") === "en"),
          "doc_id", "text", "is_en", buckets = 512)
          .orderBy(col("doc_id")),
      Some(s"""$dsirCtesSql
        SELECT doc_id, n_tokens, m AS dsir_weight_micro, ${shiftSql("m")} AS dsir_weight,
          m > 0 AS keep
        FROM agg ORDER BY doc_id""")),

    // DSIR RESAMPLING: select the top-100 importance-weighted docs via
    // the histogram-pruned top-k (exactLimitThreshold=0 forces the
    // billion-k scale path at toy scale: bin counts -> threshold bin ->
    // only the boundary bin is ranked). The oracle is the semantic spec
    // — ORDER BY weight DESC, doc_id LIMIT 100 — which the histogram
    // path must reproduce EXACTLY (deterministic tie-break).
    CatalogQuery(
      "d44_dsir_topk",
      (s, dir) => {
        val w = Classifier.dsirWeights(
          t(s, dir, "documents").withColumn("is_en", col("lang") === "en"),
          "doc_id", "text", "is_en", buckets = 512)
        Classifier.topKByWeight(w, "doc_id", "dsir_weight_micro", 100,
            exactLimitThreshold = 0, binWidth = 1L << 17)
          .orderBy(col("doc_id"))
      },
      Some(s"""$dsirCtesSql,
        top AS (
          SELECT doc_id, n_tokens, m FROM agg
          ORDER BY m DESC, doc_id LIMIT 100)
        SELECT doc_id, n_tokens, m AS dsir_weight_micro, ${shiftSql("m")} AS dsir_weight,
          m > 0 AS keep
        FROM top ORDER BY doc_id""")),

    // Token-budget corpus fill: the greedy best-scoring prefix whose
    // cumulative token count fits a 20k budget — how a scored pool is
    // cut to the tokens a run will actually consume. The cumulative is
    // Prefix.cumSumBy (distributed prefix sum), oracled against the
    // plain window-cumsum semantic spec. Heuristic quality_score as the
    // ranking signal (its SQL mirror is the d11 chain).
    CatalogQuery(
      "d47_token_budget",
      (s, dir) => {
        val m = TextAnalysis.withTextMetrics(
          t(s, dir, "documents").select(col("doc_id"), col("text")), "text")
          .select(col("doc_id"), col("n_tokens"), col("quality_score"))
        TextAnalysis.tokenBudgetFill(m, "doc_id", "n_tokens", "quality_score", 20000L)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (
          SELECT doc_id, text, ' ' || regexp_replace(lower(text), '${TextAnalysis.WsClass}', '  ', 'g') || ' ' AS x
          FROM documents),
        m AS (
          SELECT doc_id,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE CAST(len(string_split_regex(trim(text), '${TextAnalysis.WsClass}+')) AS INTEGER) END AS n_tokens,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) END AS digit_ratio,
            ${hitsSql("en")} AS stop_hits
          FROM base),
        q AS (
          SELECT doc_id, n_tokens,
            alpha_ratio * 0.5
              + least(CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1), 0.5) * 0.8
              + (CASE WHEN n_tokens BETWEEN 20 AND 10000 THEN 0.1 ELSE 0.0 END)
              - digit_ratio * 0.3 AS quality_score
          FROM m),
        c AS (
          SELECT doc_id, n_tokens, quality_score,
            CAST(sum(n_tokens) OVER (
              ORDER BY quality_score DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS cum_n_tokens
          FROM q)
        SELECT doc_id, n_tokens, quality_score, cum_n_tokens
        FROM c WHERE cum_n_tokens <= 20000 ORDER BY doc_id""")),

    // Epoch-mixing plan: the repetition schedule of a training recipe
    // (src0 x3.5, src1 x2, src2 x0.25, everything else x1) — one
    // (doc, epoch) row per planned pass; whole epochs replicate, the
    // fractional remainder admits docs by portable hash. Zero-shuffle
    // (broadcast recipe + sequence explode); the oracle mirrors the
    // hash admission and generate_series expansion exactly.
    CatalogQuery(
      "d48_epoch_plan",
      (s, dir) =>
        TextAnalysis.epochPlan(
          t(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source", EpochRecipe.toMap)
          .select(col("doc_id"), col("source"), col("epoch"))
          .orderBy(col("doc_id"), col("epoch")),
      Some(s"""WITH recipe AS (
          SELECT x AS source, CAST(ppm AS BIGINT) AS ppm
          FROM (VALUES ${EpochRecipe.map { case (k, v) => s"('$k', $v)" }.mkString(", ")}) t(x, ppm)),
        j AS (
          SELECT d.doc_id, d.source, coalesce(r.ppm, 1000000) AS ppm
          FROM documents d LEFT JOIN recipe r USING (source)),
        n AS (
          SELECT doc_id, source,
            CAST(ppm // 1000000
              + CASE WHEN CAST(('0x' || substr(md5('epoch:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                          % 1000000 < ppm % 1000000
                     THEN 1 ELSE 0 END AS INTEGER) AS n_epochs
          FROM j)
        SELECT doc_id, source, CAST(unnest(generate_series(1, n_epochs)) AS INTEGER) AS epoch
        FROM n WHERE n_epochs >= 1 ORDER BY doc_id, epoch""")),

    // Two-sample KS drift between corpus snapshots (even vs odd doc_id
    // halves, scored under the shared NB fixture): empirical CDFs via
    // the DISTRIBUTED prefix sum, gap compared as exact integer
    // cross-products |c1*n2 - c2*n1|, one final IEEE division. The
    // monitoring check a pipeline runs when a new crawl lands.
    CatalogQuery(
      "d49_ks_drift",
      (s, dir) => {
        val scored = nbScoredDocs(s, dir)
        Drift.ksStatistic(
          scored.filter(col("doc_id") % 2 === 0),
          scored.filter(col("doc_id") % 2 === 1),
          "nb_score_micro")
      },
      Some(s"""$nbCtesSql,
        c1 AS (SELECT m AS v, count(*) AS c1 FROM agg WHERE doc_id % 2 = 0 GROUP BY 1),
        c2 AS (SELECT m AS v, count(*) AS c2 FROM agg WHERE doc_id % 2 = 1 GROUP BY 1),
        mg AS (SELECT coalesce(c1.v, c2.v) AS v,
            coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
          FROM c1 FULL OUTER JOIN c2 ON c1.v = c2.v),
        ktot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM mg),
        cw AS (SELECT
            CAST(sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS k1,
            CAST(sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS k2
          FROM mg),
        d AS (SELECT CAST(max(abs(k1 * n2 - k2 * n1)) AS BIGINT) AS dd
          FROM cw CROSS JOIN ktot)
        SELECT n1, n2, CAST(dd AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS ks
        FROM d CROSS JOIN ktot""")),

    // PSI drift over equal-width bins of the same score (bin = floored
    // v/2^19 ~ half a nat), add-one smoothing for empty bins; shares as
    // exact ppm integers, each ln micro-quantized before multiplication,
    // terms exact longs at scale 1e12, one final IEEE division.
    CatalogQuery(
      "d50_psi_drift",
      (s, dir) => {
        val scored = nbScoredDocs(s, dir)
        Drift.psi(
          scored.filter(col("doc_id") % 2 === 0),
          scored.filter(col("doc_id") % 2 === 1),
          "nb_score_micro", binWidth = 1L << 19)
      },
      Some(s"""$nbCtesSql,
        b1 AS (SELECT CAST(floor(CAST(m AS DOUBLE) / 524288.0) AS BIGINT) AS b,
            count(*) AS c1 FROM agg WHERE doc_id % 2 = 0 GROUP BY 1),
        b2 AS (SELECT CAST(floor(CAST(m AS DOUBLE) / 524288.0) AS BIGINT) AS b,
            count(*) AS c2 FROM agg WHERE doc_id % 2 = 1 GROUP BY 1),
        mg AS (SELECT coalesce(b1.b, b2.b) AS b,
            CAST(coalesce(c1, 0) + 1 AS BIGINT) AS s1,
            CAST(coalesce(c2, 0) + 1 AS BIGINT) AS s2
          FROM b1 FULL OUTER JOIN b2 ON b1.b = b2.b),
        ptot AS (SELECT CAST(sum(s1) AS BIGINT) AS t1, CAST(sum(s2) AS BIGINT) AS t2,
            count(*) AS n_bins FROM mg),
        terms AS (SELECT
            CAST((s1 * 1000000 // t1 - s2 * 1000000 // t2)
              * ${qMicroSql("CAST(s1 * t2 AS DOUBLE) / CAST(s2 * t1 AS DOUBLE)")}
              AS BIGINT) AS term
          FROM mg CROSS JOIN ptot),
        ps AS (SELECT CAST(sum(term) AS BIGINT) AS psi12 FROM terms)
        SELECT t1 - n_bins AS n1, t2 - n_bins AS n2, n_bins,
          CAST(psi12 AS DOUBLE) / 1000000000000.0 AS psi
        FROM ps CROSS JOIN ptot""")),

    // Persisted BM25 lexical retrieval — the keyword side of the serving
    // stack (the vector side is e12-e27): a LexIndex built INCREMENTALLY
    // (two adds) over the corpus, queried more-like-this with the first
    // five documents, must equal a corpus-level BM25 recomputation — so
    // the oracle gates the inverted-index machinery end-to-end (clustered
    // postings, IN-pruned scan, live-df counting, stats-table totals,
    // integer-micro scoring).
    CatalogQuery(
      "d51_bm25_topk",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val tmp = java.nio.file.Files.createTempDirectory("graft-d51-").toString
        // stats stay ON: search() IN-prunes the clustered postings by the
        // query-term hash set, which needs per-file min/max stats
        val idx = new graft.ext.LexIndex(s, s"file://$tmp")
        idx.add(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        idx.add(docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
        val out = idx.search(docs.filter(col("doc_id") < 5), "doc_id", "text",
            k = 10, excludeSelf = true)
          .orderBy(col("query_id"), col("rnk"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch index
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some(s"""WITH ${QueryDsl.bm25CtesSql(maxQueryId = 5)}
        SELECT query_id, doc_id, CAST(rn AS INTEGER) AS rnk, score_pico
        FROM bm WHERE rn <= 10 ORDER BY query_id, rnk"""))
  )

  /** Shared d49/d50 fixture: every doc scored under the d42 NB model —
    * materialized because BOTH snapshot halves consume it (without the
    * barrier the train+score pipeline runs twice). */
  private def nbScoredDocs(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val docs = t(s, dir, "documents")
    val model = Classifier.nbTrain(
      docs.filter(col("doc_id") % 3 === 0).withColumn("is_en", col("lang") === "en"),
      "text", "is_en")
    Parallelism.materialize(
      Classifier.nbScore(docs, "doc_id", "text", model)
        .select(col("doc_id"), col("nb_score_micro")))(
      graft.conf.GraftSettings.default)
  }

  // d48 recipe: epochs in ppm (3.5x, 2x, 0.25x; unmapped sources 1x).
  private lazy val EpochRecipe: Seq[(String, Long)] =
    Seq("src0" -> 3500000L, "src1" -> 2000000L, "src2" -> 250000L)

  // Candidate nbThresholdMicro operating points for d45 (micro-nats).
  // lazy: referenced from `all`'s initializer, which runs first
  private lazy val EvalThresholds: Seq[Long] =
    Seq(-2000000L, -1000000L, -500000L, -200000L, 0L, 200000L, 500000L, 1000000L, 2000000L)

  // Shared DuckDB CTE chain for the NB classifier family (d42 score,
  // d45 threshold sweep, d46 AUC): train on the labeled third
  // (doc_id % 3 = 0, label lang='en'), score all docs; ends in
  // `agg(doc_id, n_tokens, m)` where m is the micro-nats log-odds sum.
  private lazy val nbCtesSql: String = s"""WITH ltok AS (
          SELECT doc_id, (lang = 'en') AS y,
            unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
          FROM documents WHERE doc_id % 3 = 0),
        lt2 AS (SELECT doc_id, y, token FROM ltok WHERE length(token) > 0),
        per AS (SELECT token,
            sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
            sum(CASE WHEN y THEN 0 ELSE 1 END) AS nn
          FROM lt2 GROUP BY 1),
        tot AS (SELECT CAST(sum(np) AS BIGINT) AS tp, CAST(sum(nn) AS BIGINT) AS tn,
            count(*) AS v FROM per),
        docs AS (SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS dp,
            CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS dn
          FROM documents WHERE doc_id % 3 = 0),
        w AS (SELECT token,
            ${qMicroSql("CAST(np + 1 AS DOUBLE) / CAST(tp + v AS DOUBLE)")}
              - ${qMicroSql("CAST(nn + 1 AS DOUBLE) / CAST(tn + v AS DOUBLE)")} AS w_micro
          FROM per CROSS JOIN tot),
        sc AS (SELECT
            ${qMicroSql("CAST(dp AS DOUBLE) / CAST(dp + dn AS DOUBLE)")}
              - ${qMicroSql("CAST(dn AS DOUBLE) / CAST(dp + dn AS DOUBLE)")} AS prior_micro,
            ${qMicroSql("CAST(1 AS DOUBLE) / CAST(tp + v AS DOUBLE)")}
              - ${qMicroSql("CAST(1 AS DOUBLE) / CAST(tn + v AS DOUBLE)")} AS unseen_micro
          FROM tot CROSS JOIN docs),
        stok AS (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
          FROM documents),
        st2 AS (SELECT doc_id, token FROM stok WHERE length(token) > 0),
        agg AS (SELECT doc_id, count(*) AS n_tokens,
            CAST(min(prior_micro) + sum(coalesce(w_micro, unseen_micro)) AS BIGINT) AS m
          FROM st2 LEFT JOIN w USING (token) CROSS JOIN sc GROUP BY 1)"""

  // Shared DuckDB CTE chain for the DSIR family (d43 weights, d44 top-k):
  // hashed buckets -> smoothed per-bucket log-ratios -> per-doc micro sums.
  private lazy val dsirCtesSql: String = s"""WITH tok AS (
          SELECT doc_id, (lang = 'en') AS tgt,
            unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
          FROM documents),
        t2 AS (SELECT doc_id, tgt, token FROM tok WHERE length(token) > 0),
        tb AS (SELECT doc_id, tgt,
            CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % 512 AS bucket
          FROM t2),
        per AS (SELECT bucket,
            CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS nt,
            count(*) AS nr
          FROM tb GROUP BY 1),
        tot AS (SELECT CAST(sum(nt) AS BIGINT) AS tt, CAST(sum(nr) AS BIGINT) AS tr FROM per),
        r AS (SELECT bucket,
            ${qMicroSql("CAST(nt + 1 AS DOUBLE) / CAST(tt + 512 AS DOUBLE)")}
              - ${qMicroSql("CAST(nr + 1 AS DOUBLE) / CAST(tr + 512 AS DOUBLE)")} AS lr_micro
          FROM per CROSS JOIN tot),
        fl AS (SELECT
            ${qMicroSql("CAST(1 AS DOUBLE) / CAST(tt + 512 AS DOUBLE)")}
              - ${qMicroSql("CAST(1 AS DOUBLE) / CAST(tr + 512 AS DOUBLE)")} AS floor_micro
          FROM tot),
        agg AS (SELECT doc_id, count(*) AS n_tokens,
            CAST(sum(coalesce(lr_micro, floor_micro)) AS BIGINT) AS m
          FROM tb LEFT JOIN r USING (bucket) CROSS JOIN fl GROUP BY 1)"""
}
