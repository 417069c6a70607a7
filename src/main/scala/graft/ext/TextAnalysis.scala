package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: token counting,
  * quality scoring, language-ID heuristics, document fingerprinting.
  *
  * Everything here is composed from built-in (codegen'd) expressions — no
  * UDFs — so a 100 TB scan stays inside WholeStageCodegen and the parquet
  * reader only materializes the text column. Each helper is a pure
  * `Column -> Column` so callers keep full pushdown/pruning.
  */
object TextAnalysis {

  /** The EXPLICIT whitespace set every tokenizer/stopword probe uses, on
    * BOTH sides of the DuckDB oracle. Never `\s`: Java regex's `\s`
    * includes vertical tab `\x0B` while RE2's (DuckDB) excludes it, so
    * the engine-dependent shorthand silently diverges on any document
    * carrying a VT — the explicit class (Java's exact `\s` set, so
    * Spark-side behavior is unchanged) is engine-identical. */
  val WsChars: String = " \\t\\n\\x0B\\f\\r"
  val WsClass: String = s"[$WsChars]"

  /** Whitespace-delimited token count (0 for empty/blank). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), WsClass + "+")))

  /** BPE-ish subword-budget token pattern: letter runs, short digit runs
    * (1-3, the way modern BPE vocabularies chunk numbers), punctuation
    * runs. RE2-safe (no lookarounds, explicit [[WsClass]] whitespace) so
    * any engine tokenizes identically. */
  val BpeTokenPattern: String = s"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9$WsChars]+"

  /** Approximate LLM-token count: matches of [[BpeTokenPattern]]. A cheap,
    * deterministic stand-in for a real BPE vocabulary — counts letter runs,
    * 1-3-digit chunks, and punctuation runs — used to budget token counts
    * over a corpus without shipping a tokenizer model to executors. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Space-doubled, lower-cased text with sentinel spaces: word boundaries
    * become non-overlapping so a literal replace-and-measure word count is
    * exact even for adjacent repeats ("the the").
    *
    * This is the expensive per-row derivation shared by every stopword
    * probe. Callers that probe more than one word should PROJECT it into a
    * real column once and use the `*In` variants below: Catalyst's
    * subexpression elimination skips conditionally-evaluated branches
    * (CASE WHEN), so a `langid`-style expression tree would otherwise
    * re-derive this once per stopword (~20 full-text regex passes/row).
    */
  def doubledText(text: Column): Column =
    // EVERY whitespace char doubles to two spaces, not just ' ': tokenCount
    // splits on WsClass+, so a space-only sentinel made words at newline/
    // tab boundaries invisible to every stopword probe — multi-line text
    // (all scraped documents) under-counted densities and mis-ID'd langs
    concat(lit(" "), regexp_replace(lower(text), WsClass, "  "), lit(" "))

  /** Whole-word occurrence count against an already-doubled text (see
    * [[doubledText]]). Literal (non-regex) replace — codegen'd, no NFA. */
  def wordOccurrencesIn(doubled: Column, word: String): Column = {
    val target = s" $word "
    ((length(doubled) - length(replace(doubled, lit(target), lit("")))) / lit(target.length))
      .cast("int")
  }

  /** Exact count of whole-word occurrences of `word` (case-insensitive).
    * Convenience single-word form; multi-word callers use [[doubledText]]
    * + [[wordOccurrencesIn]] to derive the doubled text once per row. */
  def wordOccurrences(text: Column, word: String): Column =
    wordOccurrencesIn(doubledText(text), word)

  /** Character-class ratio over total length (0.0 for empty text). */
  private def classRatio(text: Column, charClassRegex: String): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        length(regexp_replace(text, charClassRegex, "")).cast("double") / length(text))

  def alphaRatio(text: Column): Column = classRatio(text, "[^A-Za-z]")
  def digitRatio(text: Column): Column = classRatio(text, "[^0-9]")

  /** Stopword profiles used by the language-ID heuristic. Deterministic
    * tie-break order is the Seq order in `langid`. */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "una", "por")
  )

  /** Total stopword hits for one language profile, against a pre-projected
    * doubled text. */
  def stopwordHitsIn(doubled: Column, lang: String): Column =
    StopwordProfiles(lang).map(wordOccurrencesIn(doubled, _)).reduce(_ + _)

  /** Total stopword hits for one language profile. */
  def stopwordHits(text: Column, lang: String): Column =
    stopwordHitsIn(doubledText(text), lang)

  /** Stopword density against a pre-projected doubled text. */
  def stopwordDensityIn(text: Column, doubled: Column, lang: String = "en"): Column =
    stopwordHitsIn(doubled, lang).cast("double") / greatest(tokenCount(text), lit(1))

  /** Stopword density: profile hits per token. */
  def stopwordDensity(text: Column, lang: String = "en"): Column =
    stopwordDensityIn(text, doubledText(text), lang)

  /** Count of CJK ideographs — the zh signal for `langid`. */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))

  /** [[langid]] against a pre-projected doubled text — the form hot paths
    * use so the doubling runs once per row, not once per stopword. */
  def langidIn(text: Column, doubled: Column): Column = {
    val en = stopwordHitsIn(doubled, "en")
    val de = stopwordHitsIn(doubled, "de")
    val fr = stopwordHitsIn(doubled, "fr")
    val es = stopwordHitsIn(doubled, "es")
    when(cjkCount(text) > 0, lit("zh"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** N-gram/stopword heuristic language ID over {en,de,fr,es,zh}.
    * CJK presence wins outright; otherwise argmax of profile hits with
    * deterministic tie-break en > de > fr > es. */
  def langid(text: Column): Column = langidIn(text, doubledText(text))

  /** The quality formula over already-computed metric columns — the form
    * that reuses projected metrics instead of re-deriving them per term. */
  def qualityFromMetrics(alpha: Column, stopDensity: Column, nTokens: Column,
      digit: Column): Column =
    alpha * lit(0.5) +
      least(stopDensity, lit(0.5)) * lit(0.8) +
      when(nTokens.between(20, 10000), lit(0.1)).otherwise(lit(0.0)) -
      digit * lit(0.3)

  /** [[qualityScore]] against a pre-projected doubled text. */
  def qualityScoreIn(text: Column, doubled: Column): Column =
    qualityFromMetrics(alphaRatio(text), stopwordDensityIn(text, doubled),
      tokenCount(text), digitRatio(text))

  /** Composite quality score in [0,1]-ish: rewards natural-language shape
    * (alpha-heavy, stopword-bearing, mid-length tokens), penalizes digits.
    * Weights are heuristic; the value is deterministic and engine-portable.
    */
  def qualityScore(text: Column): Column =
    qualityScoreIn(text, doubledText(text))

  // -------------------------------------------------------------- PII

  /** RE2-safe PII shapes (no lookarounds, engine-portable): email
    * addresses, dotted-quad IPs, and NANP-style dashed phone numbers.
    * Deliberately high-recall/simple — a scrub pass over 100 TB wants
    * codegen'd regex, not entity models; anything smarter layers on top. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Match count of one PII pattern. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Text with all three PII shapes replaced by typed placeholder tags.
    * Email runs first: an address can embed digit runs the narrower
    * patterns would otherwise half-redact. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Unigram negative-log-likelihood per document — the frequency-based
    * quality signal ("how surprising is this doc under the corpus's own
    * unigram LM"): gibberish and boilerplate both stand out. Two shuffles
    * (token count, per-doc aggregate) + one token-keyed join. The
    * frequency table is joined, NOT broadcast: at 100 TB the vocabulary
    * is itself huge, and a token-keyed shuffle join scales where a forced
    * broadcast OOMs — AQE still broadcasts it when it turns out small.
    *
    * Portability: each per-token log-prob is quantized to integer
    * micro-nats BEFORE aggregating, and the final avg is computed with
    * round-half-up IN INTEGER ARITHMETIC — `(2m + c) DIV 2c` — then
    * scale-shifted back through DECIMAL(18,6) by an exact decimal
    * multiply and emitted as DOUBLE (a DECIMAL output column
    * hash-mismatches in the driver's canonicalizer — r5 lesson; the
    * decimal→double cast of the same exact value rounds identically on
    * both engines). Rounding only a double avg is not enough (r4
    * hash-fail: summation order flips the 6th decimal), and even an exact
    * decimal sum divided in double still breaks: sum/count lands EXACTLY
    * on scale-6 midpoints (e.g. 81691212µ/24 = 3403800.5µ), where Spark's
    * HALF_UP on the shortest double repr rounds down while DuckDB's
    * scaled cast rounds up. Integer math makes the rounding the
    * operator's own, not either engine's. */
  def unigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame =
    unigramNllMicro(df, idCol, textCol)
      .select(col(idCol), col("n_tokens"),
        microToNll(col("__nll_micro")).as("unigram_nll"))

  /** Exact decimal micro → double scale-shift at CALLER-CHOSEN precision —
    * the single home of the portability-critical conversion (the
    * decimal→double cast of the same exact value rounds identically on
    * both engines — r5 lesson). Precisions are parameters, NOT unified:
    * each caller's recorded oracle hashes depend on its exact bounds. */
  private[ext] def microToDouble(micro: Column, intPrec: Int, outPrec: Int): Column =
    (micro.cast(org.apache.spark.sql.types.DecimalType(intPrec, 0))
      * expr("CAST(0.000001 AS DECIMAL(7,6))"))
      .cast(org.apache.spark.sql.types.DecimalType(outPrec, 6)).cast("double")

  /** Exact decimal scale-shift micro-nats → nats, emitted as DOUBLE. Kept
    * as a single shared expression so [[unigramNll]] and
    * [[unigramNllBand]] (and their oracles) present the identical bits. */
  private def microToNll(micro: Column): Column = microToDouble(micro, 12, 18)

  /** [[unigramNll]] with the NLL kept as INTEGER micro-nats
    * (`__nll_micro` LONG) — the exact form downstream operators filter
    * and histogram on. Round-tripping the public double through `* 1e6 →
    * long` is NOT equivalent: the product can land one ulp below the
    * integer and truncate wrong. */
  def unigramNllMicro(df: DataFrame, idCol: String, textCol: String)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    // materialized once: the frame feeds BOTH the frequency aggregate and
    // the join probe side, whose shuffles differ — without the barrier the
    // full corpus tokenization (normalize regex + explode) runs twice
    val tok = Parallelism.widen(df)
      .select(col(idCol), explode(split(normalize(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .transform(Parallelism.materialize(_))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("__tok_n"))
    val total = freq.agg(sum(col("__tok_n")).as("__corpus_n"))
    tok.join(freq, "token")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        // ln(n/N) < 0 always (n < N), so m = -sum is positive micro-nats
        (log(col("__tok_n").cast("double") / col("__corpus_n").cast("double"))
          .cast("decimal(28,6)") * lit(1000000)).cast("long").as("__lp_micro"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), (-sum(col("__lp_micro"))).as("__m"))
      .select(col(idCol), col("n_tokens"),
        expr("(2 * __m + n_tokens) DIV (2 * n_tokens)").as("__nll_micro"))
  }

  /** HTML → text extraction (WET-style): the step between [[Warc]] crawl
    * ingestion and every text operator in this package — Common Crawl
    * pipelines run exactly this shape at archive scale. Heuristic, not a
    * DOM parse (the right trade for 100 TB of mostly-broken markup):
    * script/style blocks and comments drop wholesale, remaining tags
    * become spaces, the five standard entities (+nbsp) decode, and
    * whitespace collapses. Pure codegen'd string expressions — no UDF,
    * no per-row allocation beyond the result — and engine-portable: the
    * regexes stay inside the RE2 subset so a DuckDB/Trino mirror of the
    * same chain is bit-identical (gated by d34). Entity decode runs
    * AFTER tag stripping (entities never form tags) and `&amp;` decodes
    * LAST (so `&amp;lt;` yields the literal `&lt;`, not `<`). */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "[ \t\r\n]+", " "))
  }

  /** Bigram-LM negative log-likelihood per doc — the next-order language
    * model signal after [[unigramNll]]: MLE conditional transitions
    * `P(w_i | w_{i-1}) = count(w_{i-1} w_i) / count(w_{i-1} ·)` over the
    * corpus itself, scored per doc as the mean transition NLL. Repeated
    * boilerplate (predictable transitions) scores near 0, incoherent
    * token soup scores high — separating the two failure modes a unigram
    * model conflates (both can have ordinary word frequencies).
    * Self-scoring MLE needs no smoothing: every observed bigram has
    * count >= 1. Docs with < 2 tokens have no transitions and are absent
    * (the d19 empty-doc convention).
    *
    * Portability (the d19 discipline): each transition's ln() is the one
    * IEEE double op, immediately frozen to integer micro-nats via a
    * DECIMAL(28,6) cast; sums and the half-up mean are exact BIGINT
    * math, so any engine reproduces the bits.
    *
    * Scale: bigrams derive from one array transform + explode (no per-doc
    * window), materialized once to feed the two count aggregates AND the
    * probe side; both counts are map-side-combined hash aggregates keyed
    * by short strings; nothing is ever collected. */
  def bigramNll(df: DataFrame, idCol: String, textCol: String)(
      implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame =
    bigramNllMicro(df, idCol, textCol)
      .select(col(idCol), col("n_bigrams"),
        microToNll(col("__nll_micro")).as("bigram_nll"))

  /** [[bigramNll]] with the NLL kept as INTEGER micro-nats. */
  def bigramNllMicro(df: DataFrame, idCol: String, textCol: String)(
      implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    val words = filter(split(normalize(col(textCol)), " "), t => length(t) > 0)
    // (id, prev, cur) transition rows; materialized once — feeds the
    // bigram counts, the prefix counts AND the per-doc probe
    val big = Parallelism.widen(df)
      .select(col(idCol), words.as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__w")) - 1),
        i => struct(element_at(col("__w"), i).as("__prev"),
          element_at(col("__w"), i + 1).as("__cur")))).as("__bg"))
      .select(col(idCol), col("__bg.__prev").as("__prev"), col("__bg.__cur").as("__cur"))
      .transform(Parallelism.materialize(_))
    val bgFreq = big.groupBy("__prev", "__cur").agg(count(lit(1)).as("__bg_n"))
    val prevFreq = big.groupBy("__prev").agg(count(lit(1)).as("__prev_n"))
    big.join(bgFreq, Seq("__prev", "__cur"))
      .join(prevFreq, Seq("__prev"))
      .select(col(idCol),
        // ln(n/pn) <= 0 always (n <= pn), so m = -sum is non-negative
        (log(col("__bg_n").cast("double") / col("__prev_n").cast("double"))
          .cast("decimal(28,6)") * lit(1000000)).cast("long").as("__lp_micro"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("__lp_micro"))).as("__m"))
      .select(col(idCol), col("n_bigrams"),
        expr("(2 * __m + n_bigrams) DIV (2 * n_bigrams)").as("__nll_micro"))
  }

  /** Gopher-style repetition metrics — the signal that catches boilerplate
    * and template spam exact dedup misses (a page repeating one nav bar
    * 50× is unique as a document but worthless as training data):
    *
    *  - `distinct_frac`: distinct tokens / tokens (low = repetitive)
    *  - `top_token_frac`: most-frequent token's share
    *  - `dup_bigram_frac`: share of word-bigram occurrences beyond each
    *    bigram's first (high = looping text)
    *  - `top_bigram_frac`: most-frequent bigram's share
    *
    * Shape at 100 TB: one widened tokenize pass materialized ONCE (the
    * frame feeds both the unigram aggregate and the bigram window — two
    * different shuffles), unigram/bigram counts as two-level hash
    * aggregates (map-side combine; no countDistinct Expand), bigrams from
    * a per-doc `lead` window (docs are bounded, so one doc per partition
    * slot is fine). Ratios via [[graft.operators.QueryDsl.ratio6]] exact
    * integer rounding — engine-portable by construction. Docs with < 2
    * tokens carry null bigram metrics. */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.QueryDsl.ratio6
    val tok = Parallelism.widen(df)
      .select(col(idCol), posexplode(split(normalize(col(textCol)), " ")).as(Seq("__pos", "__tok")))
      .filter(length(col("__tok")) > 0)
      .transform(Parallelism.materialize(_))
    val uni = tok.groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("__nd"), max(col("__c")).as("__top"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val big = tok
      .withColumn("__next", lead(col("__tok"), 1).over(w))
      .filter(col("__next").isNotNull)
      .select(col(idCol), concat_ws(" ", col("__tok"), col("__next")).as("__big"))
      .groupBy(col(idCol), col("__big")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("__n_big"), count(lit(1)).as("__nd_big"), max(col("__c")).as("__top_big"))
    uni.join(big, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        ratio6(col("__nd"), col("n_tokens")).as("distinct_frac"),
        ratio6(col("__top"), col("n_tokens")).as("top_token_frac"),
        ratio6(col("__n_big") - col("__nd_big"), col("__n_big")).as("dup_bigram_frac"),
        ratio6(col("__top_big"), col("__n_big")).as("top_bigram_frac"))
  }

  /** CCNet-style perplexity-band filtering: keep the docs whose
    * unigram-LM NLL ([[unigramNll]]) sits in the middle half of the
    * corpus — the low band is boilerplate, the high band gibberish; the
    * middle is where trainable text lives.
    *
    * The band edges are ORDER STATISTICS (the k25-th / k75-th smallest
    * micro-NLL, k = (n-1) div 4 and 3(n-1) div 4), not interpolated
    * percentiles: interpolation arithmetic differs across engines in the
    * last ulp and a threshold that moves one ulp flips boundary docs —
    * the d19 hash-fail class all over again. Order statistics are pure
    * integer selection, identical everywhere.
    *
    * Scale shape: NO global row sort or rank window — the selection runs
    * on the (micro, count) HISTOGRAM, whose size is bounded by the
    * micro-NLL grid (~tens of thousands of distinct values for real
    * corpora), not the corpus; the running-sum window over it is a
    * deliberately small single-partition step, and the two thresholds
    * broadcast back into a codegen'd integer filter. */
  def unigramNllBand(df: DataFrame, idCol: String, textCol: String)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // band selection runs on the INTEGER micro-nats — never the public
    // double, whose * 1e6 round-trip can truncate one off (see
    // unigramNllMicro)
    val scored = unigramNllMicro(df, idCol, textCol)
      .withColumn("__micro", col("__nll_micro"))
      .transform(Parallelism.materialize(_)) // feeds the histogram AND the final filter
    val hist = scored.groupBy(col("__micro")).agg(count(lit(1)).as("__c"))
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(Window.orderBy(col("__micro"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val th = cum.crossJoin(cum.agg(sum(col("__c")).as("__n")).select(
        expr("(__n - 1) DIV 4").as("__k25"), expr("(3 * (__n - 1)) DIV 4").as("__k75")))
      .agg(
        min(when(col("__cum") > col("__k25"), col("__micro"))).as("__v25"),
        min(when(col("__cum") > col("__k75"), col("__micro"))).as("__v75"))
    scored.crossJoin(broadcast(th))
      .filter(col("__micro").between(col("__v25"), col("__v75")))
      .select(col(idCol), col("n_tokens"),
        microToNll(col("__nll_micro")).as("unigram_nll"))
  }

  /** Metrics + threshold filter with the metric tree evaluated ONCE.
    *
    * The naive `withTextMetrics(df).filter(quality_score >= x)` shape is
    * a trap: Catalyst pushes the filter through the metrics projection
    * and inlines the full alias chain into the predicate (predicate
    * pushdown has no expensive-expression guard, unlike CollapseProject),
    * so every regex runs TWICE per surviving row — once in the pushed
    * filter, once in the output projection. The eager localCheckpoint is
    * a deliberate materialization barrier: metrics once, filter on the
    * stored columns. Measured 2.7x on the d11 shape at sf0.1. The
    * checkpoint blocks are ContextCleaner-freed with the frame. */
  def qualityFiltered(df: DataFrame, textCol: String,
      minScore: Double, minTokens: Int, maxTokens: Int,
      maxDigitRatio: Double)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame =
    withTextMetrics(Parallelism.widen(df), textCol)
      .transform(Parallelism.materialize(_))
      .filter(col("quality_score") >= minScore &&
        col("n_tokens").between(minTokens, maxTokens) &&
        col("digit_ratio") < maxDigitRatio)

  /** Sliding-window token chunking: normalized tokens windowed into
    * `chunkSize`-token chunks every `stride` tokens, exploded to
    * (id, chunk_idx, chunk) — the context-window prep step between
    * cleaning and tokenization. The interpreted transform/slice lambdas
    * run once per CHUNK (tokens/stride rows), not per token, so the
    * explode volume, not lambda overhead, dominates — same scaling shape
    * as any corpus tokenize pass. Narrow (no shuffle). */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    // stride > chunkSize would silently drop the tokens between windows
    // (positions chunkSize..stride-1 of every stride never land in any
    // chunk) — reject rather than define gap semantics nobody wants
    require(stride <= chunkSize,
      s"stride ($stride) must be <= chunkSize ($chunkSize): larger strides leave token gaps no chunk covers")
    val toks = split(normalize(col(textCol)), " ")
    val nChunks = greatest(lit(1),
      (ceil((size(toks) - lit(chunkSize)).cast("double") / stride) + 1).cast("int"))
    Parallelism.widen(df) // explode amplification: widen a few-file scan
      .filter(length(normalize(col(textCol))) > 0)
      .select(col(idCol), toks.as("__toks"), nChunks.as("__n_chunks"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__n_chunks") - 1),
          i => concat_ws(" ", slice(col("__toks"), i * stride + 1, lit(chunkSize)))))
          .as(Seq("chunk_idx", "chunk")))
  }

  /** Per-document top-`topK` TF-IDF terms — the keyword/topic-tagging
    * primitive (domain routing, index keys, cluster naming). IDF is
    * `ln(N/df)` quantized to integer micro-units BEFORE multiplying by
    * the term frequency (the [[unigramNll]] portability discipline — the
    * raw double product is engine-rounding-dependent, the integer one is
    * not), so `score_micro = tf · idf_micro` is exact BIGINT math.
    *
    * Shape at 100 TB: one tokenize pass materialized once (feeds the
    * per-doc tf aggregate and the document-frequency aggregate — two
    * different shuffles), df as a token-keyed aggregate over the tf
    * frame (already one row per (doc, token) — no re-tokenization), the
    * per-doc top-k window partitioned by doc (bounded by doc length,
    * never a global sort). The token-keyed join is a shuffle join, not a
    * broadcast: the vocabulary at corpus scale is itself huge. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 3)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK > 0, "topK must be positive")
    val tf = Parallelism.widen(df)
      .select(col(idCol), explode(split(normalize(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .transform(Parallelism.materialize(_)) // feeds BOTH the df aggregate and the join
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("__df"))
    val total = df.agg(count(lit(1)).as("__n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(total))
      .select(col(idCol), col("token"),
        (col("tf") *
          (log(col("__n_docs").cast("double") / col("__df").cast("double"))
            .cast("decimal(28,6)") * lit(1000000)).cast("long")).as("score_micro"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col(idCol), col("rnk"), col("token"), col("score_micro"))
  }

  /** Deterministic weighted mixture sampling: draw a sample whose strata
    * (domain/source/language) hit target proportions `weightsPpm`
    * (parts-per-million, exact integers) — the data-mixing step every
    * pretraining recipe runs (e.g. The Pile / Dolma domain weights).
    * The sample is as large as the scarcest stratum allows with NO
    * oversampling: `T = min_g((n_g · 1e6) div w_g)` total rows,
    * `keep_g = (w_g · T) div 1e6` from stratum g. Strata absent from
    * `weightsPpm` are dropped. Selection within a stratum is by portable
    * hash order of the id — reproducible on any engine, any
    * partitioning, any corpus ordering.
    *
    * Scale shape: NO per-stratum global sort or full-partition rank
    * window (a stratum is ~the whole corpus / #strata — a single-reducer
    * sort at 100 TB). Selection runs on a bounded (stratum × 65536)
    * bucket HISTOGRAM of the hash's top 16 bits — the [[unigramNllBand]]
    * order-statistic trick: full buckets below the per-stratum boundary
    * bucket pass with a codegen'd filter, and only the boundary bucket
    * (≈ n_g/65536 rows) is rank-windowed. */
  def mixtureSample(df: DataFrame, idCol: String, stratCol: String,
      weightsPpm: Map[String, Long])(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(weightsPpm.nonEmpty && weightsPpm.values.forall(_ > 0),
      "weightsPpm must be non-empty with positive weights")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = broadcast(weightsPpm.toSeq.sortBy(_._1).toDF(stratCol, "__w"))
    val hashed = df
      .join(wdf, stratCol) // inner: unweighted strata drop out
      .select(col(idCol), col(stratCol), col("__w"),
        portableHash60(concat_ws(":", lit("mix"), col(idCol).cast("string"))).as("__h"))
      // top 16 of the 60 hash bits: (bucket, h) order == h order
      .withColumn("__bkt", expr("__h DIV 17592186044416"))
      .transform(Parallelism.materialize(_)) // feeds counts, histogram, and final filter
    val counts = hashed.groupBy(col(stratCol), col("__w"))
      .agg(count(lit(1)).as("__n"))
    // a WEIGHTED stratum with zero rows would silently vanish from the
    // min (counts comes from an inner join), letting every other stratum
    // keep its full quota and skewing the mixture off-target with no
    // signal — the scarcest-stratum rule says the sample is EMPTY then,
    // so fail loudly instead
    val present = counts.select(col(stratCol)).collect().map(_.getString(0)).toSet
    val missing = weightsPpm.keySet.diff(present)
    require(missing.isEmpty,
      s"mixtureSample: weighted strata with no rows: ${missing.toSeq.sorted.mkString(", ")} — " +
        "drop them from weightsPpm or fix the corpus")
    val t = counts.agg(min(expr("(__n * 1000000) DIV __w")).as("__t"))
    val keep = counts.crossJoin(broadcast(t))
      .select(col(stratCol), expr("(__w * __t) DIV 1000000").as("__keep"))
    val cum = hashed.groupBy(col(stratCol), col("__bkt"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col(stratCol)).orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(keep), stratCol)
    // boundary bucket: first where the running count reaches the quota;
    // it owes keep - (rows in strictly-lower buckets)
    val bound = broadcast(cum
      .filter(col("__cum") >= col("__keep"))
      .groupBy(col(stratCol))
      .agg(min(struct(col("__bkt"), (col("__keep") - col("__cum") + col("__c")).as("__take"))).as("__b"))
      .select(col(stratCol), col("__b.__bkt").as("__bstar"), col("__b.__take").as("__takeB")))
    val joined = hashed.join(bound, stratCol)
    val below = joined.filter(col("__bkt") < col("__bstar"))
    val atBoundary = joined.filter(col("__bkt") === col("__bstar"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratCol)).orderBy(col("__h"), col(idCol))))
      .filter(col("__rn") <= col("__takeB"))
    below.select(col(idCol), col(stratCol))
      .unionByName(atBoundary.select(col(idCol), col(stratCol)))
  }

  /** Token-budget corpus fill — "spend a B-token budget on the
    * best-scoring documents": the greedy prefix of the corpus in
    * `(score desc, id asc)` order whose cumulative `tokensCol` stays
    * within `budgetTokens`. The first document that would overflow the
    * budget is EXCLUDED (strict prefix — a training run can't read half
    * a document). This is how pretraining recipes cut a scored pool down
    * to the tokens they will actually consume.
    *
    * The global cumulative runs through [[Prefix.cumSumBy]] (range
    * exchange + parallel partition windows), not a partition-less
    * window — the selection stays distributed at any corpus size. Output
    * = input columns + `cum_<tokensCol>`. */
  def tokenBudgetFill(df: DataFrame, idCol: String, tokensCol: String,
      scoreCol: String, budgetTokens: Long)(
      implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be non-negative, got $budgetTokens")
    Prefix.cumSumBy(df, Seq(col(scoreCol).desc, col(idCol).asc), Seq(tokensCol))
      .filter(col(s"cum_$tokensCol") <= budgetTokens)
  }

  /** Epoch-mixing plan — the repetition schedule of a training recipe
    * ("wiki ×3.5, books ×2, web ×0.25"): emits one `(row, epoch)` pair
    * per planned pass over each document. `epochsPpm` maps a domain to
    * its epoch count in parts-per-million (3500000 = 3.5 epochs);
    * unmapped domains default to exactly one epoch. Whole epochs
    * replicate every document; the fractional remainder admits each
    * document INDEPENDENTLY with probability `rem/1e6` by portable md5
    * hash — deterministic across engines/partitionings, and at corpus
    * scale the realized token share converges to the recipe's target
    * (the law-of-large-numbers sampling the recipes themselves rely on).
    *
    * Pure map-side work: a broadcast join against the bounded recipe
    * map and a per-row `sequence` explode (max fan-out = ⌈max epochs⌉,
    * a recipe constant) — no shuffle at all. */
  def epochPlan(df: DataFrame, idCol: String, domainCol: String,
      epochsPpm: Map[String, Long]): DataFrame = {
    require(epochsPpm.nonEmpty && epochsPpm.values.forall(_ >= 0),
      "epochsPpm must be non-empty with non-negative epoch counts")
    require(epochsPpm.values.forall(_ <= 1000L * 1000000L),
      "epochsPpm above 1000 epochs is a recipe bug, not a plan")
    val spark = df.sparkSession
    import spark.implicits._
    val recipe = broadcast(epochsPpm.toSeq.sortBy(_._1).toDF(domainCol, "__ppm"))
    df.join(recipe, Seq(domainCol), "left")
      .withColumn("__ppm", coalesce(col("__ppm"), lit(1000000L)))
      .withColumn("__n",
        (expr("__ppm DIV 1000000")
          + when(
            pmod(portableHash60(concat_ws(":", lit("epoch"), col(idCol).cast("string"))),
              lit(1000000L)) < col("__ppm") % 1000000L, 1L)
            .otherwise(0L)).cast("int"))
      .withColumn("epoch",
        explode(when(col("__n") >= 1, sequence(lit(1), col("__n")))
          .otherwise(array().cast("array<int>"))))
      .drop("__ppm", "__n")
  }

  /** Canonical text normalization used by fingerprints/dedup: lowercase,
    * collapse all non-alphanumeric runs to single spaces, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Content fingerprint: md5 of the normalized text. Identical modulo
    * case/punctuation/whitespace => identical fingerprint. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Stable 60-bit positive hash from md5 — engine-portable (any engine
    * with md5 + hex parsing reproduces it bit-for-bit), used where results
    * must be verifiable outside Spark. Hot paths use xxhash64 instead. */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Attach the standard metric set to a DataFrame. The doubled text is
    * projected into a scratch column once so stop_density and quality_score
    * share one derivation per row instead of one per stopword probe. */
  def withTextMetrics(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    val d = "__graft_doubled"
    df.withColumn(d, doubledText(c))
      .withColumn("n_tokens", tokenCount(c))
      .withColumn("alpha_ratio", alphaRatio(c))
      .withColumn("digit_ratio", digitRatio(c))
      .withColumn("stop_density", stopwordDensityIn(c, col(d)))
      .withColumn("quality_score", qualityFromMetrics(
        col("alpha_ratio"), col("stop_density"), col("n_tokens"), col("digit_ratio")))
      .drop(d)
  }
}
