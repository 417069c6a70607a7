package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a corpus job (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units").
  *
  * The reference engine only CONSUMES tokenizers; training one over a
  * 100 TB corpus is itself a large Spark job, and its shape matters:
  *
  *  - the corpus is touched ONCE, by the word-count aggregation (the same
  *    explode -> groupBy as the vocabulary query); everything after —
  *    pair counting, merge selection, merge application, every training
  *    iteration — runs on the DISTINCT-WORD vocabulary weighted by
  *    frequency, exactly like single-node BPE trainers. Vocabulary size
  *    grows ~logarithmically with corpus size, so iterations cost the
  *    same at sf0.001 and at 100 TB;
  *  - each iteration's top-pair selection collects ONE row (metadata
  *    plane); the merge application is a narrow per-row fold, no shuffle;
  *  - symbols start as characters plus an explicit `</w>` end-of-word
  *    symbol, so merges can learn whole-word units.
  */
object Bpe {

  /** Frequency-weighted vocabulary: one row per distinct normalized word.
    * The ONLY corpus-wide stage in BPE training. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    Parallelism.widen(docs)
      .select(explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))

  /** Initial symbol sequence for a word: its characters plus `</w>`. */
  def toSymbols(word: Column): Column =
    concat(split(word, ""), array(lit("</w>")))

  /** Adjacent-pair occurrences of a symbol-array column, one struct row
    * per position. Guarded: a fully-merged single-symbol word has no
    * pairs, and `sequence(1, 0)` would otherwise produce the DESCENDING
    * range [1, 0] whose element_at(…, 2)/(…, 0) probes throw under ANSI
    * mode (the Dedup.dupSpans:348 lesson). */
  private def adjacentPairs(symbols: Column): Column =
    when(size(symbols) < 2, array().cast("array<struct<left_sym:string,right_sym:string>>"))
      .otherwise(transform(sequence(lit(1), size(symbols) - 1),
        i => struct(
          element_at(symbols, i).as("left_sym"),
          element_at(symbols, i + lit(1)).as("right_sym"))))

  /** Frequency-weighted adjacent-pair counts over a (symbols, wc) vocab
    * frame — the quantity BPE maximizes each iteration. */
  def pairCountsFromSymbols(vocabSyms: DataFrame): DataFrame =
    vocabSyms
      .select(explode(adjacentPairs(col("symbols"))).as("__p"), col("wc"))
      .groupBy(col("__p.left_sym").as("left_sym"), col("__p.right_sym").as("right_sym"))
      .agg(sum(col("wc")).as("pair_count"))

  /** Top-k merge candidates over the raw corpus (characters + `</w>`),
    * ranked by weighted count with a deterministic (left, right) tie
    * break. Two-phase top-k (TakeOrderedAndProject) — no global sort. */
  def pairCounts(docs: DataFrame, textCol: String, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = pairCountsFromSymbols(
        vocab(docs, textCol).select(toSymbols(col("word")).as("symbols"), col("wc")))
      .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
      .limit(topK)
    ranked.withColumn("rnk",
        row_number().over(Window.orderBy(
          col("pair_count").desc, col("left_sym"), col("right_sym"))))
      .select(col("rnk"), col("left_sym"), col("right_sym"), col("pair_count"))
  }

  /** Apply one merge greedily left-to-right to a symbol array — the BPE
    * update rule. A fold, not a regex: the accumulator's last element is
    * replaced when it is `left` and the incoming symbol is `right`;
    * because the merged symbol differs from `left`, overlapping
    * occurrences ("aaa" under (a,a)) merge exactly as greedy BPE does. */
  def applyMerge(symbols: Column, left: String, right: String): Column =
    aggregate(symbols,
      array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 &&
            element_at(acc, size(acc)) === lit(left) && s === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
          .otherwise(concat(acc, array(s))))

  /** Train `nMerges` BPE merges. Returns the ordered merge table
    * (left, right, pair_count at selection time). One corpus pass, then
    * vocab-sized iterations; each selection collects a single row. */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): Seq[(String, String, Long)] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    var syms = vocab(docs, textCol)
      .select(toSymbols(col("word")).as("symbols"), col("wc"))
      .transform(Parallelism.materialize(_)) // corpus pass runs once; iterations reuse
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    while (i < nMerges) {
      val top = pairCountsFromSymbols(syms)
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .limit(1).collect()
      if (top.isEmpty) { i = nMerges } // vocabulary fully merged
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((l, r, c))
        // narrow per-row fold; eager checkpoint keeps lineage flat across
        // iterations (vocab-sized, cheap)
        syms = Parallelism.rematerialize(
          syms.select(applyMerge(col("symbols"), l, r).as("symbols"), col("wc")), syms)
        i += 1
      }
    }
    merges.toSeq
  }

  /** Segment words with a trained merge table: the inference half of BPE
    * (apply merges in training order). Returns (word, symbols).
    *
    * The expression tree is flattened every `checkpointEvery` merges —
    * an unbroken fold would nest one `aggregate` lambda per merge into a
    * single column, and a production merge table (10k-50k merges) would
    * stack-overflow Catalyst analysis long before execution. */
  def segment(words: DataFrame, wordCol: String, merges: Seq[(String, String)],
      checkpointEvery: Int = 16)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    merges.grouped(checkpointEvery).foldLeft(
      words.select(col(wordCol).as("word"), toSymbols(col(wordCol)).as("symbols"))) {
      case (df, chunk) =>
        Parallelism.rematerialize(
          chunk.foldLeft(df) { case (d, (l, r)) =>
            d.withColumn("symbols", applyMerge(col("symbols"), l, r))
          }, df)
    }
  }
}
