package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based corpus filtering — the "train a cheap classifier, score
  * every document" stage that modern pretraining pipelines run between
  * heuristic quality gates and expensive near-dup work (FineWeb-Edu and
  * DCLM both select their corpora this way; DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling" —
  * is the hashed-feature variant). The reference engine has no model
  * stage at all; this is north-star surface.
  *
  * Two scale shapes, deliberately contrasted:
  *
  *  - [[nbTrain]]/[[nbScore]] — multinomial Naive Bayes over unigrams.
  *    The model is VOCABULARY-sized, so scoring joins it token-keyed
  *    (shuffle join, AQE broadcasts when it turns out small) — the same
  *    reasoning as `TextAnalysis.unigramNll`: at 100 TB the vocabulary
  *    itself is huge and a forced broadcast OOMs.
  *  - [[dsirWeights]] — DSIR importance log-ratios over HASHED unigram
  *    buckets. The model is B rows by construction (B = `buckets`,
  *    default 1024), so it broadcasts unconditionally: scoring is a
  *    zero-shuffle-on-the-model map-side join no matter how large the
  *    corpus. That bounded-feature trick is exactly why DSIR scales to
  *    full-corpus selection.
  *
  * Both training passes are one explode + one groupBy (map-side partial
  * aggregation); neither ever collects data to the driver.
  *
  * Portability discipline (shared with the NLL family): every log is
  * quantized to integer micro-nats BEFORE any arithmetic that could
  * differ across engines — each `ln` is quantized separately and
  * combined in LONG arithmetic, so the only floating-point op an engine
  * performs is `ln(double/double)` itself, which is bit-stable across
  * the JVM and C libms this repo oracles against (gated since d19). The
  * public score is scale-shifted back through DECIMAL(18,6) → DOUBLE.
  * Scores are plain SUMS of per-token micro-weights (no division), so
  * there is no rounding step at all.
  */
object Classifier {

  /** A trained token-weight model: `weights` is `(token, w_micro LONG)`,
    * one row per training-vocabulary token; `scalars` is exactly one row
    * `(prior_micro LONG, unseen_micro LONG)`. Both are plain DataFrames
    * so a model persists to any table/format and reloads cluster-wide —
    * there is no driver-side state. */
  final case class NbModel(weights: DataFrame, scalars: DataFrame)

  private def tokens(df: DataFrame, textCol: String, keep: Column*): DataFrame =
    Parallelism.widen(df)
      .select(keep :+ explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("token"): _*)
      .filter(length(col("token")) > 0)

  /** `ln(num/den)` quantized to micro-nats as LONG — the d19 quantizer. */
  private def lnMicro(num: Column, den: Column): Column =
    (log(num.cast("double") / den.cast("double"))
      .cast("decimal(28,6)") * lit(1000000)).cast("long")

  /** Train a multinomial Naive Bayes quality model.
    *
    * `labelCol` must be BOOLEAN (true = positive / keep-worthy class).
    * Per-token weight is the smoothed class log-odds
    * `ln((n_pos+1)/(N_pos+V)) - ln((n_neg+1)/(N_neg+V))` (Laplace over
    * the joint vocabulary V); `prior_micro` is the document-count prior
    * log-odds and `unseen_micro` the weight of a token absent from
    * training (both classes' smoothing floor). Training with an empty
    * class is a model that can only parrot its prior — that is a caller
    * bug, and it fails LOUDLY via `raise_error` rather than emitting
    * NULL weights from `ln(0)`.
    *
    * One explode + one token groupBy (shuffle) + two single-row
    * aggregates that cross-join broadcast into the projection. */
  def nbTrain(df: DataFrame, textCol: String, labelCol: String): NbModel = {
    val tok = tokens(df, textCol, col(labelCol).cast("boolean").as("__y"))
    val perTok = tok.groupBy("token").agg(
      sum(when(col("__y"), 1L).otherwise(0L)).as("__np"),
      sum(when(!col("__y"), 1L).otherwise(0L)).as("__nn"))
    val totals = perTok.agg(
      sum(col("__np")).as("__tp"), sum(col("__nn")).as("__tn"),
      count(lit(1)).as("__v"))
    val docs = df.agg(
      sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("__dp"),
      sum(when(!col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("__dn"))
    val guard = when(col("__dp") > 0 && col("__dn") > 0, lit(true))
      .otherwise(raise_error(lit(
        "nbTrain: both classes must be non-empty (labelCol must take both values)")))
    val weights = perTok.crossJoin(broadcast(totals))
      .select(col("token"),
        (lnMicro(col("__np") + 1, col("__tp") + col("__v"))
          - lnMicro(col("__nn") + 1, col("__tn") + col("__v"))).as("w_micro"))
    val scalars = totals.crossJoin(docs)
      .where(guard)
      .select(
        (lnMicro(col("__dp"), col("__dp") + col("__dn"))
          - lnMicro(col("__dn"), col("__dp") + col("__dn"))).as("prior_micro"),
        (lnMicro(lit(1), col("__tp") + col("__v"))
          - lnMicro(lit(1), col("__tn") + col("__v"))).as("unseen_micro"))
    NbModel(weights, scalars)
  }

  /** Score every document under a trained model: `nb_score_micro` =
    * prior + Σ per-token log-odds (unseen tokens contribute the model's
    * smoothing floor), `nb_score` its DECIMAL-shifted double form, and
    * `keep` = score > 0 (positive class more likely). Documents that
    * normalize to zero tokens are absent from the output — same contract
    * as the NLL family.
    *
    * The weight join is token-keyed (model is vocab-sized — see class
    * note); the one-row scalars frame broadcasts. */
  def nbScore(df: DataFrame, idCol: String, textCol: String, model: NbModel): DataFrame =
    tokens(df, textCol, col(idCol))
      .join(model.weights, Seq("token"), "left")
      .crossJoin(broadcast(model.scalars))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (first(col("prior_micro"))
          + sum(coalesce(col("w_micro"), col("unseen_micro")))).as("nb_score_micro"))
      .select(col(idCol), col("n_tokens"), col("nb_score_micro"),
        microShift(col("nb_score_micro")).as("nb_score"),
        (col("nb_score_micro") > 0).as("keep"))

  /** Global top-k selection by an integer weight column — the DSIR
    * RESAMPLING step ([[dsirWeights]] scores; this selects the budget),
    * deterministic under ties via `(weight desc, id asc)`.
    *
    * Two regimes, switched on k:
    *
    *  - `k <= exactLimitThreshold`: `orderBy.limit(k)` — Spark plans
    *    TakeOrderedAndProject (per-partition heap + driver merge of
    *    k·partitions rows), already a distributed top-k, NOT a global
    *    sort. Right up to ~100k rows of driver merge.
    *  - larger k (a 100 TB corpus selecting a billion-doc budget):
    *    driver-merging k·partitions rows is the scale-killer, so prune
    *    by a COARSE WEIGHT HISTOGRAM instead: bin counts (one map-side
    *    aggregate over ~hundreds of bins — the histogram is
    *    range-bounded, not corpus-bounded), find the threshold bin on
    *    the driver from bin COUNTS only, pass every row strictly above
    *    it through un-sorted (they are all in the top-k regardless of
    *    order), and rank only the ONE boundary bin for the remainder.
    *    Wall-clock = two scans + a sort of one bin's rows; no stage
    *    ever sees k rows in one place.
    *
    * The histogram collect is bin counts, not rows — bounded by the
    * weight RANGE over `binWidth` (guarded loudly), independent of
    * corpus size. `weightCol` must be non-null ([[dsirWeights]] /
    * [[nbScore]] guarantee it); a NULL weight cannot be ranked. */
  def topKByWeight(df: DataFrame, idCol: String, weightCol: String, k: Int,
      exactLimitThreshold: Int = 100000, binWidth: Long = 1L << 20): DataFrame = {
    require(k >= 0, s"k must be non-negative, got $k")
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    if (k == 0) return df.limit(0)
    val ord = Seq(col(weightCol).desc, col(idCol).asc)
    if (k <= exactLimitThreshold) return df.orderBy(ord: _*).limit(k)
    // floor-division bin: same weight => same bin, so boundary ties never
    // straddle bins and only the threshold bin needs exact ranking
    val bin = floor(col(weightCol).cast("double") / binWidth.toDouble).cast("long")
    val hist = df.groupBy(bin.as("__bin")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__bin").desc).collect()
    require(hist.length <= (1 << 20),
      s"topKByWeight: ${hist.length} histogram bins — widen binWidth (the " +
        "bin count must stay driver-metadata-sized)")
    var cum = 0L
    var i = 0
    while (i < hist.length && cum + hist(i).getLong(1) < k) {
      cum += hist(i).getLong(1); i += 1
    }
    if (i >= hist.length) return df // k >= total rows: everything selected
    val tBin = hist(i).getLong(0)
    val above = df.filter(bin > tBin)
    // degenerate guard, LOUD: when most of the top-k ties into the one
    // boundary bin, the boundary rank below IS the driver-merging
    // orderBy.limit this path exists to avoid — shrinking binWidth fixes a
    // spiky RANGE, but literally-equal weights cannot be split by any bin
    // width, so fail with the diagnosis instead of silently OOMing the
    // driver at k·partitions rows
    val boundaryK = (k - cum).toInt
    require(boundaryK <= math.max(exactLimitThreshold, 1 << 20),
      s"topKByWeight: the boundary weight bin holds $boundaryK of the " +
        s"top-$k — shrink binWidth (spiky range) or accept that " +
        "literally-tied weights admit no cheap deterministic top-k")
    val boundary = df.filter(bin === tBin)
      .orderBy(ord: _*).limit(boundaryK)
    above.unionByName(boundary)
  }

  /** Persist a trained model as two parquet directories (`weights/`,
    * `scalars/`). A model is an immutable training ARTIFACT, not a
    * mutating store, so plain parquet (not a versioned table) is the
    * right weight: reload is a bare scan, and republishing a model is
    * writing a new path. */
  def saveModel(model: NbModel, path: String): Unit = {
    model.scalars.write.mode("overwrite").parquet(s"$path/scalars")
    // vocab-sized: keep parallel writer output (no coalesce(1) — a 100 TB
    // corpus's vocabulary is itself a big frame)
    model.weights.write.mode("overwrite").parquet(s"$path/weights")
  }

  /** Reload a [[saveModel]] artifact. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): NbModel =
    NbModel(
      weights = spark.read.parquet(s"$path/weights"),
      scalars = spark.read.parquet(s"$path/scalars"))

  /** Exact ROC AUC of an integer score against a boolean truth — the
    * metric that decides whether a trained filter is worth deploying,
    * computed distributed and EXACTLY (no sampling, no trapezoid
    * approximation): AUC is the Mann-Whitney statistic
    * `P(score_pos > score_neg) + ½·P(score_pos = score_neg)`, which over
    * per-score class counts is `Σ_s p_s·(2·negBelow_s + n_s) / (2·P·N)`.
    * `negBelow` is a global cumulative sum — the classic single-task
    * window trap — computed via [[Prefix.cumSum]] over the DISTINCT
    * per-score aggregate instead (two bounded shuffles, nothing
    * corpus-sized in one task; ties exact by construction since tied
    * rows collapse into one aggregate row first).
    *
    * All arithmetic is exact LONG until the single final IEEE division
    * (the q47 discipline), so the emitted double is bit-identical on any
    * engine. Returns one row: `(p_total, n_total, auc)`. */
  def aucExact(scored: DataFrame, scoreCol: String, labelCol: String)(
      implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    val perScore = scored.groupBy(col(scoreCol).as("__s")).agg(
      sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("__p"),
      sum(when(!col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("__n"))
    Prefix.cumSum(perScore, "__s", Seq("__n"))
      .select(col("__p"), col("__n"),
        (col("__p") * (lit(2L) * (col("cum___n") - col("__n")) + col("__n"))).as("__u2"))
      .agg(sum(col("__p")).as("p_total"), sum(col("__n")).as("n_total"),
        sum(col("__u2")).as("__u2s"))
      .select(col("p_total"), col("n_total"),
        // single-class input is a caller bug: 0/0 would emit NaN and a
        // deployment gate comparing `auc > x` silently evaluates false —
        // fail loudly like nbTrain's raise_error on the same condition
        when(col("p_total") === 0L || col("n_total") === 0L,
          raise_error(lit("aucExact: the scored frame holds a single " +
            "class — AUC is undefined (0/0)")).cast("double"))
          .otherwise(col("__u2s").cast("double")
            / (lit(2L) * col("p_total") * col("n_total")).cast("double")).as("auc"))
  }

  /** Operating-point sweep for a scored corpus: per candidate threshold,
    * exact confusion counts and the derived precision/recall/F1 — what a
    * pipeline owner reads to pick `nbThresholdMicro`. The thresholds are
    * a bounded literal list (dozens), exploded per row and aggregated in
    * one map-side-combining pass — corpus scanned once for the whole
    * sweep, counts exact LONGs, ratios single IEEE divisions. Rows with
    * `score > threshold` are predicted positive (the [[nbScore]] keep
    * convention). */
  def evalThresholds(scored: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.size <= 10000,
      s"thresholds must be a bounded non-empty list, got ${thresholds.size}")
    val f1den = lit(2L) * col("tp") + col("fp") + col("fn")
    scored
      .select(col(scoreCol).as("__s"), col(labelCol).cast("boolean").as("__y"),
        explode(lit(thresholds.distinct.sorted.toArray)).as("threshold"))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("__s") > col("threshold") && col("__y"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("__s") > col("threshold") && !col("__y"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("__s") <= col("threshold") && col("__y"), 1L).otherwise(0L)).as("fn"),
        sum(when(col("__s") <= col("threshold") && !col("__y"), 1L).otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") === 0L, lit(0.0))
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        when(col("tp") + col("fn") === 0L, lit(0.0))
          .otherwise(col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .as("recall"),
        when(f1den === 0L, lit(0.0))
          .otherwise((lit(2L) * col("tp")).cast("double") / f1den.cast("double"))
          .as("f1"))
  }

  /** Exact micro-nats → nats scale shift, emitted as DOUBLE (DECIMAL
    * output columns hash-mismatch in the driver's canonicalizer). Shares
    * [[TextAnalysis.microToDouble]] at THIS caller's precision bounds —
    * the conversion is portability-critical and must never drift between
    * its two homes. */
  private def microShift(micro: Column): Column =
    TextAnalysis.microToDouble(micro, 20, 26)

  /** DSIR importance weights over hashed unigram features.
    *
    * `targetCol` (BOOLEAN) marks the documents whose distribution the
    * selection should move toward; the RAW distribution is the whole
    * input frame — DSIR's own setup (raw = the corpus being selected
    * from). Each token hashes to one of `buckets` buckets
    * (`portableHash60 % B` — engine-portable, verifiable outside Spark);
    * per-bucket importance is the smoothed log-ratio
    * `ln((n_target+1)/(N_target+B)) - ln((n_raw+1)/(N_raw+B))`, and a
    * document's weight is the sum over its tokens. `keep` = weight > 0
    * (document looks more target-like than corpus-average) — the
    * threshold form of DSIR selection; callers wanting top-k resampling
    * rank on `dsir_weight_micro` with their own budget.
    *
    * Scale: the bucket table is AT MOST B rows regardless of corpus
    * size, so it broadcasts unconditionally and scoring never shuffles
    * the model — the contrast with [[nbScore]] is the point (see class
    * note). One explode + one bucket groupBy for training, one explode +
    * map-side join + doc groupBy for scoring. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      targetCol: String, buckets: Int = 1024)(
      implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = lit(buckets.toLong)
    // materialized once, like unigramNllMicro: the tokenized corpus feeds
    // BOTH the per-bucket training aggregate and the scoring join probe —
    // without the barrier the full-corpus tokenize (normalize regex +
    // explode + hash) runs twice, doubling the most expensive stage
    val tok = Parallelism.materialize(
      tokens(df, textCol, col(idCol), col(targetCol).cast("boolean").as("__t"))
        .withColumn("bucket",
          pmod(TextAnalysis.portableHash60(col("token")), b)))
    val perBucket = tok.groupBy("bucket").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
      count(lit(1)).as("__nr"))
    val totals = perBucket.agg(sum(col("__nt")).as("__tt"), sum(col("__nr")).as("__tr"))
    val ratios = perBucket.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (lnMicro(col("__nt") + 1, col("__tt") + b)
          - lnMicro(col("__nr") + 1, col("__tr") + b)).as("lr_micro"))
    // smoothing floor for buckets unseen at train time (only reachable when
    // scoring a different frame than the training corpus) — a one-row
    // scalar, NOT a ratios column: a join miss would NULL a per-row floor
    val floor = totals.select(
      (lnMicro(lit(1), col("__tt") + b)
        - lnMicro(lit(1), col("__tr") + b)).as("__floor_micro"))
    tok.join(broadcast(ratios), Seq("bucket"), "left")
      .crossJoin(broadcast(floor))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("lr_micro"), col("__floor_micro"))).as("dsir_weight_micro"))
      .select(col(idCol), col("n_tokens"), col("dsir_weight_micro"),
        microShift(col("dsir_weight_micro")).as("dsir_weight"),
        (col("dsir_weight_micro") > 0).as("keep"))
  }
}
