package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, latest-per-key (the reference's CDC dedup,
  * `jibaro/datalake/cdc.py:132-142`), MinHash+LSH near-dup, SimHash, and
  * exact n-gram Jaccard verification.
  *
  * Scale design (100 TB):
  *  - signatures (minhash/simhash) are computed per-row with array
  *    expressions — NO explode, NO shuffle until the band/bucket join;
  *  - candidate generation shuffles only (id, bandKey) pairs — a few
  *    dozen bytes per doc, not the text;
  *  - exact verification (Jaccard) runs only on LSH candidates;
  *  - the window dedup shuffles once on the key, exactly like the
  *    reference chose `row_number` over `drop_duplicates` for
  *    partition-correctness (`avro_handler.py:29-30`).
  */
object Dedup {

  /** Keep the newest row per key — `row_number() over (partition by keys
    * order by ordering desc...) = 1`. Deterministic when `ordering` is a
    * total order (pass a tiebreaker column). */
  def latestPerKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact dedup on a fingerprint: one representative row per fingerprint
    * value (the one with the smallest `idCol`). Hash-aggregation — a single
    * shuffle on the fingerprint. */
  def exactDedup(df: DataFrame, fingerprintCol: Column, idCol: String): DataFrame =
    latestPerKey(
      df.withColumn("__fp", fingerprintCol),
      Seq("__fp"),
      Seq(col(idCol).asc)
    ).drop("__fp")

  // ---------------------------------------------------------------- MinHash

  /** Word `shingleSize`-grams of the normalized text (whole text as a single
    * shingle when shorter). */
  def wordShingles(text: Column, shingleSize: Int = 3): Column = {
    val words = split(TextAnalysis.normalize(text), " ")
    when(size(words) < shingleSize, array(concat_ws(" ", words)))
      .otherwise(
        transform(
          sequence(lit(1), size(words) - (shingleSize - 1)),
          i => concat_ws(" ", slice(words, i, lit(shingleSize)))))
  }

  /** MinHash signature: `numHashes` 64-bit minima over the shingle set,
    * seeded hash per position. Per-row computation, no shuffle. */
  def minhashSignature(text: Column, numHashes: Int = 64, shingleSize: Int = 3): Column = {
    val shingles = wordShingles(text, shingleSize)
    array((0 until numHashes).map { seed =>
      aggregate(
        shingles,
        lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(s, lit(seed))))
    }: _*)
  }

  /** Estimated Jaccard similarity between two signatures: fraction of equal
    * positions. */
  def estimatedJaccard(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0),
      (acc, x) => acc + x
    ).cast("double") / size(sigA)

  /** LSH banding: explode the signature into `bands` band keys. Each output
    * row is (…, band, band_key); docs sharing any (band, band_key) are
    * near-dup candidates. */
  def lshBands(df: DataFrame, sigCol: String, bands: Int): DataFrame = {
    val sig = col(sigCol)
    // INTEGER rows-per-band with a loud divisibility guard: `size/bands`
    // is a double Divide, and a fractional slice offset would silently
    // misalign every band (overlapping slices, dropped tail positions) —
    // the recall guarantee of banding would be gone with no error
    val rowsPerBand = when(pmod(size(sig), lit(bands)) === 0,
        (size(sig) / lit(bands)).cast("int"))
      .otherwise(raise_error(concat(
        lit(s"lshBands: signature width not divisible by bands=$bands: "),
        size(sig).cast("string"))).cast("int"))
    df.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_key",
        xxhash64(slice(sig, col("band") * rowsPerBand + 1, rowsPerBand), col("band")))
  }

  /** MinHash signatures as a DataFrame op — the SCALE path and the
    * engine-portable path in one. Shingles are exploded and each signature
    * position is a plain `min` aggregate, so the whole computation stays in
    * WholeStageCodegen with map-side combine: the shuffle carries one
    * numHashes-wide partial row per (partition, doc), not the shingles.
    *
    * `portable=true` hashes each shingle with the md5-derived 60-bit hash
    * ("seed:shingle", exactly mirrorable in DuckDB — the d05 technique);
    * otherwise xxhash64 (cheaper). Per-seed INDEPENDENT hashes are kept
    * deliberately: a cheaper 2-universal `a + i*b mod p` family was
    * measured to correlate the per-seed argmins enough to multiply band
    * collisions ~27x on the test corpus — minhash banding needs near
    * min-wise independence, and the per-shingle digest count is small on
    * real document lengths. Returns (id, sig array<long>). */
  def minhashSignaturesDf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      shingleSize: Int = 3,
      portable: Boolean = false): DataFrame = {
    // per-shingle work is numHashes INDEPENDENT digests (md5-derived when
    // portable — ~8x an xxhash64), far above widen's default amplification
    // assumption: scale the width estimate accordingly (r20: the un-scaled
    // width ran the d05/d08/d18/d30 family 1.5-1.9x slower)
    val shingles = Parallelism.widen(df.select(col(idCol).as("id"), col(textCol)),
        costFactor = numHashes * (if (portable) 8 else 1))
      .select(col("id"), explode(wordShingles(col(textCol), shingleSize)).as("sh"))
    val mins = (0 until numHashes).map { seed =>
      val h =
        if (portable) TextAnalysis.portableHash60(concat(lit(s"$seed:"), col("sh")))
        else xxhash64(col("sh"), lit(seed))
      min(h).as(s"h$seed")
    }
    shingles.groupBy("id")
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Explode a (id, sig) frame into LSH band rows (id, sig, band,
    * band_key). With `portable=true` the band key is the band's signature
    * values joined with '|' (mirrorable in SQL); otherwise an xxhash64 of
    * the band slice. The building block shared by the one-shot candidate
    * join and the persisted incremental index. */
  def minhashBands(sigs: DataFrame, bands: Int, rowsPerBand: Int,
      portable: Boolean = false): DataFrame = {
    val bandKey =
      if (portable)
        concat_ws("|",
          transform(slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)),
            _.cast("string")))
      else
        xxhash64(slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)), col("band"))
    sigs
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_key", bandKey.cast("string"))
      .select("id", "sig", "band", "band_key")
  }

  /** Candidate near-dup pairs from MinHash+LSH, with their estimated
    * Jaccard. `idCol` must be unique. Only candidates sharing an LSH bucket
    * are compared — the cross-product never materializes. With
    * `portable=true`, signatures and band keys are engine-portable
    * (md5-derived hashes; band key = the band's values joined with '|'),
    * so the whole pipeline can be mirrored in SQL by the DuckDB oracle. */
  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      portable: Boolean = false)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignaturesDf(df, idCol, textCol, numHashes, shingleSize, portable)
    // materialize: the self-join would otherwise evaluate the whole
    // signature pipeline TWICE (no automatic subtree reuse across join
    // aliases). localCheckpoint over cache: checkpoint blocks free
    // automatically (ContextCleaner) when the frame is unreferenced;
    // CacheManager entries would accumulate
    val banded = minhashBands(sigs, bands, rowsPerBand, portable).transform(Parallelism.materialize(_))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        estimatedJaccard(col("a.sig"), col("b.sig")).as("est_jaccard"))
      .distinct()
  }

  /** Near-duplicate dedup: every doc mapped to a group representative (the
    * min id among its LSH-candidate neighborhood above `threshold`; single
    * min-propagation pass — star clustering, the standard first-order
    * approximation of connected components). */
  def minhashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      portable: Boolean = false): DataFrame = {
    val pairs = minhashCandidatePairs(df, idCol, textCol, numHashes, bands, shingleSize, portable)
      .filter(col("est_jaccard") >= threshold)
    // reserved join-key names: a bare "id" is AMBIGUOUS whenever idCol is
    // literally "id" (the most common id column) or df carries its own
    // "id" column beside idCol — and the trailing drop would eat it
    val repFromPairs = pairs
      .select(col("id_b").as("__dedup_id"), col("id_a").as("candidate_rep"))
      .groupBy("__dedup_id").agg(min("candidate_rep").as("__rep_candidate"))
    df.join(repFromPairs, col(idCol) === col("__dedup_id"), "left")
      .withColumn("dup_group", least(coalesce(col("__rep_candidate"), col(idCol)), col(idCol)))
      .drop("__dedup_id", "__rep_candidate")
  }

  /** Connected components over an undirected edge list by iterated
    * min-label propagation: every node converges to the MINIMUM id in its
    * component. Converges in O(component diameter) rounds — near-dup
    * graphs are shallow (dup clusters are dense), so a handful of rounds
    * suffices where the worst-case bound would be `maxIter`.
    *
    * Scale shape: each round is one equi-join (labels ⨝ edges) + one
    * min-aggregate — all key-partitioned shuffles, no driver data motion;
    * `localCheckpoint` truncates lineage each round so plans don't grow;
    * convergence is checked with an `isEmpty` probe (one tiny action per
    * round). For graphs with pathological diameters see the large-star/
    * small-star algorithm (Kiveris et al.) — same join primitives, fewer
    * rounds; unnecessary for dedup clusters.
    *
    * Returns (id, component). Nodes absent from `pairs` are absent here —
    * callers left-join and coalesce to the node's own id. */
  def connectedComponents(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 20)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .transform(Parallelism.materialize(_))
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .transform(Parallelism.materialize(_))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("component").as("nc")), "dst")
        .groupBy(col("src")).agg(min("nc").as("min_nc"))
      // the changed flag rides the update projection, so convergence is a
      // filter over the just-checkpointed frame — not another full-table
      // join+shuffle per round
      val updated = Parallelism.rematerialize(labels
        .join(neighborMin.select(col("src").as("id"), col("min_nc")), Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("min_nc"), col("component"))).as("component"),
          (coalesce(col("min_nc"), col("component")) < col("component")).as("__changed")),
        labels)
      converged = updated.filter(col("__changed")).isEmpty
      labels = updated.drop("__changed")
      i += 1
    }
    // a silent non-converged exit would return WRONG components (one
    // transitive group split in several) — for leakageSafeSplit that is
    // exactly the train/eval contamination the operator exists to prevent
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within maxIter=$maxIter rounds " +
        "(component diameter exceeds it) — raise maxIter; returning partial " +
        "labels would silently split components")
    labels
  }

  /** Near-duplicate dedup with TRANSITIVE closure: like [[minhashDedup]]
    * but groups are true connected components of the candidate graph
    * (A~B, B~C puts A,B,C in one group even when A,C never share a
    * bucket), via [[connectedComponents]]. The star-clustering variant is
    * one pass and engine-portable (the d08 oracle); this one is exact. */
  def minhashDedupCC(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      portable: Boolean = false): DataFrame = {
    val pairs = minhashCandidatePairs(df, idCol, textCol, numHashes, bands, shingleSize, portable)
      .filter(col("est_jaccard") >= threshold)
    val comps = connectedComponents(pairs, "id_a", "id_b")
      .select(col("id").as("__cc_id"), col("component").as("__cc_component"))
    df.join(comps, col(idCol) === col("__cc_id"), "left")
      .withColumn("dup_group", coalesce(col("__cc_component"), col(idCol)))
      .drop("__cc_id", "__cc_component")
  }

  /** Benchmark decontamination: (corpus doc, eval doc) pairs sharing word
    * n-grams — the check every training corpus runs against its eval
    * suites before anything trains on it.
    *
    * Scale shape: both sides explode to (id, shingleHash) so only ids and
    * 8-byte hashes cross the wire; the EVAL side is broadcast (an eval
    * suite is KBs-MBs against a 100 TB corpus), so the corpus never
    * shuffles at all — scan, hash, broadcast-join, partial-agg. Returns
    * (corpus_id, eval_id, n_overlap, eval_frac) where eval_frac is the
    * fraction of the eval doc's distinct n-grams found in the corpus doc
    * (1.0 = the whole eval doc appears).
    *
    * `portable=true` hashes with the md5-derived 60-bit family so a
    * DuckDB oracle reproduces it; production uses xxhash64. */
  def ngramContamination(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      minOverlap: Long = 1L,
      portable: Boolean = false): DataFrame = {
    def hashOf(c: Column): Column =
      if (portable) TextAnalysis.portableHash60(c) else xxhash64(c)
    def shingleHashes(df: DataFrame, outId: String): DataFrame =
      Parallelism.widen(df)
        .select(col(idCol).as(outId),
          explode(array_distinct(wordShingles(col(textCol), shingleSize))).as("__s"))
        .select(col(outId), hashOf(col("__s")).as("__h"))
    val c = shingleHashes(corpus, "corpus_id")
    val e = shingleHashes(evalSet, "eval_id")
    val evalSizes = e.groupBy("eval_id").agg(count(lit(1)).as("__n_eval"))
    c.join(broadcast(e), "__h")
      .groupBy(col("corpus_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .join(broadcast(evalSizes), "eval_id")
      .select(col("corpus_id"), col("eval_id"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("__n_eval")).as("eval_frac"))
  }

  /** Exact duplicate-SPAN detection (the substring-dedup of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"): every
    * word `n`-gram occurring in ≥ 2 distinct documents is a duplicated
    * span, and each document reports how many of its n-gram starts are
    * duplicated and how many token positions those spans cover. MinHash
    * (whole-document Jaccard) misses a boilerplate paragraph pasted into
    * thousands of otherwise-unique pages; this catches exactly that.
    *
    * Returns (id, n_tokens, dup_ngrams, covered_tokens, covered_frac) —
    * covered_frac engine-portable via [[graft.operators.QueryDsl.ratio6]].
    *
    * Scale shape (100 TB): after the one hash projection, only
    * (id, pos, hash64) crosses any wire — never text. The duplicated-hash
    * set is a distinct + partial-agg count; the join back is hash-keyed
    * (both sides shuffle on the 8-byte hash, AQE handles skew from viral
    * boilerplate). Coverage explodes dup starts ×n only (dup spans are a
    * small fraction of a real corpus). The n-gram stream feeds two
    * consumers, so it is materialized once (localCheckpoint) instead of
    * re-tokenizing the corpus twice.
    *
    * `portable=true` hashes with the md5-derived 60-bit family so a
    * DuckDB oracle reproduces it; production uses xxhash64. */
  def dupSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      portable: Boolean = false)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(n >= 2, s"n-gram size must be >= 2, got $n")
    def hashOf(c: Column): Column =
      if (portable) TextAnalysis.portableHash60(c) else xxhash64(c)
    val words = split(TextAnalysis.normalize(col(textCol)), " ")
    val base = df.select(
      col(idCol),
      when(coalesce(length(TextAnalysis.normalize(col(textCol))), lit(0)) === 0, lit(0L))
        .otherwise(size(words).cast("long")).as("n_tokens"))
    // (id, 0-based ngram start, hash) — guarded so sequence() never sees a
    // descending range on short docs
    val ng = Parallelism.widen(df)
      .select(col(idCol).as("__id"), words.as("__w"))
      .filter(size(col("__w")) >= n)
      .select(col("__id"),
        posexplode(transform(
          sequence(lit(1), size(col("__w")) - (n - 1)),
          i => hashOf(concat_ws(" ", slice(col("__w"), i, lit(n)))))).as(Seq("__pos", "__h")))
      .transform(Parallelism.materialize(_))
    val dupHashes = ng.select(col("__h"), col("__id")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2).select(col("__h"))
    val dupNg = ng.join(dupHashes, "__h")
    val perDoc = dupNg.groupBy(col("__id")).agg(count(lit(1)).as("dup_ngrams"))
    // covered tokens by interval merge, NOT by exploding each span to its
    // n member positions and distinct-ing (an n-fold row amplification
    // before the dedup shuffle). Each dup n-gram covers [pos, pos+n-1];
    // with spans sorted by start per doc, a running max of prior span
    // ends tells how much of the current span is new — summing those
    // contributions is exactly the merged-interval length. One window
    // over (id, pos) rows, no amplification. (ng has one row per (id,
    // pos) by construction, so no same-start ties arise.)
    val wSpans = Window.partitionBy(col("__id")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val covered = dupNg
      .select(col("__id"), col("__pos").cast("long").as("__pos"))
      .withColumn("__end", col("__pos") + (n - 1))
      .withColumn("__prev_end", max(col("__end")).over(wSpans))
      .withColumn("__new_from",
        greatest(col("__pos"), coalesce(col("__prev_end") + 1L, col("__pos"))))
      .withColumn("__contrib", greatest(lit(0L), col("__end") - col("__new_from") + 1L))
      .groupBy(col("__id")).agg(sum(col("__contrib")).as("covered_tokens"))
    base
      .join(perDoc.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .join(covered.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_ngrams"), lit(0L)).as("dup_ngrams"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        graft.operators.QueryDsl.ratio6(
          coalesce(col("covered_tokens"), lit(0L)), col("n_tokens")).as("covered_frac"))
  }

  /** Duplicate-SPAN REMOVAL with reconstruction — the enforcement side of
    * [[dupSpans]] (which only measures): every occurrence of a duplicated
    * n-gram except the globally FIRST one (minimal `(doc, pos)`, the
    * [[blockDedup]] winner rule, intra-doc copies included) is removed
    * token-by-token, and the per-doc output reports what survives:
    * (id, n_tokens, kept_tokens, kept_frac, kept_md5 of the reconstructed
    * kept-tokens-in-order text). Lee et al. 2022 substring dedup at
    * n-gram granularity.
    *
    * Coverage is computed by a SWEEP LINE, not by exploding each losing
    * span to its n member positions: each loser span contributes +1 at
    * its start and −1 one past its end, and a running sum over the doc's
    * token positions yields the per-token covering-span depth (kept ⇔
    * depth 0). Shuffle volume is O(tokens + loser spans) — never n×.
    *
    * `portable=true` uses the md5-derived 60-bit hash (DuckDB-mirrorable);
    * production uses xxhash64. */
  def removeDupSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      portable: Boolean = false)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(n >= 2, s"n-gram size must be >= 2, got $n")
    def hashOf(c: Column): Column =
      if (portable) TextAnalysis.portableHash60(c) else xxhash64(c)
    val norm = TextAnalysis.normalize(col(textCol))
    val words = split(norm, " ")
    val base = df.select(
      col(idCol),
      when(coalesce(length(norm), lit(0)) === 0, lit(0L))
        .otherwise(size(words).cast("long")).as("n_tokens"))
    // (id, 0-based ngram start, hash); materialized once — feeds the
    // winner vote AND the join back for loser spans
    val ng = Parallelism.widen(df)
      .select(col(idCol).as("__id"), words.as("__w"))
      .filter(size(col("__w")) >= n)
      .select(col("__id"),
        posexplode(transform(
          sequence(lit(1), size(col("__w")) - (n - 1)),
          i => hashOf(concat_ws(" ", slice(col("__w"), i, lit(n)))))).as(Seq("__pos", "__h")))
      .transform(Parallelism.materialize(_))
    // first-occurrence vote: hash aggregation, never a per-key window
    val winners = ng.groupBy(col("__h"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__win"), count(lit(1)).as("__occ"))
      .filter(col("__occ") >= 2) // unique spans have no losers
      .select(col("__h"), col("__win.__id").as("__wid"), col("__win.__pos").as("__wpos"))
    val losers = ng.join(winners, Seq("__h"))
      .filter(!(col("__id") === col("__wid") && col("__pos") === col("__wpos")))
      .select(col("__id"), col("__pos"))
    // sweep-line events, pre-aggregated per (doc, position)
    val events = losers.select(col("__id"), col("__pos").as("__p"), lit(1L).as("__d"))
      .unionByName(losers.select(col("__id"), (col("__pos") + n).as("__p"), lit(-1L).as("__d")))
      .groupBy(col("__id"), col("__p")).agg(sum(col("__d")).as("__d"))
    val toks = df
      .select(col(idCol).as("__id"), norm.as("__t"))
      .filter(length(col("__t")) > 0)
      .select(col("__id"), posexplode(split(col("__t"), " ")).as(Seq("__pos", "__tok")))
    val wCov = Window.partitionBy(col("__id")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val flagged = toks
      .join(events.withColumnRenamed("__p", "__pos"), Seq("__id", "__pos"), "left")
      .withColumn("__cov", sum(coalesce(col("__d"), lit(0L))).over(wCov))
      .withColumn("__keep", col("__cov") === 0L)
    val perDoc = flagged.groupBy(col("__id")).agg(
      sum(when(col("__keep"), lit(1L)).otherwise(lit(0L))).as("kept_tokens"),
      md5(concat_ws(" ", transform(
        array_sort(collect_list(when(col("__keep"), struct(col("__pos"), col("__tok"))))),
        s => s.getField("__tok")))).as("kept_md5"))
    base
      .join(perDoc.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(graft.operators.QueryDsl.ratio6(
            coalesce(col("kept_tokens"), lit(0L)), col("n_tokens"))).as("kept_frac"),
        coalesce(col("kept_md5"), md5(lit(""))).as("kept_md5"))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word tokens: per-bit majority vote of token
    * hashes. Per-row computation via array folds, no shuffle. */
  def simhash64(text: Column): Column = {
    val tokens = split(TextAnalysis.normalize(text), " ")
    val bitIdx = sequence(lit(0), lit(63))
    // per-token ±1 contribution per bit, folded into a 64-long counters array
    val counters = aggregate(
      tokens,
      array_repeat(lit(0L), 64),
      (acc, tkn) => {
        val h = xxhash64(tkn)
        zip_with(acc, bitIdx,
          (a, i) => a + when(call_function("shiftright", h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      })
    // pack sign bits into one long
    aggregate(
      zip_with(counters, bitIdx, (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash signatures as a DataFrame op — the SCALE path. Tokens are
    * exploded and bit-vote sums use plain aggregates, so the whole thing
    * stays in WholeStageCodegen with map-side combine: the shuffle carries
    * one per-bit-counter row per (partition, doc), NOT the tokens. (The
    * `simhash64` Column variant computes identical values via array folds,
    * but Spark evaluates higher-order functions interpreted — measured 20x
    * slower per doc; keep it for expression contexts only.)
    *
    * `portable=true` switches the token hash to the md5-derived 60-bit
    * portable hash (60 vote bits: bits 0-59), so the signature — and
    * everything downstream — is reproducible in any engine with md5
    * (mirrored by the DuckDB oracle). Default is xxhash64 over 64 bits. */
  def simhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      portable: Boolean = false): DataFrame = {
    val nBits = simhashBits(portable)
    // the token hash is PROJECTED once per token before the aggregate —
    // referencing the md5-derived expression from all 60 vote aggregates
    // would otherwise re-hash each token once per bit
    val tokens = Parallelism.widen(df.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"), explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("tkn"))
      .withColumn("h",
        if (portable) TextAnalysis.portableHash60(col("tkn")) else xxhash64(col("tkn")))
    val h = col("h")
    val bitVotes = (0 until nBits).map { i =>
      sum(when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    tokens.groupBy("id")
      .agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("id"),
        (0 until nBits).map(i =>
          when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("sim"))
  }

  /** Signature width: 60 portable bits (15 md5 hex chars) vs 64 xxhash64
    * bits — both band evenly into the chunk layouts below. */
  private def simhashBits(portable: Boolean): Int = if (portable) 60 else 64

  /** SimHash near-dup candidate pairs with a GUARANTEED recall contract:
    * the signature is banded into `bands` equal chunks, and a pair within
    * hamming distance `bands - 1` must agree on at least one chunk
    * (pigeonhole), so banding loses NO pair with hamming <= bands-1.
    * `maxHamming` is therefore capped at bands-1: 7 for the 64-bit/8-band
    * default, 5 for the portable 60-bit/6-band layout. Candidates are then
    * filtered by exact hamming distance. */
  def simhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      portable: Boolean = false)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    val nBits = simhashBits(portable)
    val bands = if (portable) 6 else 8
    val width = nBits / bands
    require(maxHamming <= bands - 1,
      s"banding into $bands chunks only guarantees recall for hamming <= ${bands - 1}; " +
        s"got maxHamming=$maxHamming")
    val sigs = simhashSignatures(df, idCol, textCol, portable)
    // materialize: see minhashCandidatePairs — the self-join evaluates
    // the signature pipeline twice without it
    val banded = sigs.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_key",
        call_function("shiftright", col("sim"), col("band") * width)
          .bitwiseAND(lit((1L << width) - 1)))
      .transform(Parallelism.materialize(_))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sim"), col("b.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Distinct character n-grams of the raw text. */
  def charNgrams(text: Column, n: Int = 5): Column =
    array_distinct(
      when(length(text) < n, array(text))
        .otherwise(
          transform(sequence(lit(1), length(text) - (n - 1)),
            i => text.substr(i, lit(n)))))

  /** Exact n-gram Jaccard similarity between two texts. Use on candidate
    * pairs only — O(len_a * len_b) per pair. */
  def ngramJaccard(a: Column, b: Column, n: Int = 5): Column = {
    val ga = charNgrams(a, n)
    val gb = charNgrams(b, n)
    size(array_intersect(ga, gb)).cast("double") / size(array_union(ga, gb))
  }

  // ------------------------------------------------- leakage-safe split

  /** Deterministic train/val/test split assigned at the NEAR-DUP GROUP
    * level: every document in a transitive near-dup group lands in the
    * same split, so near-duplicates can never straddle a split boundary —
    * the classic train/eval contamination leak that a per-document hash
    * split silently commits. Assignment is a portable hash of the group
    * representative (the transitive minimum id), so a re-run after new
    * documents ARRIVE keeps existing assignments — EXCEPT when a new
    * document bridges two previously separate groups: the merged group
    * takes the smaller representative and the other group's documents
    * migrate with it (unavoidable — group unification forces one split).
    * Diff the split column between runs to surface such migrations.
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 8,
      trainPct: Int = 80,
      valPct: Int = 10,
      portable: Boolean = false): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split ratios: train=$trainPct val=$valPct")
    val grouped = minhashDedupCC(df, idCol, textCol, threshold, numHashes, bands,
        portable = portable)
      .select(col(idCol), col("dup_group"))
    grouped
      .withColumn("__b", pmod(
        TextAnalysis.portableHash60(concat(lit("split:"), col("dup_group").cast("string"))),
        lit(100L)))
      .select(col(idCol), col("dup_group"),
        when(col("__b") < trainPct, lit("train"))
          .when(col("__b") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")).as("split"))
  }

  // --------------------------------------------------- block-level dedup

  /** Corpus-wide exact block dedup — the paragraph-granularity dedup of
    * RefinedWeb/Dolma-style pretraining pipelines, with consecutive
    * `blockWords`-word blocks standing in for paragraphs on newline-free
    * corpora. Unlike [[dupSpans]] (which only MEASURES duplicated spans),
    * this REMOVES them: each distinct block survives only at its globally
    * first occurrence (minimal `(doc, pos)`); every later copy — in the
    * same doc or any other — is dropped, and the per-doc output reports
    * what remains: block/token keep counts, kept fraction, and an md5 of
    * the reconstructed (kept-blocks-in-order) text.
    *
    * Scale (100 TB): the first-occurrence vote is a hash-aggregation on
    * the 60/64-bit block hash alone — one shuffle moving hash + (doc,
    * pos) per block, never text, and no per-key window. Block text
    * crosses a shuffle exactly once, keyed by the doc id, for the
    * ordered reconstruction — linear in corpus size. Nothing is
    * all-pairs; skewed hashes cannot arise (hashes are uniform).
    *
    * `portable = true` switches xxhash64 to the md5-derived 60-bit hash
    * so any engine reproduces the vote bit-for-bit (the oracle path).
    */
  def blockDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockWords: Int = 32,
      portable: Boolean = false)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    val blocks = blockRows(df, idCol, textCol, blockWords, portable)
      .transform(Parallelism.materialize(_)) // feeds the vote AND the reconstruction join
    val winners = blockWinners(blocks)
    val flagged = blocks.join(winners, Seq("__h"))
      .withColumn("__keep", col("__id") === col("__wid") && col("__pos") === col("__wpos"))
    blockStats(df, idCol, textCol, flagged)
  }

  /** Per-block rows (`__id`, `__pos`, `__blk`, `__h`) of consecutive
    * `blockWords`-word blocks — the shared derivation behind
    * [[blockDedup]] and [[BlockDedupIndex]]. Empty docs never reach the
    * explode. */
  private[ext] def blockRows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockWords: Int,
      portable: Boolean): DataFrame = {
    require(blockWords >= 1, s"blockWords must be >= 1, got $blockWords")
    def hashOf(c: Column): Column =
      if (portable) TextAnalysis.portableHash60(c) else xxhash64(c)
    val norm = TextAnalysis.normalize(col(textCol))
    // integer ceil-div block count
    val nBlocks =
      call_function("div", size(col("__w")) + lit(blockWords - 1), lit(blockWords))
    Parallelism.widen(df)
      .select(col(idCol).as("__id"), norm.as("__t"))
      .filter(length(col("__t")) > 0)
      .select(col("__id"), split(col("__t"), " ").as("__w"))
      .select(col("__id"),
        posexplode(transform(sequence(lit(0), nBlocks - 1),
          i => concat_ws(" ", slice(col("__w"), i * blockWords + 1, lit(blockWords)))))
          .as(Seq("__pos", "__blk")))
      .withColumn("__h", hashOf(col("__blk")))
  }

  /** First-occurrence vote: minimal (`__wid`, `__wpos`) per block hash —
    * a hash aggregation, never a per-key window. */
  private[ext] def blockWinners(blocks: DataFrame): DataFrame =
    blocks.groupBy(col("__h"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__win"))
      .select(col("__h"), col("__win.__id").as("__wid"), col("__win.__pos").as("__wpos"))

  /** Per-doc reconstruction stats over flagged block rows (`__keep`
    * boolean): kept counts, kept fraction, md5 of the surviving text. */
  private[ext] def blockStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      flagged: DataFrame): DataFrame = {
    val norm = TextAnalysis.normalize(col(textCol))
    val base = df.select(
      col(idCol),
      when(coalesce(length(norm), lit(0)) === 0, lit(0L))
        .otherwise(size(split(norm, " ")).cast("long")).as("n_tokens"))
    val perDoc = flagged
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("__keep"), lit(1L)).otherwise(lit(0L))).as("kept_blocks"),
        sum(when(col("__keep"), size(split(col("__blk"), " ")).cast("long"))
          .otherwise(lit(0L))).as("kept_tokens"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(when(col("__keep"), struct(col("__pos"), col("__blk"))))),
          s => s.getField("__blk")))).as("kept_md5"))
    base
      .join(perDoc.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("kept_blocks"), lit(0L)).as("kept_blocks"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(graft.operators.QueryDsl.ratio6(
            coalesce(col("kept_tokens"), lit(0L)), col("n_tokens"))).as("kept_frac"),
        coalesce(col("kept_md5"), md5(lit(""))).as("kept_md5"))
  }
}
