package graft.operators

import graft.SparkSpecBase
import graft.SparkEntry

/** Physical-plan audits: the 100 TB discipline, asserted. A query that
  * silently loses filter pushdown, column pruning, its broadcast hint, or
  * whole-stage codegen fails HERE before it fails on a cluster.
  */
class PlanAuditSpec extends SparkSpecBase {

  // audit STATIC plans: AQE wraps everything in AdaptiveSparkPlan and hides
  // codegen/join structure until execution
  private def planFor(name: String) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    SparkEntry.queries(name)(spark, sf()).queryExecution
  }

  private def plan(name: String): String =
    planFor(name).explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q01: shipdate filter reaches the parquet scan; schema pruned") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
    assert(!p.contains("l_orderkey"), "reads columns the query never uses")
    val codegen = planFor("q01_pricing_summary")
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.matches("(?s)Found [1-9]\\d* WholeStageCodegen subtrees.*"),
      "aggregation fell out of whole-stage codegen")
  }

  test("q04: dimension join is broadcast, fact side not shuffled for the join") {
    val p = plan("q04_brand_volume")
    assert(p.contains("BroadcastHashJoin"), s"part join must broadcast:\n$p")
  }

  test("q05: both dimension hops broadcast, none sort-merge") {
    val p = plan("q05_region_balance")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("q07: anti join resolves without cartesian product") {
    val p = plan("q07_customers_without_events")
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q25: range join stays an equi-join on the key with range residual") {
    val p = plan("q25_shipped_within_30d")
    // the equality on orderkey must be the join key (hash/merge), the date
    // range only a post-join condition — NOT a nested-loop over the range
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated:\n$p")
  }

  test("e01: probes broadcast; corpus scanned partition-local") {
    val p = plan("e01_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), s"probe side must broadcast:\n$p")
  }

  test("e01: partial top-k reduces candidates BEFORE the per-probe shuffle") {
    // the rank<=k filter must become a two-phase WindowGroupLimit: a
    // partial pass upstream of the exchange keeps only k rows per probe
    // per input partition, so the shuffle carries ~partitions*probes*k
    // rows instead of every candidate pair
    val p = plan("e01_knn_brute")
    val partial = p.indexOf("WindowGroupLimit")
    assert(partial >= 0, s"rank filter not pushed into WindowGroupLimit:\n$p")
    assert(p.indexOf("WindowGroupLimit", partial + 1) > partial,
      s"only one WindowGroupLimit — partial (pre-shuffle) phase missing:\n$p")
  }

  test("d01: exact dedup is a partial->final hash aggregate") {
    val p = plan("d01_dedup_exact")
    assert(p.contains("HashAggregate"), s"dedup must hash-aggregate:\n$p")
  }

  test("documents scan for metrics prunes to the used columns") {
    val p = plan("d02_text_metrics")
    assert(!p.contains("n_chars"), "reads columns the query never uses")
  }

  test("d20: repetition scan prunes to (doc_id, text); tokenize materialized once") {
    val p = plan("d20_repetition")
    assert(!p.contains("n_chars") && !p.contains("source"),
      s"reads columns the query never uses:\n$p")
    // the unigram aggregate and the bigram window must both read the
    // checkpointed token frame, not re-run the tokenize pipeline
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"token frame not materialized:\n$p")
  }

  test("d34: html extraction prunes the scan and stays in whole-stage codegen") {
    val p = plan("d34_html_to_text")
    assert(!p.contains("n_chars") && !p.contains("lang"),
      s"reads columns the query never uses:\n$p")
    // the whole strip/decode/collapse chain is string expressions — it
    // must compile into a codegen stage, never fall to interpreted eval
    val codegen = planFor("d34_html_to_text")
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.matches("(?s)Found [1-9]\\d* WholeStageCodegen subtrees.*"),
      "extraction fell out of whole-stage codegen")
  }

  test("d33: bigram derivation materialized once; counts hash-aggregate") {
    val p = plan("d33_bigram_nll")
    // the transition frame feeds two count aggregates and the probe side —
    // it must be read from the checkpoint, not re-derived per consumer
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"bigram frame not materialized:\n$p")
    assert(p.contains("HashAggregate"), s"counts must hash-aggregate:\n$p")
  }

  test("e05: IVF codebook and probe lists broadcast; no cartesian candidate join") {
    val p = plan("e05_ivf_ann")
    // centroid scoring + candidate join + probe-vector re-attach all ride
    // broadcasts; the corpus side must never be the built/broadcast side
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"IVF must broadcast the small sides:\n$p")
    assert(!p.contains("CartesianProduct"), s"candidate join degenerated:\n$p")
  }

  test("e03: LSH bucket join carries ids only until candidate re-attach") {
    val p = plan("e03_ann_lsh")
    assert(!p.contains("CartesianProduct"), s"bucket join degenerated:\n$p")
  }

  test("e06: probe codes broadcast; partial top-k before the per-probe shuffle") {
    val p = plan("e06_sq_ann")
    assert(p.contains("BroadcastNestedLoopJoin"), s"probe side must broadcast:\n$p")
    val partial = p.indexOf("WindowGroupLimit")
    assert(partial >= 0 && p.indexOf("WindowGroupLimit", partial + 1) > partial,
      s"rank<=k must reduce in two WindowGroupLimit phases:\n$p")
  }

  test("e07: k-means centroid joins broadcast; distance sums partial-aggregate") {
    val p = plan("e07_kmeans")
    assert(p.contains("BroadcastHashJoin"), s"centroids must broadcast:\n$p")
    assert(p.contains("HashAggregate"), s"distance sums must hash-aggregate:\n$p")
  }

  test("q40: NOT IN plans as a null-aware anti join, not a plain anti") {
    val p = plan("q40_not_in_suppliers")
    // Spark marks the null-aware single-column case on the BNLJ/BHJ node
    assert(p.contains("LeftAnti"), s"NOT IN must anti-join:\n$p")
  }

  test("q29: sketch aggregates never sit on a multi-distinct Expand") {
    // combining countDistinct + HLL sketches in ONE agg makes Catalyst key
    // the sketch buffers on (group, distinct-col, gid): a ~13 KB HLL buffer
    // PER DISTINCT KEY through the shuffle — OOM at scale. The split plan
    // must keep every sketch aggregate's subtree Expand-free.
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.ExpandExec
    val exec = planFor("q29_approx_distinct").executedPlan
    val sketchAggs = exec.collect {
      case a: ObjectHashAggregateExec
          if a.aggregateExpressions.exists(_.aggregateFunction.toString.contains("hll")) => a
    }
    assert(sketchAggs.nonEmpty, s"expected an HLL ObjectHashAggregate:\n$exec")
    sketchAggs.foreach { a =>
      assert(a.collect { case e: ExpandExec => e }.isEmpty,
        s"sketch aggregate keyed on a distinct Expand — per-distinct-key buffers:\n$a")
    }
  }

  test("d27: block dedup votes by hash-aggregate, not a per-key window; scan prunes") {
    val p = plan("d27_block_dedup")
    assert(!p.contains("lang") && !p.contains("source"),
      s"reads columns the query never uses:\n$p")
    // first-occurrence vote = groupBy(hash).min(struct) — a rank window
    // over every block would serialize hot keys at scale
    assert(!p.contains("Window"), s"block vote fell back to a window:\n$p")
    assert(p.contains("ExistingRDD"),
      s"block frame not materialized (vote + reconstruction recompute the explode):\n$p")
  }

  test("q47: moment sums are one partial->final hash aggregate; scan prunes") {
    val p = plan("q47_stats_agg")
    assert(p.contains("HashAggregate"), s"moments must hash-aggregate:\n$p")
    assert(!p.contains("l_orderkey") && !p.contains("l_shipdate"),
      s"reads columns the query never uses:\n$p")
    assert(!p.contains("Window"), s"unexpected window in a pure aggregation:\n$p")
  }

  test("e13: random projection is shuffle-free (matrix ships as literals)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val p = graft.ext.Similarity.randomProjection(emb, "vec_id", "embedding", 64, 16)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"projection must be per-row narrow:\n$p")
  }

  test("catalog sweep: no query plans a CartesianProduct") {
    // a cartesian anywhere is a 100 TB non-starter; sweep EVERY catalog
    // entry so a new query can't sneak one in
    for (name <- graft.SparkEntry.queries.keys.toSeq.sorted) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
  }

  test("e04/d07: banded self-joins read materialized band rows, not the pipeline twice") {
    for (name <- Seq("e04_cosine_neardup", "d07_simhash_neardup")) {
      val p = plan(name)
      // localCheckpoint surfaces as an ExistingRDD scan; the signature/
      // bucket pipeline (posexplode + aggregates) must NOT appear twice
      assert(p.contains("ExistingRDD"),
        s"$name lost the band-frame materialization (self-join recomputes the pipeline):\n$p")
    }
  }

  test("e09: probe side broadcasts; no degenerate join anywhere") {
    val p = plan("e09_knn_label")
    assert(p.contains("BroadcastNestedLoopJoin"), s"probes must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("e08: within-cluster pair join is keyed, never a nested loop over the corpus") {
    val p = plan("e08_semdedup")
    // cluster id is the equi key; a.id < b.id rides as a residual. A BNLJ
    // here would be the all-pairs shape SemDeDup exists to avoid.
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"pair join degenerated to all-pairs:\n$p")
  }

  test("d23: the rank window consumes only boundary-bucket rows, never a full stratum") {
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val exec = graft.ext.TextAnalysis.mixtureSample(docs, "doc_id", "lang",
        Map("en" -> 500000L, "de" -> 500000L))
      .queryExecution.executedPlan
    val rankWindows = exec.collect {
      case w: WindowExec if w.windowExpression.mkString.contains("row_number") => w
    }
    assert(rankWindows.nonEmpty, s"expected the boundary rank window:\n$exec")
    rankWindows.foreach { w =>
      // the __bkt = __bstar boundary constraint must bound the window's
      // input — Catalyst rewrites the filter into the broadcast-join KEY
      // (child joins on (__bkt, strat) = (__bstar, strat)), so accept the
      // constraint as either a join key or a residual filter
      assert(w.child.toString.contains("__bstar"),
        s"rank window is not restricted to the boundary bucket — at scale this " +
          s"is a single-reducer sort of a whole stratum:\n$w")
    }
  }
}
