package graft.ext

import graft.SparkSpecBase
import graft.conf.GraftSettings
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Contract tests for the persisted BM25 inverted index: incremental
  * builds equal one-shot builds, ingest-token crash replay converges to
  * the clean run, the probe-term key set file-prunes the postings scan,
  * and remove/purge make erased docs vanish from BOTH the ranking and the
  * corpus statistics (score-identical to an index that never held them).
  * The DuckDB oracle side of the same machinery is d51/e28.
  */
class LexIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-lex-").toString
  private implicit val settings: GraftSettings = GraftSettings.local(root)

  private def docs(): DataFrame =
    spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
      .select(col("doc_id"), col("text"))

  private def results(idx: LexIndex, q: DataFrame, k: Int = 10): Set[(Long, Long, Int, Long)] =
    idx.search(q, "doc_id", "text", k, excludeSelf = true)
      .as[(Long, Long, Int, Long)].collect().toSet

  test("incremental adds equal a one-shot build (df, totals, ranking)") {
    val d = docs()
    val one = new LexIndex(spark, s"$root/one")
    one.add(d, "doc_id", "text")
    val inc = new LexIndex(spark, s"$root/inc")
    inc.add(d.filter(col("doc_id") % 3 === 0), "doc_id", "text")
    inc.add(d.filter(col("doc_id") % 3 === 1), "doc_id", "text")
    inc.add(d.filter(col("doc_id") % 3 === 2), "doc_id", "text")
    val q = d.filter(col("doc_id") < 5)
    val a = results(one, q)
    assert(a.nonEmpty)
    assert(results(inc, q) === a, "incremental build diverged from one-shot")
    assert(inc.indexedCount === d.count())
  }

  test("search is a pruned scan: probe-term keys skip non-matching postings files") {
    val d = docs()
    val idx = new LexIndex(spark, s"$root/prune")
    // several clustered appends so the store holds multiple files with
    // tight th ranges
    (0 until 4).foreach { i =>
      idx.add(d.filter(col("doc_id") % 4 === i), "doc_id", "text",
        ingestToken = Some(s"b$i"))
    }
    // a SHORT query is the serving shape: its handful of term hashes hits
    // a handful of th ranges. (A whole-document query over this tiny
    // synthetic vocabulary touches almost every range — pruning is a
    // selectivity win, not a guarantee.)
    val q = Seq((999L, "hash join")).toDF("doc_id", "text")
    val keys = q.select(explode(filter(split(TextAnalysis.normalize(col("text")), " "),
        t => length(t) > 0)).as("tok"))
      .select(xxhash64(col("tok")).as("th")).distinct().as[Long].collect()
    val total = idx.postingsTable.liveFiles().size
    val scanned = idx.postingsTable.prunedFiles(col("th").isin(keys.toSeq: _*)).size
    assert(scanned < total, s"IN-pruning must skip files: scanned $scanned of $total")
    assert(idx.search(q, "doc_id", "text", k = 5).count() > 0)
  }

  test("search plan: probe terms broadcast, stored postings never shuffle") {
    val d = docs()
    val idx = new LexIndex(spark, s"$root/plan")
    idx.add(d, "doc_id", "text")
    val q = Seq((999L, "hash join value")).toDF("doc_id", "text")
    // the candidate join up to the scoring aggregate: pruned postings scan
    // ⨝ broadcast query terms — any partitioning Exchange there means the
    // stored side re-shuffled per query (the O(index) failure at 100 TB)
    val qTerms = q.select(explode(filter(split(TextAnalysis.normalize(col("text")), " "),
        t => length(t) > 0)).as("tok"))
      .select(lit(999L).as("query_id"), xxhash64(col("tok")).as("th"))
      .localCheckpoint(true)
    val keys = qTerms.select("th").distinct().as[Long].collect()
    val cand = idx.postingsTable.readWhere(col("th").isin(keys.toSeq: _*))
      .join(broadcast(qTerms), Seq("th"))
    val p = cand.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"probe terms must broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"stored postings must not shuffle:\n$p")
  }

  test("skipCommon: equals querying without the stop words; list is df-exact") {
    val d = docs()
    val idx = new LexIndex(spark, s"$root/common")
    idx.add(d, "doc_id", "text")
    // terms in ≥50% of docs are "common" for this corpus (the synthetic
    // vocabulary is 31 tokens at ~75-80% df each, plus 'dup' at ~5%)
    idx.refreshCommonTerms(minDfPpm = 500000L)
    // independent recomputation of the same floor from the raw corpus
    val n = d.count()
    val wantCommon = d
      .select(col("doc_id"), explode(filter(split(TextAnalysis.normalize(col("text")), " "),
        t => length(t) > 0)).as("tok"))
      .distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= math.max(1L, 500000L * n / 1000000L))
      .select(col("tok")).as[String].collect().toSet
    assert(wantCommon.contains("key") && !wantCommon.contains("dup"),
      s"unexpected df shape: $wantCommon")
    val gotCommon = idx.commonTable.read().select("th").as[Long].collect().toSet
    assert(gotCommon === wantCommon.map(t =>
      Seq(t).toDF("t").select(xxhash64(col("t"))).as[Long].head()))
    // a query mixing common and rare terms, skipCommon on, must equal the
    // query with the common words REMOVED, skipCommon off
    val full = Seq((500L, "key agg dup")).toDF("doc_id", "text")
    val reduced = Seq((500L, "dup")).toDF("doc_id", "text")
    val a = idx.search(full, "doc_id", "text", k = 10, skipCommon = true)
      .as[(Long, Long, Int, Long)].collect().toSet
    val b = idx.search(reduced, "doc_id", "text", k = 10)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(a === b, "skipCommon must equal querying without the common words")
    // and it genuinely changes the ranking vs the unskipped query (the
    // skip is real, not a no-op)
    val c = idx.search(full, "doc_id", "text", k = 10)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(a !== c)
  }

  test("crash replay: every crash window converges to the clean run") {
    val d = docs().filter(col("doc_id") < 60)
    val b0 = d.filter(col("doc_id") < 30)
    val b1 = d.filter(col("doc_id") >= 30)
    val clean = new LexIndex(spark, s"$root/clean")
    clean.add(b0, "doc_id", "text", ingestToken = Some("t0"))
    clean.add(b1, "doc_id", "text", ingestToken = Some("t1"))
    val q = d.filter(col("doc_id") < 3)
    val want = results(clean, q)
    assert(want.nonEmpty)
    Seq("after-token", "after-postings", "after-docs").foreach { fp =>
      val idx = new LexIndex(spark, s"$root/crash-$fp")
      idx.add(b0, "doc_id", "text", ingestToken = Some("t0"))
      idx.failpoints.arm(fp)
      intercept[Exception] { idx.add(b1, "doc_id", "text", ingestToken = Some("t1")) }
      // at-least-once redelivery of the same batch under the same token
      idx.add(b1, "doc_id", "text", ingestToken = Some("t1"))
      assert(results(idx, q) === want, s"crash window $fp diverged")
      // no double-counted postings or stats under the replay
      assert(idx.postingsTable.read().groupBy("th", "doc_id").count()
        .filter(col("count") > 1).isEmpty, s"$fp duplicated postings")
      assert(idx.statsTable.read().filter(col("token") === "t1").count() === 1,
        s"$fp duplicated the batch stats row")
    }
  }

  test("remove adjusts ranking AND corpus stats; purge rewrites; re-add re-admits") {
    val d = docs().filter(col("doc_id") < 80)
    val full = new LexIndex(spark, s"$root/full")
    full.add(d, "doc_id", "text")
    val never = new LexIndex(spark, s"$root/never")
    never.add(d.filter(col("doc_id") =!= 7L), "doc_id", "text")
    val q = d.filter(col("doc_id") < 3)
    full.remove(Seq(Tuple1(7L)).toDF("doc_id"), "doc_id")
    // scores must equal an index that NEVER held doc 7: df, N, and avgdl
    // all adjust, not just the candidate list
    assert(results(full, q) === results(never, q),
      "tombstoned doc still influences df/N/avgdl")
    val filesBefore = full.postingsTable.read().count()
    full.purge()
    assert(full.postingsTable.read().count() < filesBefore)
    assert(full.postingsTable.read().filter(col("doc_id") === 7L).isEmpty)
    assert(full.docsTable.read().filter(col("doc_id") === 7L).isEmpty)
    assert(results(full, q) === results(never, q), "purge changed results")
    // post-purge re-admission: the tombstone is gone, so the doc indexes
    // again and results return to the full-corpus ranking
    full.add(d.filter(col("doc_id") === 7L), "doc_id", "text")
    val fresh = new LexIndex(spark, s"$root/fresh")
    fresh.add(d, "doc_id", "text")
    assert(results(full, q) === results(fresh, q), "re-added doc not restored")
  }

  test("zero-token docs count toward N and avgdl; empty queries return empty") {
    val base = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta something else entirely"),
      (3L, "gamma delta epsilon zeta"))
    val punct = (4L, "!!! ??? ...") // normalizes to zero tokens
    val withZero = new LexIndex(spark, s"$root/zero")
    withZero.add((base :+ punct).toDF("doc_id", "text"), "doc_id", "text")
    assert(withZero.indexedCount === 4L)
    val without = new LexIndex(spark, s"$root/nozero")
    without.add(base.toDF("doc_id", "text"), "doc_id", "text")
    val q = Seq((100L, "alpha gamma")).toDF("doc_id", "text")
    val a = withZero.search(q, "doc_id", "text", k = 5).as[(Long, Long, Int, Long)].collect().toSet
    val b = without.search(q, "doc_id", "text", k = 5).as[(Long, Long, Int, Long)].collect().toSet
    // same candidates and ranks, but N=4 vs N=3 changes idf — the
    // zero-token doc must be IN the statistics
    assert(a.map(t => (t._1, t._2, t._3)) === b.map(t => (t._1, t._2, t._3)))
    assert(a !== b, "zero-token doc must still count toward N/avgdl")
    // empty query frame: empty result, stable schema
    val empty = withZero.search(q.limit(0), "doc_id", "text", k = 5)
    assert(empty.columns.toSeq === Seq("query_id", "doc_id", "rnk", "score_pico"))
    assert(empty.isEmpty)
  }

  test("phraseSearch: positional intersection equals a brute-force sliding window") {
    val corpus = Seq(
      (1L, "spark shuffles data and spark shuffles state"),
      (2L, "shuffles spark data"),
      (3L, "the spark shuffles"),
      (4L, "a b a b a"),
      (5L, "b a b"),
      (6L, "entirely unrelated prose"))
    val idx = new LexIndex(spark, s"$root/pos", positions = true)
    // two adds: the positional layout must hold up incrementally too
    idx.add(corpus.take(3).toDF("doc_id", "text"), "doc_id", "text",
      ingestToken = Some("t0"))
    idx.add(corpus.drop(3).toDF("doc_id", "text"), "doc_id", "text",
      ingestToken = Some("t1"))
    def brute(phrase: String): Set[(Long, Long)] = {
      val p = phrase.split(" ").filter(_.nonEmpty)
      corpus.map { case (id, text) =>
        val t = text.split(" ").filter(_.nonEmpty)
        id -> (if (t.length < p.length) 0L
               else t.sliding(p.length).count(_.sameElements(p)).toLong)
      }.filter(_._2 > 0).map { case (id, n) => (id, n) }.toSet
    }
    def got(phrase: String): Set[(Long, Long)] =
      idx.phraseSearch(Seq((100L, phrase)).toDF("doc_id", "text"),
          "doc_id", "text", k = 10)
        .select(col("doc_id"), col("n_matches")).as[(Long, Long)].collect().toSet
    // multi-occurrence, order-sensitivity, duplicate phrase tokens
    assert(got("spark shuffles") === brute("spark shuffles"))
    assert(brute("spark shuffles") === Set((1L, 2L), (3L, 1L))) // pin the fixture
    assert(got("a b a") === brute("a b a"))
    assert(brute("a b a") === Set((4L, 2L)))
    assert(got("b a") === brute("b a"))
    assert(got("data and spark") === Set((1L, 1L)))
    assert(got("spark data") === brute("spark data")) // doc 2 only
    assert(got("data spark") === Set.empty) // never consecutive anywhere
    // single-term phrase degenerates to term frequency
    assert(got("spark") === Set((1L, 2L), (2L, 1L), (3L, 1L)))
    // the BM25 path is untouched by the positional layout
    val flat = new LexIndex(spark, s"$root/posflat")
    flat.add(corpus.toDF("doc_id", "text"), "doc_id", "text")
    val q = Seq((100L, "spark shuffles")).toDF("doc_id", "text")
    assert(results(idx, q, k = 10) === results(flat, q, k = 10),
      "positional layout must not change BM25 scores")
    // layout guards: a mismatched reopen must refuse to WRITE a mixed
    // store (reads that ignore pos are fine), and a flat store has no
    // phrase path
    intercept[IllegalArgumentException] {
      new LexIndex(spark, s"$root/pos", positions = false)
        .add(Seq((7L, "more text")).toDF("doc_id", "text"), "doc_id", "text")
    }
    intercept[IllegalArgumentException] {
      flat.phraseSearch(q, "doc_id", "text", k = 5)
    }
    // crash replay holds for the positional store too
    val crashed = new LexIndex(spark, s"$root/poscrash", positions = true)
    crashed.add(corpus.take(3).toDF("doc_id", "text"), "doc_id", "text",
      ingestToken = Some("t0"))
    crashed.failpoints.arm("after-token")
    intercept[Exception] {
      crashed.add(corpus.drop(3).toDF("doc_id", "text"), "doc_id", "text",
        ingestToken = Some("t1"))
    }
    crashed.add(corpus.drop(3).toDF("doc_id", "text"), "doc_id", "text",
      ingestToken = Some("t1"))
    assert(crashed.phraseSearch(Seq((100L, "a b a")).toDF("doc_id", "text"),
        "doc_id", "text", k = 10)
      .select(col("doc_id"), col("n_matches")).as[(Long, Long)].collect().toSet
      === Set((4L, 2L)))
  }

  test("rrfFuse: exact micro sums, rank-only, ties on neighbor_id") {
    val l1 = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("probe_id", "neighbor_id", "rnk")
    val l2 = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("probe_id", "neighbor_id", "rnk")
    val got = Similarity.rrfFuse(Seq(l1, l2), k = 10)
      .as[(Long, Long, Int, Long)].collect().toSet
    // micro(1/61)=16393, micro(1/62)=16129
    assert(got === Set((1L, 11L, 1, 16393L + 16129L), (1L, 10L, 2, 16393L),
      (1L, 12L, 3, 16129L)))
  }
}
