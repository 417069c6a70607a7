package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main (driver contract): run every catalog query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Two passes: an untimed warmup absorbs JVM/codegen/parquet-footer
  * warmup (otherwise the first query pays ~5s of cold-start that has
  * nothing to do with plan quality), then the timed pass.
  *
  * Failures are NOT swallowed: a query that throws is recorded with
  * value -1 and its message lands in the "errors" map, so a regression
  * can never masquerade as a fast success. The JSON line is printed as
  * the final stdout line after spark.stop() and also written to
  * BENCH_LOCAL.json for belt-and-braces parseability.
  */
object Bench {

  /** Force complete evaluation of the query's OWN output — every column,
    * every row — by counting the compiled physical plan's rows.
    *
    * `df.count()` instead rewrites the plan under a count aggregate, and
    * Catalyst then legally deletes the interesting work: projections are
    * pruned, unique-keyed left joins are eliminated (d08 benched ~0s in r1
    * that way), sorts vanish. `toRdd` executes the plan exactly as a
    * write/collect would, so every benched number reflects the work the
    * driver's Verify pass actually pays for. */
  private def force(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  /** Bench-only entries, NOT part of the correctness catalog: the
    * PRODUCTION dedup hash path (xxhash64 signatures). The d05/d08 catalog
    * queries run `portable=true` — md5-derived signatures that a DuckDB
    * oracle can mirror but that cost 8-32 independent digests per shingle.
    * A 100 TB run uses `portable=false`; benching both shows the oracle
    * tax vs engine speed separately. */
  private val extras: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "d05x_minhash_prod" -> ((s, dir) =>
      graft.ext.Dedup.minhashSignaturesDf(
        graft.operators.QueryDsl.t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, shingleSize = 3, portable = false)),
    "d08x_minhash_dedup_prod" -> ((s, dir) =>
      graft.ext.Dedup.minhashDedup(
        graft.operators.QueryDsl.t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5, numHashes = 32, bands = 8, portable = false)),
    "e03x_ann_lsh_prod" -> ((s, dir) => {
      val emb = graft.operators.QueryDsl.t(s, dir, "embeddings")
      graft.ext.Similarity.annTopK(emb, emb.filter(
          org.apache.spark.sql.functions.col("vec_id") < 5),
        "vec_id", "embedding", k = 5, nTables = 8, bitsPerTable = 6, portable = false)
    }),
    "e04x_cosine_neardup_prod" -> ((s, dir) =>
      graft.ext.Similarity.cosineNearDupPairs(
        graft.operators.QueryDsl.t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.30, nTables = 8, bitsPerTable = 8, portable = false)))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // bisect switches (r13 postmortem): the r13 harness ran every query
    // 4x in one JVM and left each query's localCheckpoint blocks to
    // ContextCleaner-after-GC; tens of GiB of dead blocks accumulated
    // mid-pass and the eviction/cleaning storms landed on whatever query
    // ran NEXT (the regressions were positional — d27-d30 follow the
    // d26 index build, e13-e16 follow the e12 index build). CLEANUP=1
    // (default) releases a query's leaked storage eagerly the moment its
    // timing stops; NO_EXT=1 drops the GraftExtensions install to isolate
    // analyzer-rule overhead. Set both only for A/B diagnosis runs.
    val doCleanup = sys.env.getOrElse("SPARK_GRAFT_BENCH_CLEANUP", "1") == "1"
    val noExt = sys.env.getOrElse("SPARK_GRAFT_BENCH_NO_EXT", "0") == "1"
    val builder0 = SparkSession.builder()
    val builder = if (noExt) builder0 else builder0.withExtensions(new GraftExtensions)
    val spark = builder
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    val catalog = SparkEntry.queries ++ extras
    val names = catalog.keys.toSeq.sorted
    // Eager post-query storage release (OUTSIDE the timed window — the
    // clock has already stopped when this runs; what it protects is the
    // NEXT query's window). Every barrier the operators materialize is
    // registered with Parallelism; without this drain the blocks die
    // only when a GC cycle lets ContextCleaner process the weak refs,
    // i.e. at an arbitrary point inside some later query's timing.
    // Releasing here is safe: every catalog entry builds its frames from
    // scratch per invocation (no operator caches a DataFrame across
    // calls), and the bench owns all in-flight work on the context.
    var sinceGc = 0
    def cleanup(): Unit = if (doCleanup) {
      graft.ext.Parallelism.releaseAll(spark)
      sinceGc += 1
      // shuffle files and broadcasts are ContextCleaner-freed only after
      // their refs are GC'd; a periodic nudge keeps ~550 executions of
      // shuffle output from piling up on disk until the JVM's own major
      // GC decides to run (mid-timing, historically)
      if (sinceGc >= 25) { sinceGc = 0; System.gc() }
    }
    // warmup: full pass, untimed (errors surface in the timed pass)
    names.foreach { name =>
      try force(catalog(name)(spark, sfDir))
      catch { case _: Throwable => () }
      cleanup()
    }
    // two timed passes, per-query MIN: single-pass numbers swing ±10%
    // with JIT/GC/checkpoint-block churn, and a round-over-round compare
    // on an outlier reads as a phantom regression. A query that fails in
    // EITHER pass reports -1 (an intermittent failure is itself a signal).
    var errors = Map.empty[String, String]
    def timedPass(): Map[String, Double] = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { force(catalog(name)(spark, sfDir)); true }
        catch {
          case e: Throwable =>
            errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9 // clock stops BEFORE cleanup
      cleanup()
      name -> (if (ok) dt else -1.0)
    }.toMap
    val pass1 = timedPass()
    System.gc() // nudge ContextCleaner so freed checkpoint blocks don't tax pass 2
    val pass2 = timedPass()
    val results = names.map { name =>
      val (a, b) = (pass1(name), pass2(name))
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    // count()-mode pass: what the r1/r2 bench measured. Catalyst legally
    // prunes projections and eliminates unconsumed joins under a count
    // aggregate, so (force - count) per query is the "honesty tax" — a
    // future force-mode slowdown whose count-mode time is unchanged is a
    // plan that got MORE prunable work, not a slower engine. Emitted so
    // regressions self-identify without an explain session.
    val countResults = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { catalog(name)(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            // same no-silent-failure contract as the force pass
            errors += s"$name [count-mode]" ->
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // both raw passes, not just the min: round-over-round adjudication
    // needs to separate plan regressions (both passes move together) from
    // machine-load noise (passes disagree) without a re-run
    val qsPass1 = names.map(k => "\"" + k + "\":" + pass1(k)).mkString("{", ",", "}")
    val qsPass2 = names.map(k => "\"" + k + "\":" + pass2(k)).mkString("{", ",", "}")
    val qsCount = countResults.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.toSeq.sorted
      .map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_pass1":$qsPass1,"queries_pass2":$qsPass2,"queries_count_mode":$qsCount,"errors":$errJson,"sf":"${esc(sfDir)}"}"""
    Files.writeString(Paths.get("BENCH_LOCAL.json"), line + "\n")
    // The driver captures only the LAST 2000 chars of stdout and parses
    // the JSON line out of that window; sbt's "[success] Total time"
    // trailer eats ~80 of them. The full-precision line above (~6.5 KB
    // with the count-mode map) never fit — rounds 1-4 all recorded
    // "parsed": null. stdout therefore gets a COMPACT variant: catalog
    // queries only (bench-only extras live in BENCH_LOCAL.json), seconds
    // to 2 decimals, numeric sf, errors only when nonempty.
    def fmt(v: Double, decimals: Int): String =
      if (v < 0) "-1"
      else {
        val s = s"%.${decimals}f".format(v).reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
        if (s.isEmpty) "0" else s
      }
    val catalogOnly = names.filterNot(extras.contains)
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    val errPart = if (errors.isEmpty) "" else s""","errors":$errJson"""
    // the stdout line pays ~16 chars per full query name; short keys
    // ("d01" for "d01_dedup_exact" — the series prefixes are unique by
    // construction) buy the precision back as the catalog grows. Full
    // names always live in BENCH_LOCAL.json.
    val shortKey: Map[String, String] = {
      val cand = catalogOnly.map(n => n -> n.takeWhile(_ != '_')).toMap
      if (cand.values.toSeq.distinct.size == catalogOnly.size) cand
      else catalogOnly.map(n => n -> n).toMap // collision: keep full names
    }
    def compactAt(decimals: Int, short: Boolean): String = {
      val qsCompact = catalogOnly
        .map { k =>
          "\"" + (if (short) shortKey(k) else k) + "\":" +
            fmt(results.toMap.apply(k), decimals)
        }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":$qsCompact$errPart,"sf":$sfNum}"""
    }
    // degrade stepwise before overflowing the tail window: full-name
    // 2-decimal, then short-key 2-decimal, then short-key 1-decimal — a
    // parsed coarse line beats an unparseable precise one
    val compact = Seq((2, false), (2, true), (1, true))
      .map { case (d, s) => compactAt(d, s) }
      .find(_.length <= 1900)
      .getOrElse(compactAt(0, short = true))
    spark.stop()
    // last stdout line, after spark.stop() so no log noise can follow
    println(compact)
    System.out.flush()
    if (compact.length > 1900)
      System.err.println(s"[bench] WARNING: compact JSON line is ${compact.length} chars — may overflow the driver's 2000-char stdout tail")
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries FAILED: ${errors.keys.toSeq.sorted.mkString(", ")}")
    }
  }
}
