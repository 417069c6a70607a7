package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Deletion contract for the persisted indexes: `remove` tombstones ids
  * (no store rewrite — the soft-delete shape a recrawl or right-to-erasure
  * request needs at 100 TB), `purge` physically rewrites at maintenance
  * cadence. The gate is EXACT equality: an index after remove (and after
  * purge) must answer every query exactly like an index that never
  * contained those rows — true for these structures because each doc's
  * index rows are independent (LSH buckets, IVF cells, minhash bands carry
  * no cross-doc state), so the spec can build the never-contained twin and
  * diff.
  */
class IndexMaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"${sf()}/embeddings.parquet").filter(col("vec_id") < 200)
  private val removedIdSeq = Seq(4L, 17L, 42L, 99L)
  private def removedDf: DataFrame = removedIdSeq.toDF("vec_id")
  private def kept: DataFrame = emb.filter(!col("vec_id").isin(removedIdSeq: _*))
  private def probes: DataFrame =
    emb.filter(col("vec_id") < 3) // live ids, never removed

  private def pairs(df: DataFrame): Set[(Long, Long, Int)] =
    df.select("probe_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect().toSet

  test("AnnIndex: remove ≡ never-added; purge preserves answers AND pruning") {
    val dir = Files.createTempDirectory("graft-ann-rm-").toString
    val idx = new AnnIndex(spark, s"$dir/idx", nTables = 4, bitsPerTable = 5)
    val twin = new AnnIndex(spark, s"$dir/twin", nTables = 4, bitsPerTable = 5)
    // many shuffle partitions -> many clustered files, so the post-purge
    // pruning audit has files to skip
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      idx.add(emb, "vec_id", "embedding")
      twin.add(kept, "vec_id", "embedding")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    idx.remove(removedDf, "vec_id")
    idx.remove(removedDf, "vec_id") // idempotent: appends nothing
    assert(idx.removedTable.read().count() === removedIdSeq.size)
    assert(idx.indexedCount === twin.indexedCount)
    val want = pairs(twin.query(probes, "vec_id", "embedding", k = 5))
    assert(pairs(idx.query(probes, "vec_id", "embedding", k = 5)) === want,
      "tombstoned index must answer like the never-added twin")
    // multiprobe composes with tombstones
    assert(pairs(idx.query(probes, "vec_id", "embedding", k = 5, probePerturbations = 5)) ===
      pairs(twin.query(probes, "vec_id", "embedding", k = 5, probePerturbations = 5)))
    idx.purge()
    assert(idx.removedTable.read().count() === 0)
    assert(idx.bucketsTable.read().filter(col("vec_id").isin(removedIdSeq: _*)).count() === 0,
      "purge must physically remove bucket rows")
    assert(idx.vectorsTable.read().filter(col("vec_id").isin(removedIdSeq: _*)).count() === 0,
      "purge must physically remove vector rows")
    assert(idx.indexedCount === twin.indexedCount)
    assert(pairs(idx.query(probes, "vec_id", "embedding", k = 5)) === want,
      "purged index must still answer like the never-added twin")
    // the purge rewrite re-clustered on tb: file pruning must still bite
    val total = idx.bucketsTable.liveFiles().size
    val someKey = idx.bucketsTable.read().select(col("tb")).limit(1).as[Long].collect()
    val scanned = idx.bucketsTable.prunedFiles(col("tb").isin(someKey.toSeq: _*)).size
    assert(total > 1 && scanned < total,
      s"purge must preserve the clustered layout: scanned $scanned of $total")
    graft.lake.FsUtils.deletePath(spark, s"file://$dir")
  }

  test("IvfIndex: remove ≡ never-added under the same codebook; purge preserves answers") {
    val dir = Files.createTempDirectory("graft-ivf-rm-").toString
    // SAME codebook on both sides (trained on the full corpus): the twin
    // models "this index, had those vectors never been ingested", not a
    // retrain — retraining the quantizer is an index rebuild by contract
    val idx = new IvfIndex(spark, s"$dir/idx")
    val twin = new IvfIndex(spark, s"$dir/twin")
    idx.train(emb, "vec_id", "embedding", nLists = 8)
    twin.train(emb, "vec_id", "embedding", nLists = 8)
    idx.add(emb, "vec_id", "embedding")
    twin.add(kept, "vec_id", "embedding")
    idx.remove(removedDf, "vec_id")
    assert(idx.indexedCount === twin.indexedCount)
    val want = pairs(twin.query(probes, "vec_id", "embedding", k = 5, nProbe = 3))
    assert(pairs(idx.query(probes, "vec_id", "embedding", k = 5, nProbe = 3)) === want)
    idx.purge()
    assert(idx.removedTable.read().count() === 0)
    assert(idx.cellsTable.read().filter(col("vec_id").isin(removedIdSeq: _*)).count() === 0)
    assert(pairs(idx.query(probes, "vec_id", "embedding", k = 5, nProbe = 3)) === want)
    graft.lake.FsUtils.deletePath(spark, s"file://$dir")
  }

  test("PqIndex: remove ≡ never-added under the same codebook; purge preserves answers") {
    val dir = Files.createTempDirectory("graft-pq-rm-").toString
    // SAME codebook on both sides (the IvfIndex twin rule): the twin
    // models "this index, had those vectors never been ingested"
    val idx = new PqIndex(spark, s"$dir/idx")
    val twin = new PqIndex(spark, s"$dir/twin")
    idx.train(emb, "vec_id", "embedding")
    twin.train(emb, "vec_id", "embedding")
    idx.add(emb, "vec_id", "embedding")
    twin.add(kept, "vec_id", "embedding")
    idx.remove(removedDf, "vec_id")
    assert(idx.indexedCount === twin.indexedCount)
    val want = pairs(twin.query(probes, "vec_id", "embedding", k = 5))
    assert(pairs(idx.query(probes, "vec_id", "embedding", k = 5)) === want)
    idx.purge()
    assert(idx.removedTable.read().count() === 0)
    assert(idx.codesTable.read().filter(col("vec_id").isin(removedIdSeq: _*)).count() === 0)
    assert(pairs(idx.query(probes, "vec_id", "embedding", k = 5)) === want)
    graft.lake.FsUtils.deletePath(spark, s"file://$dir")
  }

  test("IvfPqIndex: remove ≡ never-added under the same codebooks; purge preserves answers") {
    val dir = Files.createTempDirectory("graft-ivfpq-rm-").toString
    // SAME codebooks on both sides (the IvfIndex twin rule): the twin
    // models "this index, had those vectors never been ingested" — both
    // the coarse quantizer AND the residual sub-codebooks train on the
    // full corpus, since retraining either is an index rebuild
    val idx = new IvfPqIndex(spark, s"$dir/idx")
    val twin = new IvfPqIndex(spark, s"$dir/twin")
    idx.train(emb, "vec_id", "embedding", nLists = 8)
    twin.train(emb, "vec_id", "embedding", nLists = 8)
    idx.add(emb, "vec_id", "embedding")
    twin.add(kept, "vec_id", "embedding")
    idx.remove(removedDf, "vec_id")
    assert(idx.indexedCount === twin.indexedCount)
    val want = pairs(twin.query(probes, "vec_id", "embedding", k = 5, nProbe = 3))
    assert(pairs(idx.query(probes, "vec_id", "embedding", k = 5, nProbe = 3)) === want)
    idx.purge()
    assert(idx.removedTable.read().count() === 0)
    assert(idx.codesTable.read().filter(col("vec_id").isin(removedIdSeq: _*)).count() === 0)
    assert(pairs(idx.query(probes, "vec_id", "embedding", k = 5, nProbe = 3)) === want)
    graft.lake.FsUtils.deletePath(spark, s"file://$dir")
  }

  test("tombstoned ids cannot be re-added; shape mismatches fail loudly; empty adds no-op") {
    val dir = Files.createTempDirectory("graft-rm-guards-").toString
    // AnnIndex: a late batch carrying tombstoned ids must not resurrect
    // them — only its live ids enter the index
    val ann = new AnnIndex(spark, s"$dir/ann", nTables = 4, bitsPerTable = 5)
    ann.add(kept.filter(col("vec_id") =!= 100), "vec_id", "embedding")
    ann.remove(removedDf, "vec_id")
    ann.add(emb.filter(col("vec_id").isin(removedIdSeq :+ 100L: _*)), "vec_id", "embedding")
    assert(ann.indexedCount === kept.count(),
      "re-added tombstoned ids must be dropped, live ids indexed")
    val twin = new AnnIndex(spark, s"$dir/twin", nTables = 4, bitsPerTable = 5)
    twin.add(kept, "vec_id", "embedding")
    assert(pairs(ann.query(probes, "vec_id", "embedding", k = 5)) ===
      pairs(twin.query(probes, "vec_id", "embedding", k = 5)))
    // a batch of ONLY tombstoned ids — and a genuinely empty batch — are
    // silent no-ops (streaming delivers empty batches; they must not kill
    // the query with a misleading error)
    ann.add(emb.filter(col("vec_id").isin(removedIdSeq: _*)), "vec_id", "embedding")
    ann.add(emb.filter(col("vec_id") < 0), "vec_id", "embedding")
    assert(ann.indexedCount === kept.count())
    // PqIndex: reopening a trained index with a different m is silent
    // code corruption — must fail loudly instead
    val pq = new PqIndex(spark, s"$dir/pq", m = 4)
    pq.train(emb, "vec_id", "embedding")
    pq.add(emb, "vec_id", "embedding")
    val wrongM = new PqIndex(spark, s"$dir/pq", m = 8)
    intercept[IllegalArgumentException] {
      wrongM.query(probes, "vec_id", "embedding", k = 3)
    }
    intercept[IllegalArgumentException] {
      wrongM.add(emb, "vec_id", "embedding")
    }
    pq.add(emb.filter(col("vec_id") < 0), "vec_id", "embedding") // empty no-op
    // AnnIndex: a batch or probe set whose dims mismatch the store would
    // hash against a different hyperplane set and silently never match
    intercept[IllegalArgumentException] {
      ann.add(emb.filter(col("vec_id") < 0 || col("vec_id") === 100)
        .select(col("vec_id"), array(lit(1f), lit(2f)).as("embedding")),
        "vec_id", "embedding")
    }
    intercept[IllegalArgumentException] {
      ann.query(probes.select(col("vec_id"),
        array(lit(1f), lit(2f)).as("embedding")), "vec_id", "embedding", k = 3)
    }
    // IvfIndex: a batch whose dims mismatch the trained codebook would be
    // assigned to garbage cells with no error — must fail loudly
    val ivf = new IvfIndex(spark, s"$dir/ivf")
    ivf.train(emb, "vec_id", "embedding", nLists = 4)
    intercept[IllegalArgumentException] {
      ivf.add(emb.select(col("vec_id"),
        array(lit(1f), lit(2f)).as("embedding")), "vec_id", "embedding")
    }
    ivf.add(emb.filter(col("vec_id") < 0), "vec_id", "embedding") // empty no-op
    // a NON-empty batch whose vectors are NULL must fail loudly, not
    // masquerade as emptiness (min/max skip NULLs) and silently no-op the
    // ingest / empty the query
    val nullVecs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), lit(null).cast("array<float>").as("embedding"))
    intercept[IllegalArgumentException] { ann.add(nullVecs, "vec_id", "embedding") }
    intercept[IllegalArgumentException] {
      ann.query(nullVecs, "vec_id", "embedding", k = 3)
    }
    intercept[IllegalArgumentException] { ivf.add(nullVecs, "vec_id", "embedding") }
    intercept[IllegalArgumentException] { pq.add(nullVecs, "vec_id", "embedding") }
    graft.lake.FsUtils.deletePath(spark, s"file://$dir")
  }

  test("NearDupIndex: removed docs stop matching new batches; purge ≡ never-indexed") {
    val dir = Files.createTempDirectory("graft-ndi-rm-").toString
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "a completely different story about the spark optimizer and the shuffle"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    // batch doc 10 is a near-dup of indexed doc 1; doc 11 matches nothing
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (11L, "nothing like anything stored here at all whatsoever in any way"))
      .toDF("doc_id", "text")
    def build(path: String, docs: DataFrame): NearDupIndex = {
      val i = new NearDupIndex(spark, path)
      i.detectAndAdd(docs, "doc_id", "text")
      i
    }
    def matches(i: NearDupIndex, ckptDocs: DataFrame): Set[(Long, Long)] =
      i.detectAndAdd(ckptDocs, "doc_id", "text")
        .select("id_new", "id_matched").as[(Long, Long)].collect().toSet
    // control: doc 1 present -> (10, 1) matches
    val control = build(s"$dir/control", corpus)
    assert(matches(control, batch) === Set((10L, 1L)))
    // removed: tombstone doc 1 first -> no match, exactly like the twin
    // that never indexed doc 1
    val idx = build(s"$dir/idx", corpus)
    idx.remove(Seq(1L).toDF("doc_id"), "doc_id")
    idx.remove(Seq(1L).toDF("doc_id"), "doc_id") // idempotent
    assert(idx.removedTable.read().count() === 1)
    assert(idx.indexedCount === 2)
    val twin = build(s"$dir/twin", corpus.filter(col("doc_id") =!= 1))
    assert(matches(idx, batch) === matches(twin, batch))
    // purge on a fresh same-state index (idx already ingested `batch`
    // above): stores drop doc 1 physically, behavior unchanged
    val purged = build(s"$dir/purged", corpus)
    purged.remove(Seq(1L).toDF("doc_id"), "doc_id")
    purged.purge()
    assert(purged.removedTable.read().count() === 0)
    assert(purged.bandsTable.read().filter(col("doc_id") === 1).count() === 0)
    assert(purged.sigsTable.read().filter(col("doc_id") === 1).count() === 0)
    val twin2 = build(s"$dir/twin2", corpus.filter(col("doc_id") =!= 1))
    assert(matches(purged, batch) === matches(twin2, batch))
    graft.lake.FsUtils.deletePath(spark, s"file://$dir")
  }
}
