package graft.examples

import graft.conf.GraftSettings
import graft.ext.Similarity
import graft.streaming.EmbeddingIngest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Runnable walkthrough of the vector-retrieval serving surface: stream an
  * embedding corpus into the persisted index fleet, then answer queries
  * the way a production retrieval tier does —
  *
  *  1. [[EmbeddingIngest]] (checkpointed AvailableNow) feeds the LSH
  *     [[graft.ext.AnnIndex]] and residual IVF-PQ [[graft.ext.IvfPqIndex]]
  *     batch by batch, each add idempotent under replay tokens;
  *  2. serving: the IVF-PQ index answers a k′=20 ADC shortlist through
  *     its cell-pruned compressed scan, and `exactRerank` buys back the
  *     approximation error with O(probes × k′) exact work (e27's shape);
  *  3. filtered search: a metadata predicate rides the cell-pruned scan of
  *     the attribute-carrying [[graft.ext.IvfIndex]] (e26's shape);
  *  4. TRUE hybrid search: a persisted BM25 [[graft.ext.LexIndex]] over
  *     the document text answers a lexical shortlist, fused with the
  *     ANN shortlist by reciprocal-rank fusion
  *     ([[Similarity.rrfFuse]], e28's shape) — rank-only, so pico-BM25
  *     and cosine need no score calibration;
  *  5. right-to-erasure: `eraseVectors` tombstones every index at once.
  *
  * {{{ sbt "runMain graft.examples.RetrievalServingDemo" }}}
  */
object RetrievalServingDemo {

  /** The demo's serving answers, plus the two hybrid-input shortlists so
    * the spec can verify the fusion independently. */
  final case class Served(reranked: DataFrame, filtered: DataFrame,
      fused: DataFrame, vecTop: DataFrame, lexTop: DataFrame)

  /** Core path, callable from the spec. `docs` is the text side of the
    * same corpus (doc_id aligned with vec_id). */
  def run(spark: SparkSession, root: String, emb: DataFrame, docs: DataFrame)(
      implicit settings: GraftSettings): Served = {
    // 1. stream the corpus in (two arrivals -> two checkpointed batches)
    val ingest = new EmbeddingIngest(spark, s"$root/pipe",
      ivfLists = 8, ivfPqM = 4)
    val srcDir = s"$root/in"
    emb.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(srcDir)
    ingest.runOnce(srcDir, emb.select("vec_id", "embedding").schema)
    emb.filter(col("vec_id") % 2 =!= 0).select("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(srcDir)
    ingest.runOnce(srcDir, emb.select("vec_id", "embedding").schema)

    val probes = emb.filter(col("vec_id") < 3)

    // 2. two-stage serving: compressed ADC shortlist -> exact re-rank
    val shortlist = ingest.ivfPqIndex.get
      .query(probes, "vec_id", "embedding", k = 20, nProbe = 3)
    val reranked = Similarity.exactRerank(shortlist, emb, probes,
      "vec_id", "embedding", k = 5)

    // 3. hybrid search: label-filtered top-k against an attr-carrying
    //    IvfIndex (separate store — the ingest pipeline's indexes carry no
    //    attrs by default)
    val hybrid = new graft.ext.IvfIndex(spark, s"$root/hybrid")
    hybrid.train(emb, "vec_id", "embedding", nLists = 8)
    hybrid.add(emb, "vec_id", "embedding", attrCols = Seq("label"))
    val filtered = hybrid.query(probes, "vec_id", "embedding", k = 5,
      nProbe = 3, corpusFilter = Some(col("label").isin(1, 3, 5)))

    // 4. true hybrid: BM25 lexical shortlist (persisted inverted index
    //    over the text side) ⊕ ANN shortlist, reciprocal-rank fused
    val lex = new graft.ext.LexIndex(spark, s"$root/lex")
    lex.add(docs, "doc_id", "text")
    val lexTop = lex.search(docs.filter(col("doc_id") < 3), "doc_id", "text",
        k = 10, excludeSelf = true)
      .select(col("query_id").as("probe_id"), col("doc_id").as("neighbor_id"), col("rnk"))
    val vecTop = ingest.annIndex.query(probes, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id", "rnk")
    val fused = Similarity.rrfFuse(Seq(vecTop, lexTop), k = 5)

    Served(reranked, filtered, fused, vecTop, lexTop)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-retrieval-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft-retrieval-demo-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val served = run(spark, root, emb, docs)
    println("— two-stage (IVF-PQ shortlist + exact rerank) top-5 —")
    served.reranked.orderBy(col("probe_id"), col("rnk")).show(15, truncate = false)
    println("— filtered (label IN (1,3,5)) top-5 —")
    served.filtered.orderBy(col("probe_id"), col("rnk")).show(15, truncate = false)
    println("— hybrid (BM25 ⊕ ANN, reciprocal-rank fused) top-5 —")
    served.fused.orderBy(col("probe_id"), col("rnk")).show(15, truncate = false)
    graft.lake.FsUtils.deletePath(spark, s"file://$root")
    spark.stop()
  }
}
