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
  *  3. hybrid search: a metadata predicate rides the cell-pruned scan of
  *     the attribute-carrying [[graft.ext.IvfIndex]] (e26's shape);
  *  4. right-to-erasure: `eraseVectors` tombstones every index at once.
  *
  * {{{ sbt "runMain graft.examples.RetrievalServingDemo" }}}
  */
object RetrievalServingDemo {

  /** Core path, callable from the spec: returns (rerankedTop5, filteredTop5). */
  def run(spark: SparkSession, root: String, emb: DataFrame)(
      implicit settings: GraftSettings): (DataFrame, DataFrame) = {
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

    (reranked, filtered)
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
    val emb = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001") + "/embeddings.parquet")
    val (reranked, filtered) = run(spark, root, emb)
    println("— two-stage (IVF-PQ shortlist + exact rerank) top-5 —")
    reranked.orderBy(col("probe_id"), col("rnk")).show(15, truncate = false)
    println("— hybrid (label IN (1,3,5)) top-5 —")
    filtered.orderBy(col("probe_id"), col("rnk")).show(15, truncate = false)
    graft.lake.FsUtils.deletePath(spark, s"file://$root")
    spark.stop()
  }
}
