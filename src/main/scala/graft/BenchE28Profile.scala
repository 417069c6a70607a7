package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profile of the e28 hybrid-RRF chain (bench adjudication
  * tool, not part of the catalog): times each stage of the query in an
  * otherwise-idle JVM so suite growth can be attributed to a stage
  * instead of guessed at. */
object BenchE28Profile {
  private def force(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-e28-profile")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"[e28-profile] $label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    (1 to 2).foreach { pass =>
      println(s"[e28-profile] ---- pass $pass ----")
      val emb = graft.operators.QueryDsl.t(spark, sfDir, "embeddings")
      val docs = graft.operators.QueryDsl.t(spark, sfDir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft-e28p-").toString
      val ann = new graft.ext.AnnIndex(spark, s"file://$tmp/ann",
        nTables = 8, bitsPerTable = 6, portable = true)
      timed("ann.add")(ann.add(emb, "vec_id", "embedding"))
      val lex = new graft.ext.LexIndex(spark, s"file://$tmp/lex")
      timed("lex.add")(lex.add(docs, "doc_id", "text"))
      val vecTop = timed("ann.query")(graft.ext.Parallelism.checkpointTracked(
        ann.query(emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)))
      val lexTop = timed("lex.search")(graft.ext.Parallelism.checkpointTracked(
        lex.search(docs.filter(col("doc_id") < 5), "doc_id", "text",
          k = 10, excludeSelf = true)
          .select(col("query_id").as("probe_id"), col("doc_id").as("neighbor_id"),
            col("rnk"))))
      timed("rrfFuse")(force(
        graft.ext.Similarity.rrfFuse(Seq(vecTop, lexTop), k = 10)
          .orderBy(col("probe_id"), col("rnk"))))
      graft.lake.FsUtils.deletePath(spark, s"file://$tmp")
      graft.ext.Parallelism.releaseAll(spark)
      System.gc()
    }
    spark.stop()
  }
}
