package graft.examples

import graft.SparkSpecBase
import graft.conf.GraftSettings
import graft.ext.Similarity
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The demo is executable documentation — this spec keeps it TRUE: the
  * streamed-index serving path must answer exactly like the one-shot
  * operators it advertises. */
class RetrievalServingDemoSpec extends SparkSpecBase {

  test("demo serving answers equal the one-shot operators") {
    val root = Files.createTempDirectory("graft-demo-spec-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val probes = emb.filter(col("vec_id") < 3)
    val served = RetrievalServingDemo.run(spark, root, emb, docs)
    val (reranked, filtered) = (served.reranked, served.filtered)

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // two-stage path: 3 probes × dense top-5, ranked in TRUE quantized-
    // cosine order (the rerank promise), drawn from the streamed index.
    // (No one-shot ivfPqTopK equality here: the pipeline trains its
    // codebooks on batch 1 by contract, the one-shot trains on the full
    // corpus — EmbeddingIngestSpec proves streamed == same-sample twin.)
    val got = reranked
      .join(emb.select(col("vec_id").as("probe_id"), col("embedding").as("pv")), Seq("probe_id"))
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")), Seq("neighbor_id"))
      .withColumn("truesim",
        Similarity.quantizedDot(col("pv"), col("nv")).cast("double") /
          sqrt(Similarity.quantizedDot(col("pv"), col("pv")).cast("double") *
            Similarity.quantizedDot(col("nv"), col("nv")).cast("double")))
      .select("probe_id", "neighbor_id", "rnk", "truesim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.length === 15) // 3 probes × 5
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      // ranked by true similarity, descending (ties to lower id)
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._4).toSeq === byRank.map(_._4).sortBy(-(_: Double)).toSeq,
        s"rerank must order by exact similarity: $byRank")
    }

    // hybrid path == one-shot filtered ivfTopK (SAME codebook: the demo's
    // hybrid index trains on the full corpus, so exact equality holds)
    val wantFiltered = pairs(Similarity.ivfTopK(emb, probes, "vec_id", "embedding",
      k = 5, nLists = 8, nProbe = 3,
      corpusFilter = Some(col("label").isin(1, 3, 5))))
    assert(pairs(filtered) === wantFiltered)

    // true hybrid: the fused top-5 must equal a hand-computed RRF of the
    // two shortlists the demo returns — an INDEPENDENT recomputation of
    // the fusion formula (plain Scala, not rrfFuse), so the demo's claim
    // about what "hybrid" means is checked, not just echoed
    val lists = Seq(served.vecTop, served.lexTop).map(pairs)
    val rrf = lists.flatMap(_.toSeq)
      .groupBy(t => (t._1, t._2))
      .map { case ((p, n), rows) =>
        (p, n, rows.map(t => math.floor(1.0e6 / (60 + t._3) + 0.5).toLong).sum)
      }.toSeq
    val want = rrf.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
        .map { case ((p, n, _), i) => (p, n, i + 1) }
    }.toSet
    assert(pairs(served.fused) === want, "fused shortlist is not the RRF of its inputs")
    graft.lake.FsUtils.deletePath(spark, s"file://$root")
  }
}
