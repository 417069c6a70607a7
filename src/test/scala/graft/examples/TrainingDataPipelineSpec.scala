package graft.examples

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** End-to-end run of the canonical corpus-prep pipeline
  * ([[TrainingDataDemo.prepareCorpus]]): every stage must do its job on a
  * corpus crafted so each exclusion rule fires exactly once.
  *
  * Sampling note: the deterministic en rate is 800/1000 over the portable
  * hash bucket of the doc id — ids used here are chosen so the two
  * intended survivors (2, 10: buckets 366, 357) pass and no survivor is
  * silently sampled away.
  */
class TrainingDataPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("prepareCorpus: scrub, filter, derep, dedup, decontaminate, sample, chunk, pack") {
    val goodA = "contact me at alice@example.com about the spark and the data of the pipeline work today"
    val goodB = "the quick brown fox and the lazy dog of the farm run through fields today happily"
    val evalText = "held out benchmark question answer pairs for evaluation purposes only"
    val corpus = Seq(
      (2L, goodA),                             // survives everything
      (6L, goodA),                             // exact dup of 2 -> dedup keeps min id 2
      (4L, s"prefix words then $evalText and more trailing text here"), // contaminated
      (9L, "9999 8888 7777 123 456 789"),      // low quality -> filtered
      (10L, goodB),                            // survives everything
      // passes per-token quality (all alpha, right length) but is one
      // bigram looped — the repetition gate must drop it
      (12L, Seq.fill(40)("spam").mkString(" ")))
      .toDF("doc_id", "text")
    val evalSet = Seq((1000L, evalText)).toDF("doc_id", "text")

    val out = TrainingDataDemo.prepareCorpus(corpus, evalSet)
    val rows = out.collect()

    assert(rows.map(_.getLong(0)).toSet === Set(2L, 10L),
      s"expected survivors {2, 10}, got ${rows.map(_.getLong(0)).toSet}")
    // scrub ran before anything else saw the text
    assert(rows.forall(!_.getString(3).contains("@")), "PII leaked into chunks")
    assert(rows.forall(_.getString(3).nonEmpty))
    // both docs fit one 64-token chunk and one 2048-token pack
    assert(rows.map(r => (r.getInt(2), r.getInt(5))).toSet === Set((0, 0)))
    assert(rows.forall(_.getInt(4) > 0), "chunk token counts must be positive")
  }
}
