package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  // Two clearly separable token distributions: "good" prose vs "spam"
  // keyword stuffing. Labeled half trains; the held-out half (ids >= 100)
  // scores — the classifier must generalize, not memorize doc ids.
  private def corpus = Seq(
    (0L, "the quiet library holds many careful essays about science and history", true),
    (1L, "readers enjoy thoughtful writing about science history and careful argument", true),
    (2L, "buy cheap pills now click here free offer buy now cheap cheap", false),
    (3L, "free free offer click buy pills cheap now click offer offer", false),
    (100L, "a careful essay about history and science for thoughtful readers", true),
    (101L, "click now buy cheap free pills offer click buy now", false)
  ).toDF("doc_id", "text", "truth")

  test("nbTrain/nbScore separates held-out classes and keep matches sign") {
    val df = corpus
    val model = Classifier.nbTrain(df.filter($"doc_id" < 100), "text", "truth")
    val scored = Classifier.nbScore(df, "doc_id", "text", model)
      .join(df.select($"doc_id", $"truth"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4), r.getBoolean(5)))
    assert(scored.length === 6)
    scored.foreach { case (id, micro, keep, truth) =>
      assert(keep === (micro > 0), s"keep must be the sign of the micro score for doc $id")
      assert(keep === truth, s"doc $id misclassified (score_micro=$micro)")
    }
  }

  test("nbScore: unseen tokens get the smoothing floor, not a dropped row") {
    val train = Seq((0L, "alpha beta gamma", true), (1L, "delta epsilon zeta", false))
      .toDF("doc_id", "text", "y")
    val model = Classifier.nbTrain(train, "text", "y")
    // every token unseen at train time -> n_tokens * unseen + prior
    val out = Classifier.nbScore(
      Seq((9L, "omega omega psi")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().head
    val (prior, unseen) = model.scalars.collect().head match {
      case r => (r.getLong(0), r.getLong(1))
    }
    assert(out.getLong(1) === 3L)
    assert(out.getLong(2) === prior + 3 * unseen)
  }

  test("nbTrain fails loudly on a single-class corpus") {
    val oneClass = Seq((0L, "all the same label", true), (1L, "still the same", true))
      .toDF("doc_id", "text", "y")
    val model = Classifier.nbTrain(oneClass, "text", "y")
    val e = intercept[Exception] { model.scalars.collect() }
    assert(e.getMessage != null)
  }

  test("dsirWeights: target-like docs weigh positive, spam negative, bucket table bounded") {
    val df = corpus.withColumnRenamed("truth", "is_target")
    val out = Classifier.dsirWeights(df, "doc_id", "text", "is_target", buckets = 64)
      .join(df.select($"doc_id", $"is_target"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4), r.getBoolean(5)))
    assert(out.length === 6)
    out.foreach { case (id, micro, keep, tgt) =>
      assert(keep === (micro > 0), s"keep must be the sign of the weight for doc $id")
      assert(keep === tgt, s"doc $id importance-weighted to the wrong side (micro=$micro)")
    }
  }

  test("dsirWeights scoring plan broadcasts the bucket table (no model-side shuffle)") {
    val df = corpus.withColumnRenamed("truth", "is_target")
    val plan = Classifier.dsirWeights(df, "doc_id", "text", "is_target", buckets = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket-table join must broadcast; plan was:\n$plan")
  }

  test("dsirWeights on a disjoint scoring frame falls back to the floor, never NULL") {
    val train = Seq((0L, "alpha beta", true), (1L, "gamma delta", false))
      .toDF("doc_id", "text", "is_target")
    // Tokens of doc 9 may hash to buckets absent from the (tiny) stats
    // table; the coalesce floor must yield a non-NULL finite weight.
    val df = train.union(
      Seq((9L, "omega psi chi phi upsilon", false)).toDF("doc_id", "text", "is_target"))
    val out = Classifier.dsirWeights(df, "doc_id", "text", "is_target", buckets = 8)
    assert(out.filter($"dsir_weight_micro".isNull).isEmpty)
    assert(out.count() === 3)
  }

  test("topKByWeight: histogram path == exact path across boundary positions") {
    val rows = (0L until 500L).map(i => (i, (i * 7919L) % 997L - 498L)) // signed, collisions
    val df = rows.toDF("id", "w").repartition(4)
    for (k <- Seq(1, 37, 250, 499, 500, 600)) {
      val exact = Classifier.topKByWeight(df, "id", "w", k)
        .select("id").as[Long].collect().toSet
      val hist = Classifier.topKByWeight(df, "id", "w", k,
        exactLimitThreshold = 0, binWidth = 64L)
        .select("id").as[Long].collect().toSet
      assert(hist === exact, s"k=$k: histogram path diverged from exact path")
      assert(hist.size === math.min(k, 500))
    }
  }

  test("topKByWeight: deterministic tie-break on (weight desc, id asc)") {
    val df = Seq((5L, 10L), (1L, 10L), (3L, 10L), (2L, 99L)).toDF("id", "w")
    val got = Classifier.topKByWeight(df, "id", "w", 2,
      exactLimitThreshold = 0, binWidth = 4L)
      .select("id").as[Long].collect().toSet
    assert(got === Set(2L, 1L)) // 99 first, then lowest id among the 10s
  }

  test("dsirWeights rejects a non-positive bucket count") {
    val df = corpus.withColumnRenamed("truth", "is_target")
    intercept[IllegalArgumentException] {
      Classifier.dsirWeights(df, "doc_id", "text", "is_target", buckets = 0)
    }
  }
}
