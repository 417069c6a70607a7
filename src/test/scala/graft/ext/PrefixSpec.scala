package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSpec extends SparkSpecBase {
  import spark.implicits._

  test("cumSum matches the single-partition window on shuffled input") {
    val rows = (0L until 1000L).map(i => ((i * 337L) % 1009L, (i % 7L) - 3L, i))
    val df = rows.toDF("k", "v", "v2").repartition(8) // unique k by construction
    val got = Prefix.cumSum(df, "k", Seq("v", "v2"))
      .select("k", "cum_v", "cum_v2").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val exp = df
      .withColumn("cum_v", sum($"v").over(
        Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_v2", sum($"v2").over(
        Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum_v", "cum_v2").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === exp)
  }

  test("aucExact matches the brute-force pair statistic, ties included") {
    // scores engineered with cross-class ties
    val data = Seq(
      (10L, true), (10L, false), (8L, true), (8L, true), (8L, false),
      (5L, false), (5L, true), (3L, false), (1L, false), (12L, true))
    val df = data.toDF("s", "y").repartition(4)
    val brute = {
      val pos = data.filter(_._2).map(_._1)
      val neg = data.filterNot(_._2).map(_._1)
      val u = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      u / (pos.size * neg.size)
    }
    val row = Classifier.aucExact(df, "s", "y").collect().head
    assert(row.getLong(0) === 5L && row.getLong(1) === 5L)
    assert(math.abs(row.getDouble(2) - brute) < 1e-12,
      s"auc ${row.getDouble(2)} != brute $brute")
  }

  test("evalThresholds: exact confusion counts and a perfect-threshold F1 of 1.0") {
    val df = Seq((100L, true), (90L, true), (10L, false), (-5L, false))
      .toDF("s", "y")
    val out = Classifier.evalThresholds(df, "s", "y", Seq(50L, -10L, 95L))
      .collect().map(r => r.getLong(0) -> r).toMap
    val at50 = out(50L)
    assert((at50.getLong(1), at50.getLong(2), at50.getLong(3), at50.getLong(4)) === ((2L, 0L, 0L, 2L)))
    assert(at50.getDouble(5) === 1.0 && at50.getDouble(6) === 1.0 && at50.getDouble(7) === 1.0)
    val atNeg = out(-10L) // everything predicted positive
    assert((atNeg.getLong(1), atNeg.getLong(2)) === ((2L, 2L)))
    assert(atNeg.getDouble(5) === 0.5 && atNeg.getDouble(6) === 1.0)
    val at95 = out(95L) // one positive missed
    assert((at95.getLong(1), at95.getLong(3)) === ((1L, 1L)))
  }
}
