package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpecBase {
  import spark.implicits._

  test("ksStatistic: identical snapshots 0, disjoint snapshots 1, known shift exact") {
    val a = (0L until 100L).map(v => Tuple1(v)).toDF("v").repartition(4)
    val same = Drift.ksStatistic(a, a, "v").collect().head
    assert(same.getLong(0) === 100L && same.getLong(1) === 100L)
    assert(same.getDouble(2) === 0.0)
    val b = (100L until 200L).map(v => Tuple1(v)).toDF("v").repartition(4)
    assert(Drift.ksStatistic(a, b, "v").collect().head.getDouble(2) === 1.0)
    // half-overlapping uniform supports: D = 0.5 exactly
    val c = (50L until 150L).map(v => Tuple1(v)).toDF("v")
    assert(Drift.ksStatistic(a, c, "v").collect().head.getDouble(2) === 0.5)
  }

  test("ksStatistic matches a driver-side brute force on ragged data") {
    val x = (0 until 500).map(i => ((i * 7919) % 97).toLong)
    val y = (0 until 300).map(i => ((i * 6271) % 89 + 5).toLong)
    val got = Drift.ksStatistic(x.map(Tuple1(_)).toDF("v").repartition(4),
      y.map(Tuple1(_)).toDF("v").repartition(4), "v").collect().head.getDouble(2)
    val values = (x ++ y).distinct.sorted
    val brute = values.map { t =>
      math.abs(x.count(_ <= t).toDouble / x.size - y.count(_ <= t).toDouble / y.size)
    }.max
    assert(math.abs(got - brute) < 1e-12, s"ks $got != brute $brute")
  }

  test("ksStatistic fails loudly on an empty side and on NULL values") {
    val a = Seq(1L, 2L).toDF("v")
    val empty = a.filter($"v" < 0)
    intercept[Exception] { Drift.ksStatistic(a, empty, "v").collect() }
    val withNull = Seq(Some(1L), None).toDF("v")
    intercept[Exception] { Drift.ksStatistic(a, withNull, "v").collect() }
  }

  test("psi: identical snapshots score 0; a gross shift scores large; bins cross zero") {
    val a = (-500L until 500L).map(v => Tuple1(v * 1000L)).toDF("v").repartition(4)
    val same = Drift.psi(a, a, "v", binWidth = 100000L).collect().head
    assert(same.getLong(0) === 1000L && same.getLong(1) === 1000L)
    assert(same.getDouble(3) === 0.0)
    val shifted = (2000L until 3000L).map(v => Tuple1(v * 1000L)).toDF("v")
    val big = Drift.psi(a, shifted, "v", binWidth = 100000L).collect().head.getDouble(3)
    assert(big > 1.0, s"disjoint distributions must score far above the 0.25 rule, got $big")
    intercept[IllegalArgumentException] { Drift.psi(a, a, "v", binWidth = 0L) }
  }
}
