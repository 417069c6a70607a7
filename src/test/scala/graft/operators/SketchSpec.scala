package graft.operators

import graft.SparkSpecBase
import graft.SparkEntry
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpecBase {

  test("approx distinct estimates within 5% of exact") {
    val approx = SparkEntry.queries("q29_approx_distinct")(spark, sf())
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = QueryDsl.t(spark, sf(), "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    exact.foreach { case (flag, (p, s)) =>
      val (ap, as_) = approx(flag)
      assert(math.abs(ap - p).toDouble / p < 0.05, s"$flag parts: $ap vs $p")
      assert(math.abs(as_ - s).toDouble / s < 0.05, s"$flag supps: $as_ vs $s")
    }
  }

  test("hll sketches union across partitions (mergeable aggregation)") {
    val li = QueryDsl.t(spark, sf(), "lineitem")
    val merged = li.repartition(8)
      .groupBy(pmod(col("l_orderkey"), lit(4)).as("g"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val exact = li.select(countDistinct("l_partkey")).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05, s"$merged vs $exact")
  }
}
