package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  // 90% of rows share key 1 — the classic hot-key shape
  private lazy val big = (1 to 10000).map { i =>
    val k = if (i % 10 == 0) i % 7 + 2 else 1
    (k, i.toLong)
  }.toDF("k", "v")
  private lazy val small = (1 to 8).map(k => (k, s"dim$k")).toDF("k", "name")

  test("saltedJoin matches plain join results") {
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
  }

  test("hotKeys finds the dominant key only") {
    val hot = Skew.hotKeys(big, Seq("k"), minCount = 1000).as[Int].collect().toSeq
    assert(hot === Seq(1))
  }

  test("skewAwareJoin matches plain join incl. outer semantics for the tail") {
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val skewed = Skew.skewAwareJoin(big, small, Seq("k"),
      hotKeyMinCount = 1000, salt = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(skewed === plain)
  }

  test("saltedAgg equals direct aggregation") {
    val direct = big.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(big, Seq("k"), salt = 8)(
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAgg = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === direct)
  }
}
