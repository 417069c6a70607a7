package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.conf.GraftSettings

/** [[IncrementalAgg]] — maintained aggregate == recompute twin across
  * append/upsert/delete/update, crash-replay through the cursor window,
  * consolidation, and the min/max insert-only refusal. */
class IncrementalAggSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-incragg-").toString

  private def recompute(src: GraftTable): Seq[(Option[String], Long, BigDecimal)] =
    src.read().groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(28,6)")).as("sum_v"))
      .select(col("k"), col("cnt"), col("sum_v"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        BigDecimal(r.getDecimal(2)))).toSeq.sortBy(_._1.getOrElse(""))

  private def maintained(agg: IncrementalAgg): Seq[(Option[String], Long, BigDecimal)] =
    agg.read().select(col("k"), col("cnt"), col("sum_v"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        BigDecimal(r.getDecimal(2)))).toSeq.sortBy(_._1.getOrElse(""))

  private def rows(xs: (String, String, Double)*): DataFrame =
    xs.toDF("id", "k", "v0")
      .select(col("id"), col("k"), col("v0").cast("decimal(18,6)").as("v"))

  test("maintained aggregate equals recompute across append, upsert, delete, update") {
    val root = tmp()
    implicit val st: GraftSettings =
      GraftSettings.local(root).copy(changeDataFeed = true)
    val src = GraftTable(spark, s"$root/src")
    val agg = IncrementalAgg(spark, s"$root/agg", src, Seq("k"), Seq("v"))

    src.overwrite(rows(("a", "x", 1.5), ("b", "x", 2.0), ("c", "y", 3.25)))
    // empty agg before any refresh: right shape, zero rows
    assert(agg.read().columns.toSeq == Seq("k", "cnt", "sum_v"))
    assert(agg.read().count() == 0)
    assert(agg.refresh() == src.version)
    assert(maintained(agg) == recompute(src))

    src.append(rows(("d", "y", 4.0), ("e", "z", 0.5)))
    // second commit before the next refresh: one range covers both
    src.append(rows(("f", "z", -1.0)))
    agg.refresh()
    assert(maintained(agg) == recompute(src))

    // upsert: update b (x -> y, value change), delete c, insert g
    src.upsert(
      Seq(("b", "y", 9.0, "u"), ("c", "", 0.0, "d"), ("g", "w", 7.5, "u"))
        .toDF("id", "k", "v0", "op")
        .select(col("id"), col("k"),
          col("v0").cast("decimal(18,6)").as("v"), col("op")),
      Seq("id"), "op")
    agg.refresh()
    assert(maintained(agg) == recompute(src))

    // delete an entire group: key drops out of the maintained view
    src.delete(col("k") === "w")
    agg.refresh()
    assert(maintained(agg) == recompute(src))
    assert(!maintained(agg).exists(_._1.contains("w")))

    // update: value rewrite under an unchanged key
    src.update(col("id") === "a", Map("v" -> lit(100.25).cast("decimal(18,6)")))
    agg.refresh()
    assert(maintained(agg) == recompute(src))

    // no-op refresh: cursor stays, result stays
    val c0 = agg.refresh()
    assert(agg.refresh() == c0)
    assert(maintained(agg) == recompute(src))
  }

  test("crash between cursor and delta append heals on replay — never double-counts") {
    val root = tmp()
    implicit val st: GraftSettings =
      GraftSettings.local(root).copy(changeDataFeed = true)
    val src = GraftTable(spark, s"$root/src")
    val agg = IncrementalAgg(spark, s"$root/agg", src, Seq("k"), Seq("v"))

    src.overwrite(rows(("a", "x", 1.0), ("b", "y", 2.0)))
    agg.refresh()

    src.append(rows(("c", "x", 3.0)))
    agg.failpoints.arm("after-cursor")
    intercept[IllegalStateException](agg.refresh())
    // the cursor row landed, the delta batch did not: a plain read now
    // would under-count — refresh() must heal before anything else
    agg.refresh()
    assert(maintained(agg) == recompute(src))
    // and a further replayed refresh re-applies nothing
    agg.refresh()
    assert(maintained(agg) == recompute(src))
  }

  test("consolidate collapses to one row per live key and preserves the fold") {
    val root = tmp()
    implicit val st: GraftSettings =
      GraftSettings.local(root).copy(changeDataFeed = true)
    val src = GraftTable(spark, s"$root/src")
    val agg = IncrementalAgg(spark, s"$root/agg", src, Seq("k"), Seq("v"))

    src.overwrite(rows(("a", "x", 1.0), ("b", "y", 2.0)))
    agg.refresh()
    src.append(rows(("c", "x", 3.0)))
    agg.refresh()
    src.delete(col("k") === "y")
    agg.refresh()

    val before = maintained(agg)
    agg.consolidate()
    assert(maintained(agg) == before)
    // one row per live key — the zero-count key y is gone from the store
    assert(agg.deltasTable.read().count() == before.size.toLong)
    // maintenance continues correctly after the rewrite
    src.append(rows(("d", "y", 5.0)))
    agg.refresh()
    assert(maintained(agg) == recompute(src))
  }

  test("consolidating a fully-retracted aggregate never re-applies the range") {
    val root = tmp()
    implicit val st: GraftSettings =
      GraftSettings.local(root).copy(changeDataFeed = true)
    val src = GraftTable(spark, s"$root/src")
    val agg = IncrementalAgg(spark, s"$root/agg", src, Seq("k"), Seq("v"))

    src.overwrite(rows(("a", "x", 1.0)))
    agg.refresh()
    src.delete(col("k") === "x") // retract everything
    agg.refresh()
    assert(maintained(agg).isEmpty)
    // the fold is empty, so the overwrite erases every delta row — the
    // consolidate cursor row must still keep heal() from re-applying the
    // delete range (a re-applied -1 would poison the NEXT insert of x)
    agg.consolidate()
    agg.refresh() // heal window: must be a no-op
    src.append(rows(("b", "x", 5.0)))
    agg.refresh()
    assert(maintained(agg) == recompute(src))
  }

  test("min/max maintain under insert-only feeds and refuse retraction") {
    val root = tmp()
    implicit val st: GraftSettings =
      GraftSettings.local(root).copy(changeDataFeed = true)
    val src = GraftTable(spark, s"$root/src")
    val agg = IncrementalAgg(spark, s"$root/agg", src, Seq("k"),
      Seq("v"), minMaxCols = Seq("v"))

    src.overwrite(rows(("a", "x", 5.0), ("b", "x", 1.0), ("c", "y", 3.0)))
    agg.refresh()
    src.append(rows(("d", "x", 9.0)))
    agg.refresh()
    val got = agg.read()
      .select(col("k"), col("min_v").cast("double"), col("max_v").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    assert(got == Seq(("x", 1.0, 9.0), ("y", 3.0, 3.0)))

    src.delete(col("id") === "d")
    val e = intercept[IllegalStateException](agg.refresh())
    assert(e.getMessage.contains("min/max"))
  }

  test("null keys and null values fold like the recompute") {
    val root = tmp()
    implicit val st: GraftSettings =
      GraftSettings.local(root).copy(changeDataFeed = true)
    val src = GraftTable(spark, s"$root/src")
    val agg = IncrementalAgg(spark, s"$root/agg", src, Seq("k"), Seq("v"))

    val withNulls = Seq(("a", Some("x"), Some(1.0)), ("b", None, Some(2.0)),
      ("c", Some("x"), None), ("d", None, None))
      .toDF("id", "k", "v0")
      .select(col("id"), col("k"), col("v0").cast("decimal(18,6)").as("v"))
    src.overwrite(withNulls)
    agg.refresh()
    val m = agg.read().select(col("k"), col("cnt"),
        col("sum_v").cast("double")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq.sortBy(_._1)
    // null key groups like SQL GROUP BY; null values count rows but not sums
    assert(m == Seq((None, 2L, Some(2.0)), (Some("x"), 2L, Some(1.0))))

    // deleting the null-valued row of a group decrements cnt, not sum
    src.delete(col("id") === "c")
    agg.refresh()
    assert(maintained(agg) == recompute(src))
  }
}
