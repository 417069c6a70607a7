package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.conf.GraftSettings
import graft.tables.Expectations._

/** [[Expectations]] — warn counts ride the append, drop quarantines with
  * full violation context, fail aborts before anything lands, NULL
  * predicates violate. */
class ExpectationsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-expect-").toString

  private def batch() = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, None, Some(-5.0)),       // null name
    (3L, Some("c"), None),        // null price -> NULL predicate result
    (4L, Some("d"), Some(200.0)), // price cap violation
    (5L, Some("e"), Some(3.0))
  ).toDF("id", "name", "price")

  test("warn rules count violations but write every row (observe fast path)") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val table = GraftTable(spark, s"$root/t")
    val m = appendWithExpectations(table, batch(), Seq(
      expect("has_name", col("name").isNotNull),
      expect("price_cap", col("price") <= 100)))
    assert(m.rows == 5)
    assert(m.violated("has_name") == 1)
    // NULL predicate (row 3) is a violation alongside the real cap breach
    assert(m.violated("price_cap") == 2)
    assert(table.read().count() == 5)
  }

  test("drop rules withhold violators and quarantine them with rule names") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val table = GraftTable(spark, s"$root/t")
    val q = GraftTable(spark, s"$root/q")
    val m = appendWithExpectations(table, batch(), Seq(
      expectNotNull("name").head,
      expect("price_cap", col("price") <= 100, Action.Drop),
      expect("positive", col("price") > 0, Action.Warn)),
      quarantine = Some(q), batchTag = Some("b-7"))
    assert(m.rows == 5 && m.violated("not_null_name") == 1)
    assert(table.read().select("id").as[Long].collect().sorted.toSeq == Seq(1L, 5L))
    val bad = q.read()
    assert(bad.count() == 3)
    assert(bad.columns.contains(ViolationsCol) && bad.columns.contains("_batch"))
    // a row failing several rules is quarantined ONCE, carrying all names
    val r2 = bad.filter(col("id") === 2)
      .select(array_sort(col(ViolationsCol))).as[Seq[String]].head()
    assert(r2 == Seq("not_null_name", "positive"))
    assert(bad.select(col("_batch")).distinct().as[String].head() == "b-7")
  }

  test("fail rule aborts the batch before anything is written") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val table = GraftTable(spark, s"$root/t")
    val q = GraftTable(spark, s"$root/q")
    // seed a first good batch so we can prove the version doesn't move
    appendWithExpectations(table, batch().filter(col("id") === 1),
      Seq(expect("has_name", col("name").isNotNull, Action.Fail)),
      quarantine = Some(q))
    val v0 = table.version
    val e = intercept[ExpectationsFailedException] {
      appendWithExpectations(table, batch(),
        Seq(expect("has_name", col("name").isNotNull, Action.Fail)),
        quarantine = Some(q))
    }
    assert(e.rule == "has_name" && e.violations == 1 && e.rows == 5)
    assert(table.version == v0 && table.read().count() == 1)
    assert(!q.exists)
  }

  test("drop-everything batch still commits (empty append) and quarantines all") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val table = GraftTable(spark, s"$root/t")
    val q = GraftTable(spark, s"$root/q")
    val m = appendWithExpectations(table, batch(),
      Seq(expect("impossible", lit(false), Action.Drop)), quarantine = Some(q))
    assert(m.violated("impossible") == 5)
    assert(table.read().count() == 0)
    assert(q.read().count() == 5)
  }

  test("guards: duplicate names, reserved column, empty rules") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val table = GraftTable(spark, s"$root/t")
    intercept[IllegalArgumentException] {
      appendWithExpectations(table, batch(), Seq(
        expect("x", lit(true)), expect("x", lit(true))))
    }
    intercept[IllegalArgumentException] {
      appendWithExpectations(table,
        batch().withColumn(ViolationsCol, lit("boom")),
        Seq(expect("x", lit(true))))
    }
    intercept[IllegalArgumentException] {
      appendWithExpectations(table, batch(), Seq.empty)
    }
  }
}
