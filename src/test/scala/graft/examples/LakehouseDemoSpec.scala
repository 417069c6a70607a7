package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** [[LakehouseDemo]] — the composed bronze→silver→gold flow holds its
  * invariants: quarantine capture, incremental silver commits, and a gold
  * aggregate equal to its recompute twin after every drop. */
class LakehouseDemoSpec extends SparkSpecBase {
  import spark.implicits._

  test("two drops flow through expectations, streaming, and the maintained aggregate") {
    val root = Files.createTempDirectory("graft-lakedemo-").toString
    def ev(id: Long, user: Option[Long], tpe: String, v: Double) =
      (id, user, tpe, BigDecimal(v))
    val drop1 = Seq(
      ev(1, Some(10), "click", 5.0),
      ev(2, None, "click", 6.0),        // null user -> quarantined
      ev(3, Some(11), "purchase", 2000.0) // out of range -> warned, kept
    ).toDF("event_id", "user_id", "event_type", "value")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("decimal(18,6)").as("value"))
    val drop2 = Seq(
      ev(4, Some(12), "click", 1.0),
      ev(5, None, "view", 9.0) // quarantined
    ).toDF("event_id", "user_id", "event_type", "value")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("decimal(18,6)").as("value"))

    val lake = LakehouseDemo.run(spark, root, Seq(drop1, drop2))

    // bronze kept the drop-rule survivors; quarantine holds the rest
    assert(lake.bronze.read().count() == 3)
    val q = lake.quarantine.read()
    assert(q.select("event_id").as[Long].collect().sorted.toSeq == Seq(2L, 5L))
    assert(q.filter(col("_batch") === "drop-1").count() == 1)
    // warn rule counted but did not drop
    assert(lake.metrics.head.violated("value_in_range") == 1)
    assert(lake.metrics.head.violated("not_null_user_id") == 1)

    // silver streamed incrementally: one exactly-once commit per drop
    assert(lake.silver.read().count() == 3)
    assert(lake.silver.version == 2)

    // gold == recompute of silver, after incremental-only refreshes
    val gold = lake.gold.read()
      .select(col("event_type"), col("cnt"), col("sum_value").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    val twin = lake.silver.read().groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    assert(gold == twin)

    // history stays queryable through the format
    assert(spark.read.format("graft").option("versionAsOf", 1)
      .load(lake.bronze.path).count() == 2)
    assert(spark.read.format("graft").option("readChangeFeed", "true")
      .load(lake.silver.path)
      .filter(col("_change_type") === "insert").count() == 3)
  }

  test("right-to-be-forgotten: DV erasure retracts from gold, purge restores the layout") {
    val root = Files.createTempDirectory("graft-lakedemo-erase-").toString
    val drop = Seq(
      (1L, Some(10L), "click", BigDecimal(5.0)),
      (2L, Some(10L), "purchase", BigDecimal(7.0)),
      (3L, Some(11L), "click", BigDecimal(9.0))
    ).toDF("event_id", "user_id", "event_type", "value")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("decimal(18,6)").as("value"))

    val lake = LakehouseDemo.run(spark, root, Seq(drop), eraseUserId = Some(10L))

    // the erased user is gone from silver; the purge left no bitmaps
    assert(lake.silver.read().select("user_id").as[Long].collect().toSet == Set(11L))
    // gold retracted EXACTLY the erased rows (change-feed folds, no rescan)
    val gold = lake.gold.read()
      .select(col("event_type"), col("cnt"), col("sum_value").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // (the fully-retracted 'purchase' key leaves the aggregate entirely)
    assert(gold == Set(("click", 1L, 9.0)) ||
      gold == Set(("click", 1L, 9.0), ("purchase", 0L, 0.0)))
    // the delete commit wrote NOTHING: bitmaps for partially-hit files,
    // pure metadata drops for fully-hit ones — never a rewrite
    val del = lake.silver.commits().find(_.action == "delete").get
    assert(del.add.isEmpty)
    assert(del.dvs.exists(_.nonEmpty) || del.remove.nonEmpty)
    // and the property round-trip left no residue
    assert(lake.silver.tableProperties.isEmpty)
  }
}
