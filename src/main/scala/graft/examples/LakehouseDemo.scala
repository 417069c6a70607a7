package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.conf.GraftSettings
import graft.tables.{Expectations, GraftTable, IncrementalAgg}

/** Runnable walkthrough of the round-12 lakehouse surface — the
  * bronze→silver→gold medallion expressed ENTIRELY through the engine's
  * Spark-native table machinery:
  *
  *  1. **bronze**: raw event batches land through write-time
  *     [[Expectations]] — a NOT NULL key rule DROPS violators into a
  *     quarantine table (with the failed-rule names and a batch tag), a
  *     value-range rule WARNs; counts ride the append's own job;
  *  2. **silver**: `spark.readStream.format("graft")` tails bronze's
  *     commit log (offsets are versions) and `writeStream.format("graft")`
  *     appends one exactly-once commit per micro-batch — the whole hop is
  *     two lines of standard Structured Streaming against the registered
  *     source, incremental by construction;
  *  3. **gold**: [[IncrementalAgg]] maintains the per-type count/sum
  *     aggregate off silver's change feed — O(new rows) per refresh,
  *     never a table re-scan, exact DECIMAL folds;
  *  4. the bronze history stays queryable via
  *     `option("versionAsOf", v)` and `option("readChangeFeed", true)`.
  *
  * {{{ sbt "runMain graft.examples.LakehouseDemo" }}}
  */
object LakehouseDemo {

  final case class Lakehouse(
      bronze: GraftTable,
      quarantine: GraftTable,
      silver: GraftTable,
      gold: IncrementalAgg,
      metrics: Seq[Expectations.Metrics])

  private val rules = Seq(
    Expectations.expectNotNull("user_id").head,
    Expectations.expect("value_in_range",
      col("value") >= -1000 && col("value") <= 1000,
      Expectations.Action.Warn))

  /** Land `batches` one by one and keep silver + gold in lockstep after
    * each (the per-drop maintenance cadence a real pipeline runs). With
    * `eraseUserId`, finish with the right-to-be-forgotten flow: flip
    * silver to DELETION VECTORS via a table property (the erasure is a
    * metadata commit — no 100 TB rewrite), fold the retraction into gold
    * through the change feed, then purge the bitmaps with OPTIMIZE
    * (dataChange=false: gold is untouched). */
  def run(spark: SparkSession, root: String,
      batches: Seq[DataFrame],
      eraseUserId: Option[Long] = None): Lakehouse = {
    implicit val settings: GraftSettings =
      GraftSettings.local(root).copy(changeDataFeed = true)
    val bronze = GraftTable(spark, s"$root/bronze")
    val quarantine = GraftTable(spark, s"$root/quarantine")
    val silver = GraftTable(spark, s"$root/silver")
    val gold = IncrementalAgg(spark, s"$root/gold", silver,
      keyCols = Seq("event_type"), sumCols = Seq("value"))

    val metrics = batches.zipWithIndex.map { case (batch, i) =>
      val m = Expectations.appendWithExpectations(
        bronze, batch, rules, Some(quarantine), batchTag = Some(s"drop-$i"))
      // bronze -> silver: plain Structured Streaming over the format;
      // the checkpoint remembers the last drained version across drops
      val q = spark.readStream.format("graft").load(bronze.path)
        .filter(col("event_type").isNotNull)
        .writeStream.format("graft")
        .option("checkpointLocation", s"$root/silver-ckpt")
        .trigger(Trigger.AvailableNow())
        .start(silver.path)
      q.awaitTermination()
      gold.refresh() // fold ONLY this drop's change rows into the aggregate
      m
    }
    eraseUserId.foreach { uid =>
      silver.setProperties(Map("deletion_vectors" -> "true"))
      silver.delete(col("user_id") === uid) // bitmap sidecars, zero file rewrites
      gold.refresh() // the change feed retracts the erased rows exactly
      silver.optimize() // purge: bitmaps die, vectorized reads return
      silver.unsetProperties(Seq("deletion_vectors"))
    }
    Lakehouse(bronze, quarantine, silver, gold, metrics)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-lakehouse-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-lakehouse-").toString
    // through QueryDsl.t: it normalizes the driver's TIMESTAMP(NANOS)
    // variants — a raw spark.read.parquet breaks on regenerated testdata
    val events = graft.operators.QueryDsl
      .t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("decimal(18,6)").as("value"))
    val drops = Seq(
      events.filter(pmod(col("event_id"), lit(2)) === 0),
      events.filter(pmod(col("event_id"), lit(2)) === 1))
    val lake = run(spark, root, drops)
    println(s"bronze v${lake.bronze.version}, silver v${lake.silver.version}")
    lake.gold.read().orderBy("event_type").show(20, truncate = false)
    lake.metrics.zipWithIndex.foreach { case (m, i) =>
      println(s"drop $i: ${m.rows} rows, violations ${m.violations}")
    }
    spark.stop()
  }
}
