package graft.tables

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Pins the r19 optimization that replaced the per-commit distributed
  * stats re-scan with a parquet-footer read ([[FooterStats]]): for every
  * stat type the footer-derived values must agree with the distributed
  * aggregation's encoding — byte-equal where consumers compare bytes
  * (strings; [[StatsPruning]] orders them by unsigned UTF-8, the parquet
  * binary-stats order), value-equal elsewhere (numeric domains parse back
  * through BigDecimal). Also pins the conservative degrades: all-null
  * columns, NaN floats, zero-row files, and graft_bucket dir synthesis. */
class FooterStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-fstats-").toString

  private def footerOf(dir: String, schema: StructType): Map[String, FileStats] = {
    val conf = spark.sparkContext.hadoopConfiguration
    graft.lake.FsUtils.dataFiles(spark, dir).flatMap { st =>
      FooterStats.forFile(st.getPath, conf, schema.fields.toSeq)
        .map(f => st.getPath.getName -> f)
    }.toMap
  }

  test("footer stats match the aggregated encoding for every stat type") {
    val dir = s"${tmp()}/t"
    val df = Seq(
      (1, 10L, 1.5f, 2.25, "alpha", true, "2024-01-31", BigDecimal("12.34")),
      (7, -3L, -0.5f, 9.75, "zeta", false, "2025-12-01", BigDecimal("-8.10")),
      (4, 0L, 0.0f, 0.0, "mid", true, "2024-06-01", BigDecimal("0.01")))
      .toDF("i", "l", "f", "d", "s", "b", "dt", "dec")
      .withColumn("dt", col("dt").cast(DateType))
      .withColumn("dec", col("dec").cast(DecimalType(10, 2)))
    df.coalesce(1).write.parquet(dir)
    val stats = footerOf(dir, df.schema)
    assert(stats.size == 1)
    val f = stats.values.head
    assert(f.rows == 3L)
    def cs(name: String) = f.cols(name)
    assert(cs("i") == ColStats(Some("1"), Some("7"), 0L))
    assert(cs("l") == ColStats(Some("-3"), Some("10"), 0L))
    assert(cs("f") == ColStats(Some("-0.5"), Some("1.5"), 0L))
    // parquet normalizes FP zero bounds (+0.0 min becomes -0.0, a sound
    // lower bound); consumers parse numeric stats through BigDecimal,
    // where -0.0 == 0.0 — compare VALUES, the actual contract
    def dec(s: Option[String]) = BigDecimal(s.get)
    assert(dec(cs("d").min) == BigDecimal("0.0") && dec(cs("d").max) == BigDecimal("9.75")
      && cs("d").nulls == 0L)
    assert(cs("s") == ColStats(Some("alpha"), Some("zeta"), 0L))
    assert(cs("b") == ColStats(Some("false"), Some("true"), 0L))
    assert(cs("dt") == ColStats(Some("2024-01-31"), Some("2025-12-01"), 0L))
    assert(cs("dec") == ColStats(Some("-8.10"), Some("12.34"), 0L))
  }

  test("timestamp stats are epoch micros when the writer produced INT64 micros") {
    val dir = s"${tmp()}/t"
    val df = Seq("2024-01-01T00:00:00Z", "2025-06-15T12:30:45.123456Z")
      .toDF("raw")
      .select(col("raw").cast(TimestampType).as("ts"))
    df.coalesce(1).write
      .option("parquet.outputTimestampType", "TIMESTAMP_MICROS") // writer-local, no session mutation
      .parquet(dir)
    val f = footerOf(dir, df.schema).values.head
    // absent under an INT96 layout (conservative: no pruning); exact
    // micros under INT64 — never a wrong value
    f.cols.get("ts").foreach { ts =>
      val lo = java.time.Instant.parse("2024-01-01T00:00:00Z")
      val hi = java.time.Instant.parse("2025-06-15T12:30:45.123456Z")
      def micros(i: java.time.Instant) = i.getEpochSecond * 1000000L + i.getNano / 1000L
      assert(ts == ColStats(Some(micros(lo).toString), Some(micros(hi).toString), 0L))
    }
  }

  test("null counts, all-null columns, and NaN degrade conservatively") {
    val dir = s"${tmp()}/t"
    val df = Seq(
      (Some(1), Option.empty[String], Some(Double.NaN)),
      (None, Option.empty[String], Some(1.0)),
      (Some(5), Option.empty[String], Some(2.0)))
      .toDF("i", "s", "d")
    df.coalesce(1).write.parquet(dir)
    val f = footerOf(dir, df.schema).values.head
    assert(f.rows == 3L)
    assert(f.cols("i") == ColStats(Some("1"), Some("5"), 1L))
    // all-null column: None/None with nulls == rows (the all-null prune)
    assert(f.cols("s") == ColStats(None, None, 3L))
    // NaN-poisoned double: the column is absent (keep-the-file) or carries
    // no bounds — never a wrong bound
    assert(!f.cols.contains("d") || f.cols("d").min.isEmpty)
  }

  test("bucketed staging dirs synthesize graft_bucket min=max stats") {
    val dir = s"${tmp()}/t"
    Seq((1, "a"), (2, "b")).toDF("k", "v")
      .withColumn("graft_bucket", pmod(col("k"), lit(4)))
      .write.partitionBy("graft_bucket").parquet(dir)
    val schema = StructType(Seq(StructField("k", IntegerType),
      StructField("v", StringType), StructField("graft_bucket", IntegerType)))
    val conf = spark.sparkContext.hadoopConfiguration
    val perFile = graft.lake.FsUtils.dataFiles(spark, dir).flatMap { st =>
      FooterStats.forFile(st.getPath, conf, schema.fields.toSeq)
        .map(f => st.getPath.getParent.getName -> f)
    }
    assert(perFile.nonEmpty)
    perFile.foreach { case (parent, f) =>
      val b = parent.stripPrefix("graft_bucket=")
      assert(f.cols("graft_bucket") == ColStats(Some(b), Some(b), 0L))
    }
  }

  test("zero-row files are absent from the stats map (the distributed twin's shape)") {
    val dir = s"${tmp()}/t"
    Seq((1, "a")).toDF("k", "v").filter(col("k") > 100).coalesce(1).write.parquet(dir)
    val schema = Seq((1, "a")).toDF("k", "v").schema
    assert(footerOf(dir, schema).isEmpty)
  }

  test("a table committed through the footer path still readWhere-prunes exactly") {
    val dir = s"${tmp()}/t"
    val t = GraftTable(spark, s"file://$dir")
    t.append((1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "v")
      .repartitionByRange(1, col("k")))
    t.append((1000 to 1100).map(i => (i.toLong, s"r$i")).toDF("k", "v")
      .repartitionByRange(1, col("k")))
    val pruned = t.readWhere(col("k") === 1050L)
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(1050L))
    // analysis-time skipping: the scan must touch ONE file (inputFiles
    // reports the unpruned live set — the executed scan metric is the
    // truth; read it from the SAME execution the collect ran)
    val scan = pruned.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.head
    assert(scan.metrics("numFiles").value == 1L)
    assert(t.read().count() == 201L)
  }
}
