package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-evidence tool (bench adjudication, not part of the catalog):
  * writes `.explain("formatted")` of each named catalog query to
  * `plans/<SPARK_GRAFT_PLAN_TAG>/<query>_<SPARK_GRAFT_PLAN_SUFFIX>.txt`.
  *
  * Same session shape as [[Bench]] so the captured plans are the plans the
  * bench runs. `SPARK_GRAFT_PLAN_CONF` accepts `k=v;k=v` session-conf
  * overrides — used to re-capture a change's BEFORE plan from the same
  * binary (e.g. `spark.graft.widen.bytesPerTask=1` reproduces the
  * pre-r20 constant `repartition(defaultParallelism)` widen).
  *
  * Usage: PlanDump d02_text_metrics e12_ann_index_query ...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r20")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_PLAN_CONF").foreach { kvs =>
      kvs.split(';').map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    }
    Files.createDirectories(Paths.get(s"plans/$tag"))
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/$tag/${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote plans/$tag/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
