package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe (adjudication tool): time the components of a tiny
  * append so the per-commit fixed cost is attributable. Not a catalog
  * entry; safe to delete. */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-commitprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("graft-probe-").toString
    val t = GraftTable(spark, s"file://$tmp/t")
    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $what%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    val df = spark.range(100).select(col("id"), (col("id") % 7).as("k"),
      concat(lit("v"), col("id")).as("s")).repartition(1)
    val tNs = GraftTable(spark, s"file://$tmp/tns")(
      graft.conf.GraftSettings.default.copy(collectFileStats = false))
    // warmup
    (1 to 3).foreach(i => t.append(df))
    println("[probe] --- steady state ---")
    (1 to 10).foreach(i => timed(s"append#$i")(t.append(df)))
    timed("read.count")(t.read().count())
    timed("read.count again")(t.read().count())
    val mdf = graft.ext.Parallelism.materialize(df)(graft.conf.GraftSettings.default)
    println("[probe] --- materialized-input appends ---")
    (1 to 5).foreach(i => timed(s"appendM#$i")(t.append(mdf)))
    println("[probe] --- no-stats appends ---")
    tNs.append(df)
    (1 to 5).foreach(i => timed(s"appendNS#$i")(tNs.append(df)))
    // bare write for comparison: the same frame to a throwaway dir
    println("[probe] --- bare parquet writes (no table protocol) ---")
    (1 to 5).foreach { i =>
      timed(s"bareWrite#$i")(
        df.write.mode("overwrite").parquet(s"$tmp/bare$i"))
    }
    spark.stop()
  }
}
