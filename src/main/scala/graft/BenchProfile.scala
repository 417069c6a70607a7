package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.ConcurrentHashMap

/** Per-query job profile (bench adjudication tool, not part of the
  * catalog): runs the named catalog queries in an otherwise-idle JVM with
  * a listener that records every Spark job's wall time. The output
  * separates
  *  - job time (sum of per-job wall, where the cluster was computing) from
  *  - driver gap (wall minus job time: FS/commit/planning/collect overhead),
  * and prints the slowest jobs — the difference tells whether a hot query
  * needs a better plan (few fat jobs) or fewer actions (many tiny jobs /
  * large gap). Usage: BenchProfile q51_medallion_cdc e12_ann_index_query
  */
object BenchProfile {
  private def force(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    val ended = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .map(_.getProperty("spark.job.description", "")).getOrElse("")
        // fall back to the result stage's call site — operators don't set
        // job descriptions, and the call site names the action's code line
        val site = if (desc.nonEmpty) desc
          else js.stageInfos.lastOption.map(_.name).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) ended.add((je.jobId, (System.nanoTime() - s._1) / 1e9, s._2))
      }
    })

    val names = if (args.nonEmpty) args.toSeq else Seq("q51_medallion_cdc")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup pass (untimed)
      force(fn(spark, sfDir)); graft.ext.Parallelism.releaseAll(spark); System.gc()
      Thread.sleep(300) // let the listener bus drain the warmup pass
      ended.clear()
      val t0 = System.nanoTime()
      force(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain
      val jobs = {
        import scala.jdk.CollectionConverters._
        ended.asScala.toSeq.sortBy(_._1)
      }
      val jobTime = jobs.map(_._2).sum
      println(f"[profile] $name wall=$wall%.2fs jobs=${jobs.size} jobTime=$jobTime%.2fs driverGap=${wall - jobTime}%.2fs")
      jobs.sortBy(-_._2).take(15).foreach { case (id, dt, desc) =>
        println(f"[profile]   job#$id%-4d $dt%6.3fs  ${desc.take(90)}")
      }
      graft.ext.Parallelism.releaseAll(spark); System.gc()
    }
    spark.stop()
  }
}
