package graft

import org.apache.spark.sql.SparkSession

/** Isolated per-query pin bench: run a handful of catalog queries
  * REPEATEDLY in one otherwise-idle JVM and print min/median/all —
  * the tool for adjudicating whether a flagged query's growth in the
  * full-suite bench is a real plan regression or suite-positional noise
  * (storage churn, JIT, GC from ~550 neighboring executions). Usage:
  *
  *   java ... graft.BenchPin e28 e25 e12      # prefix match, 5 reps each
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  * SPARK_GRAFT_PIN_REPS (5). One JSON line per query + a final summary
  * line, each parseable on its own. */
object BenchPin {

  private def force(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchPin <query-prefix> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PIN_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-pin")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val catalog = SparkEntry.queries
    val picked = args.toSeq.map { p =>
      catalog.keys.toSeq.sorted.find(_.startsWith(p)).getOrElse(
        sys.error(s"no catalog query starts with '$p'"))
    }
    val results = picked.map { name =>
      // warmup (codegen/footers), untimed
      force(catalog(name)(spark, sfDir))
      graft.ext.Parallelism.releaseAll(spark)
      System.gc()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        force(catalog(name)(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ext.Parallelism.releaseAll(spark)
        System.gc()
        dt
      }
      val sorted = times.sorted
      val line = s"""{"query":"$name","min":${sorted.head},"median":${sorted(reps / 2)},""" +
        s""""all":[${times.map(t => f"$t%.3f").mkString(",")}]}"""
      println(line)
      name -> sorted.head
    }
    spark.stop()
    println(results.map { case (n, m) => "\"" + n + "\":" + f"$m%.3f" }
      .mkString("{\"metric\":\"pin_min\",", ",", s""","sf":"$sfDir","reps":$reps}"""))
  }
}
