package graft.tables

import graft.SparkSpecBase
import graft.conf.GraftSettings
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.file.Files

/** Log-checkpoint contract: every `logCheckpointInterval` commits the
  * table persists its fully-replayed state, and CURRENT-state reads parse
  * only that checkpoint plus the commits after it — O(interval) log-file
  * opens per read instead of O(versions), while commit files stay on disk
  * so history reads (time travel, CDF, vacuum) are untouched. The "tail
  * only" tests prove the read path really uses the checkpoint by deleting
  * every commit at or below it and observing identical answers.
  */
class LogCheckpointSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-ckpt-").toString

  private val ckptSettings = GraftSettings(logCheckpointInterval = 5)

  private def logFiles(path: String, suffix: String): Seq[File] = {
    val d = new File(s"$path/_graft_log")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("\\d{20}" + suffix)).sortBy(_.getName).toSeq
  }

  test("checkpoints appear on cadence and reads equal an uncheckpointed twin") {
    val root = tmp()
    val t = GraftTable(spark, s"$root/t")(ckptSettings)
    val twin = GraftTable(spark, s"$root/twin")(GraftSettings(logCheckpointInterval = 0))
    (1 to 12).foreach { i =>
      val batch = Seq((i, s"v$i")).toDF("id", "v")
      t.append(batch); twin.append(batch)
    }
    // interval 5 -> checkpoints at v5 and v10 (both kept: newest two)
    assert(logFiles(t.path, "\\.checkpoint\\.json").map(_.getName.take(20).toLong)
      === Seq(5L, 10L))
    assert(logFiles(twin.path, "\\.checkpoint\\.json").isEmpty)
    assert(t.version === 12 && twin.version === 12)
    assert(t.read().as[(Int, String)].collect().toSet
      === twin.read().as[(Int, String)].collect().toSet)
    assert(t.liveFiles().size === twin.liveFiles().size)
    // stats survive the checkpoint: both prune to the same (selective)
    // number of files — names differ by staging UUID, counts cannot
    assert(t.prunedFiles(col("id") === 3).size
      === twin.prunedFiles(col("id") === 3).size)
    assert(t.prunedFiles(col("id") === 3).size < t.liveFiles().size)
  }

  test("current reads survive with only the post-checkpoint tail (proof of use)") {
    val root = tmp()
    val t = GraftTable(spark, s"$root/t")(ckptSettings)
    (1 to 12).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
    val expect = t.read().as[(Int, String)].collect().toSet
    val pruned = t.prunedFiles(col("id") === 7).toSet
    // destroy every commit at or below the newest checkpoint (v10): a
    // reader replaying the raw log could never reconstruct v1..v10 now,
    // so identical answers prove the snapshot path reads the checkpoint
    logFiles(t.path, "\\.json").filterNot(_.getName.contains("checkpoint"))
      .filter(_.getName.take(20).toLong <= 10L)
      .foreach(f => assert(f.delete()))
    assert(t.version === 12)
    assert(t.exists)
    assert(t.read().as[(Int, String)].collect().toSet === expect)
    assert(t.prunedFiles(col("id") === 7).toSet === pruned)
    assert(t.readWhere(col("id") === 7).as[(Int, String)].collect().toSet
      === Set((7, "v7")))
    // time travel ABOVE the checkpoint still works off checkpoint + tail
    assert(t.readAt(11).count() === 11)
  }

  test("rewrite commits (upsert/delete/compact) replay correctly across checkpoints") {
    val root = tmp()
    val t = GraftTable(spark, s"$root/t")(ckptSettings)
    val twin = GraftTable(spark, s"$root/twin")(GraftSettings(logCheckpointInterval = 0))
    def both(f: GraftTable => Unit): Unit = { f(t); f(twin) }
    (1 to 4).foreach(i => both(_.append(Seq((i, s"v$i")).toDF("id", "v"))))
    both(_.upsert(Seq((2, "TWO", "u"), (99, "new", "c"), (3, "x", "d"))
      .toDF("id", "v", "op"), Seq("id"), "op"))          // v5 = checkpoint
    both(_.append(Seq((50, "fifty")).toDF("id", "v")))    // v6
    both(_.delete(col("id") === 1))                       // v7
    (1 to 3).foreach(i => both(_.append(Seq((100 + i, "t")).toDF("id", "v")))) // v8..v10 ckpt
    both(t => assert(t.compactIfNeeded(maxFiles = 2).isDefined)) // v11
    both(_.append(Seq((200, "last")).toDF("id", "v")))    // v12
    assert(t.read().as[(Int, String)].collect().toSet
      === twin.read().as[(Int, String)].collect().toSet)
    assert(t.liveFiles().size === twin.liveFiles().size)
    // restore below the newest checkpoint replays the raw log (kept forever)
    assert(t.readAt(6).as[(Int, String)].collect().toSet
      === twin.readAt(6).as[(Int, String)].collect().toSet)
    t.restore(6)
    twin.restore(6)
    assert(t.read().as[(Int, String)].collect().toSet
      === twin.read().as[(Int, String)].collect().toSet)
  }

  test("superseded checkpoints are pruned to the newest two") {
    val root = tmp()
    val t = GraftTable(spark, s"$root/t")(ckptSettings)
    (1 to 17).foreach(i => t.append(Seq((i, "x")).toDF("id", "v")))
    // checkpoints were written at 5, 10, 15 -> 5 pruned when 15 landed
    assert(logFiles(t.path, "\\.checkpoint\\.json").map(_.getName.take(20).toLong)
      === Seq(10L, 15L))
    // and a version between the surviving checkpoints replays 10 + tail
    assert(t.readAt(12).count() === 12)
  }
}
