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

  test("vacuumLog trims history: current reads + streaming tails survive, below-horizon reads fail LOUDLY") {
    val root = tmp()
    val t = GraftTable(spark, s"$root/t")(ckptSettings)
    (1 to 12).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v"))) // ckpts at 5, 10
    val expect = t.read().as[(Int, String)].collect().toSet

    // horizon = 10 - 2 = 8: commits 1..7 go
    val trimmed = t.vacuumLog(retainVersions = 2)
    assert(trimmed.map(_.take(20).toLong) === (1L to 7L))
    assert(logFiles(t.path, "\\.json").filterNot(_.getName.contains("checkpoint"))
      .map(_.getName.take(20).toLong) === (8L to 12L))
    // the pre-horizon checkpoint (v5) can no longer serve a complete
    // replay for any allowed version — dropped with its commits
    assert(logFiles(t.path, "\\.checkpoint\\.json")
      .map(_.getName.take(20).toLong) === Seq(10L))

    // CURRENT reads are untouched (replay = checkpoint 10 + tail)
    assert(t.version === 12)
    assert(t.read().as[(Int, String)].collect().toSet === expect)
    // retained PER-COMMIT history still replays (start points >= horizon-1)
    assert(t.readChanges(8).count() === 4) // commits 9..12 survive
    // snapshot time travel works at/above the oldest surviving checkpoint
    assert(t.readAt(10).count() === 10)
    assert(t.readAt(11).count() === 11)
    // a streaming tail resumed at or above the horizon keeps working
    // (startingVersion 9 replays commits 9..12 — all retained)
    val q = spark.readStream.format("graft").option("startingVersion", "9")
      .load(t.path)
      .writeStream.format("graft")
      .option("checkpointLocation", s"$root/ckpt-tail")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$root/tail")
    q.awaitTermination()
    assert(GraftTable(spark, s"$root/tail")(ckptSettings).read().count() === 4)

    // ... but BELOW the reconstructable range every consumer fails
    // loudly, never wrongly: time travel under the surviving checkpoint,
    // CDF / streaming / incremental reads under the horizon
    assert(intercept[IllegalStateException](t.readAt(6)).getMessage.contains("trimmed"))
    assert(intercept[IllegalStateException](t.readAt(9)).getMessage.contains("trimmed"))
    assert(intercept[IllegalStateException](t.readChanges(0)).getMessage.contains("trimmed"))
    assert(intercept[IllegalStateException](t.changesByVersion(2)).getMessage.contains("trimmed"))
    assert(intercept[IllegalStateException](
      new GraftStreamSource(t, Map.empty)(ckptSettings)
        .getBatch(Some(GraftOffset(3L)), GraftOffset(12L))).getMessage.contains("trimmed"))

    // idempotent: nothing left below the horizon
    assert(t.vacuumLog(retainVersions = 2).isEmpty)
  }

  test("vacuumLog refuses to orphan un-vacuumed files, then proceeds after vacuum") {
    val root = tmp()
    val t = GraftTable(spark, s"$root/t")(ckptSettings)
    (1 to 4).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
    t.delete(col("id") === 2) // v5 (checkpoint): v2's file leaves the live set
    (1 to 6).foreach(i => t.append(Seq((100 + i, "x")).toDF("id", "v"))) // ..v11, ckpt 10
    // the removed file still exists on disk: trimming the log would strand it
    val e = intercept[IllegalStateException](t.vacuumLog(retainVersions = 0))
    assert(e.getMessage.contains("vacuum"))
    assert(t.vacuum(retentionHours = 0).nonEmpty) // GC the removed file
    val trimmed = t.vacuumLog(retainVersions = 0)
    assert(trimmed.nonEmpty)
    assert(t.read().count() === 9) // 4 - 1 deleted + 6
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
