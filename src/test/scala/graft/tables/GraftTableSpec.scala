package graft.tables

import graft.SparkSpecBase
import graft.conf.GraftSettings
import graft.streaming.IncrementalRunner
import org.apache.spark.sql.functions._
import java.nio.file.Files

class GraftTableSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpTable(): GraftTable = {
    val dir = Files.createTempDirectory("graft-table-").toString
    GraftTable(spark, s"file://$dir/t")(GraftSettings.default)
  }

  test("append accumulates, overwrite replaces, readAt time-travels") {
    val t = tmpTable()
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    assert(t.read().count() === 3)
    assert(t.version === 2)
    t.overwrite(Seq((9, "z")).toDF("id", "v"))
    assert(t.read().as[(Int, String)].collect().toSet === Set((9, "z")))
    assert(t.readAt(2).count() === 3) // time travel before the overwrite
  }

  test("upsert applies CDC merge semantics (update/insert/delete)") {
    val t = tmpTable()
    t.append(Seq((1, "one", 10.0), (2, "two", 20.0), (3, "three", 30.0))
      .toDF("id", "name", "amt"))
    val updates = Seq(
      (2, "TWO", 22.0, "u"),  // matched update
      (4, "four", 44.0, "c"), // unmatched insert
      (3, "three", 30.0, "d") // matched delete
    ).toDF("id", "name", "amt", "op")
    t.upsert(updates, Seq("id"), "op")
    val got = t.read().as[(Int, String, Double)].collect().toSet
    assert(got === Set((1, "one", 10.0), (2, "TWO", 22.0), (4, "four", 44.0)))
  }

  test("upsert is idempotent and bootstraps an absent table") {
    val t = tmpTable()
    val updates = Seq((1, "a", "c"), (2, "b", "c"), (9, "x", "d"))
      .toDF("id", "v", "op")
    t.upsert(updates, Seq("id"), "op") // bootstrap: overwrite, deletes dropped
    t.upsert(updates, Seq("id"), "op") // replay: same final state
    assert(t.read().as[(Int, String)].collect().toSet === Set((1, "a"), (2, "b")))
  }

  test("upsert evolves schema (new column, old rows null)") {
    val t = tmpTable()
    t.append(Seq((1, "a")).toDF("id", "v"))
    t.upsert(Seq((2, "b", "extra", "c")).toDF("id", "v", "v2", "op"), Seq("id"), "op")
    val got = t.read().orderBy("id").collect()
    assert(got.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(got(0).isNullAt(got(0).fieldIndex("v2")))
    assert(got(1).getString(got(1).fieldIndex("v2")) === "extra")
  }

  test("compaction rewrites files with dataChange=false; incremental consumers skip it") {
    val t = tmpTable()
    (1 to 5).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
    val before = t.liveFiles().size
    assert(before >= 5)
    val c = t.compactIfNeeded(maxFiles = 2)
    assert(c.isDefined && !c.get.dataChange)
    assert(t.liveFiles().size < before)
    assert(t.read().count() === 5)
    // incremental consumer: sees the 5 appends, not the compaction
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    var seen = 0L
    IncrementalRunner.runOnce(spark, t, s"file://$ckpt/cp")(b => seen = b.count())
    assert(seen === 5)
    // nothing new afterwards
    assert(!IncrementalRunner.runOnce(spark, t, s"file://$ckpt/cp")(_ => fail("no batch expected")))
    // a new append after compaction is consumed alone
    t.append(Seq((6, "v6")).toDF("id", "v"))
    IncrementalRunner.runOnce(spark, t, s"file://$ckpt/cp")(b => seen = b.count())
    assert(seen === 1)
  }

  test("bucketed upsert rewrites only affected buckets") {
    val dir = Files.createTempDirectory("graft-bucket-").toString
    val t = GraftTable(spark, s"file://$dir/t")(GraftSettings.default)
    t.setBucketSpec(Seq("id"), numBuckets = 8)
    t.append((1 to 200).map(i => (i, s"v$i")).toDF("id", "v"))
    val before = t.liveFiles()
    assert(before.forall(_.startsWith("b")), s"files must carry buckets: $before")
    assert(before.map(f => f.takeWhile(_ != '-')).distinct.size > 1, "expected multiple buckets")

    // update exactly one key -> only that key's bucket may be rewritten
    val c = t.upsert(Seq((7, "SEVEN", "u")).toDF("id", "v", "op"), Seq("id"), "op")
    val rewrittenBuckets = c.remove.map(f => f.takeWhile(_ != '-')).distinct
    assert(rewrittenBuckets.size === 1, s"rewrote buckets: $rewrittenBuckets")
    // untouched files still live
    assert((before.toSet -- c.remove.toSet).subsetOf(t.liveFiles().toSet))
    // content correct
    val got = t.read().as[(Int, String)].collect().toMap
    assert(got.size === 200 && got(7) === "SEVEN" && got(8) === "v8")

    // inserts into a fresh bucket don't touch existing files
    val c2 = t.upsert(Seq((9999, "new", "c")).toDF("id", "v", "op"), Seq("id"), "op")
    assert(c2.remove.map(f => f.takeWhile(_ != '-')).distinct.size <= 1)
    assert(t.read().count() === 201)

    // deletes shrink only their bucket
    t.upsert(Seq((7, "x", "d")).toDF("id", "v", "op"), Seq("id"), "op")
    assert(t.read().count() === 200)
    assert(!t.read().as[(Int, String)].collect().toMap.contains(7))
  }

  test("bucket spec is immutable once declared") {
    val dir = Files.createTempDirectory("graft-bucket2-").toString
    val t = GraftTable(spark, s"file://$dir/t")(GraftSettings.default)
    t.setBucketSpec(Seq("id"), 4)
    t.setBucketSpec(Seq("id"), 4) // same spec: no-op
    intercept[IllegalStateException](t.setBucketSpec(Seq("id"), 8))
  }

  test("history exposes versions and operations") {
    val t = tmpTable()
    t.append(Seq((1, "a")).toDF("id", "v"))
    t.overwrite(Seq((2, "b")).toDF("id", "v"))
    val h = t.history().select("version", "operation").as[(Long, String)].collect().toSeq
    assert(h === Seq((2L, "overwrite"), (1L, "append")))
  }

  test("vacuum removes aged-out dead files only") {
    val t = tmpTable()
    t.append(Seq((1, "a")).toDF("id", "v"))
    val deadFiles = t.liveFiles()
    t.overwrite(Seq((2, "b")).toDF("id", "v"))
    assert(t.vacuum(retentionHours = 1.0) === Seq.empty) // too young
    val deleted = t.vacuum(retentionHours = 0.0)
    assert(deleted.toSet === deadFiles.toSet)
    assert(t.read().count() === 1) // live data untouched
    // time travel to a vacuumed version now fails (files are gone) — same
    // contract as Delta after VACUUM
    intercept[Exception](t.readAt(1).collect())
  }
}
