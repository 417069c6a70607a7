package graft.ext

import graft.SparkSpecBase
import graft.conf.GraftSettings
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SeenKeyIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-ski-").toString
  private implicit val settings: GraftSettings = GraftSettings.local(root)

  private def df(rows: (Long, String)*): DataFrame = rows.toDF("id", "url")
  private def key = when(col("url").isNotNull, xxhash64(col("url")))
  private def ids(d: DataFrame): Set[Long] = d.select("id").as[Long].collect().toSet

  test("keep-first-per-key within a batch and across batches") {
    val idx = new SeenKeyIndex(spark, s"$root/basic")
    val b1 = idx.filterNovel(df(1L -> "a", 2L -> "a", 3L -> "b"), "id", key)
    assert(ids(b1) === Set(1L, 3L)) // 2 loses the within-batch vote
    assert(idx.indexedCount === 2)
    val b2 = idx.filterNovel(df(4L -> "b", 5L -> "c"), "id", key)
    assert(ids(b2) === Set(5L)) // b seen by batch 1
    assert(idx.indexedCount === 3)
  }

  test("NULL keys carry no identity and always pass through") {
    val idx = new SeenKeyIndex(spark, s"$root/nulls")
    val b1 = idx.filterNovel(df(1L -> null, 2L -> null, 3L -> "x"), "id", key)
    assert(ids(b1) === Set(1L, 2L, 3L))
    val b2 = idx.filterNovel(df(4L -> null, 5L -> "x"), "id", key)
    assert(ids(b2) === Set(4L))
    assert(idx.indexedCount === 1) // only "x" is a stored key
  }

  test("tokened replay is idempotent: same answer, no double-inserted keys") {
    val idx = new SeenKeyIndex(spark, s"$root/replay")
    idx.filterNovel(df(1L -> "a"), "id", key, ingestToken = Some("b0"))
    val first = ids(idx.filterNovel(df(2L -> "a", 3L -> "b"), "id", key,
      ingestToken = Some("b1")))
    assert(first === Set(3L))
    // at-least-once redelivery of the same batch/token
    val replay = ids(idx.filterNovel(df(2L -> "a", 3L -> "b"), "id", key,
      ingestToken = Some("b1")))
    assert(replay === first, "replay must return the original answer")
    assert(idx.indexedCount === 2, "replay must not double-insert keys")
  }

  test("crash between token and key append: replay fills the gap exactly") {
    val idx = new SeenKeyIndex(spark, s"$root/crash")
    idx.filterNovel(df(1L -> "a"), "id", key, ingestToken = Some("b0"))
    idx.failpoints.arm("after-token")
    intercept[RuntimeException] {
      idx.filterNovel(df(2L -> "b", 3L -> "c"), "id", key, ingestToken = Some("b1"))
    }
    // crash window is real: token recorded, keys missing (the failpoint
    // is one-shot: it disarmed itself, so the replay runs through)
    assert(idx.indexedCount === 1)
    val replay = ids(idx.filterNovel(df(2L -> "b", 3L -> "c"), "id", key,
      ingestToken = Some("b1")))
    assert(replay === Set(2L, 3L))
    assert(idx.indexedCount === 3, "gap filled, nothing double-inserted")
    // and a SECOND replay is still stable
    val again = ids(idx.filterNovel(df(2L -> "b", 3L -> "c"), "id", key,
      ingestToken = Some("b1")))
    assert(again === Set(2L, 3L) && idx.indexedCount === 3)
  }

  test("owner tracking: remove releases keys for re-admission; purge reclaims; ownerless refuses") {
    val idx = new SeenKeyIndex(spark, s"$root/owners", trackOwners = true)
    val b1 = idx.filterNovel(df(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "c"), "id", key)
    assert(ids(b1) === Set(1L, 3L, 4L))
    assert(idx.indexedCount === 3)
    // erase winner 1 (owner of key "a") and winner 4 (owner of "c")
    idx.remove(Seq(1L, 4L).toDF("id"), "id")
    assert(idx.indexedCount === 1, "released keys must stop counting as seen")
    // a later batch re-admits the released keys with NEW winners; the
    // still-owned key "b" keeps rejecting
    val b2 = idx.filterNovel(df(5L -> "a", 6L -> "b", 7L -> "c", 8L -> "a"), "id", key)
    assert(ids(b2) === Set(5L, 7L), "released keys must be re-admittable")
    assert(idx.indexedCount === 3)
    // purge physically drops the tombstoned owners' rows; answers unchanged
    idx.purge()
    assert(idx.removedTable.read().count() === 0)
    assert(idx.keysTable.read().count() === 3, "purge must reclaim released rows")
    val b3 = idx.filterNovel(df(9L -> "a", 10L -> "d"), "id", key)
    assert(ids(b3) === Set(10L), "post-purge store must answer like never-removed")
    // an ownerless store cannot un-claim: fail loudly, not silently no-op
    val plain = new SeenKeyIndex(spark, s"$root/ownerless")
    plain.filterNovel(df(1L -> "a"), "id", key)
    intercept[IllegalArgumentException] { plain.remove(Seq(1L).toDF("id"), "id") }
    // and an owner-tracking handle on an ownerless STORE refuses too (the
    // persisted layout wins over the constructor flag)
    val relabeled = new SeenKeyIndex(spark, s"$root/ownerless", trackOwners = true)
    intercept[IllegalArgumentException] { relabeled.remove(Seq(1L).toDF("id"), "id") }
  }

  test("owner tracking: crash replay fills the gap with owner rows intact") {
    val idx = new SeenKeyIndex(spark, s"$root/owners-crash", trackOwners = true)
    idx.filterNovel(df(1L -> "a"), "id", key, ingestToken = Some("b0"))
    idx.failpoints.arm("after-token")
    intercept[RuntimeException] {
      idx.filterNovel(df(2L -> "b", 3L -> "c"), "id", key, ingestToken = Some("b1"))
    }
    assert(idx.indexedCount === 1)
    val replay = ids(idx.filterNovel(df(2L -> "b", 3L -> "c"), "id", key,
      ingestToken = Some("b1")))
    assert(replay === Set(2L, 3L))
    assert(idx.indexedCount === 3, "gap filled, nothing double-inserted")
    // owner rows landed correctly: removing the replayed winner releases its key
    idx.remove(Seq(2L).toDF("id"), "id")
    assert(idx.indexedCount === 2)
    assert(ids(idx.filterNovel(df(9L -> "b"), "id", key)) === Set(9L))
  }

  test("batch text never shuffles: rows return via broadcast semi-join on winner ids") {
    val idx = new SeenKeyIndex(spark, s"$root/plan")
    idx.filterNovel(df(1L -> "a"), "id", key) // create the store
    val out = idx.filterNovel(df(2L -> "a", 3L -> "b"), "id", key)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"winner-id join must broadcast:\n$p")
  }
}
