package graft.lake

import graft.conf.GraftSettings
import org.scalatest.funsuite.AnyFunSuite

class LakePathSpec extends AnyFunSuite {

  test("data path mounts layer bucket + tuple") {
    implicit val s: GraftSettings = GraftSettings()
    val ref = TableRef("raw", "proj", "db", "tbl")
    assert(LakePath.data(ref) === "file://datalake-raw/proj/db/tbl")
  }

  test("checkpoint and history live under the control bucket") {
    implicit val s: GraftSettings = GraftSettings()
    val ref = TableRef("staged", "p", "d", "t")
    assert(LakePath.checkpoint(ref) === "file://spark-control/_checkpoint/staged/p/d/t")
    assert(LakePath.history(ref) === "file://spark-control/_history/staged/p/d/t")
  }

  test("local settings root all buckets under one dir") {
    implicit val s: GraftSettings = GraftSettings.local("/tmp/lake1")
    assert(LakePath.data(TableRef("curated", "p", "d", "t"))
      === "file:///tmp/lake1/datalake-curated/p/d/t")
  }

  test("unknown layer rejected") {
    implicit val s: GraftSettings = GraftSettings()
    intercept[IllegalArgumentException] {
      LakePath.data(TableRef("gold", "p", "d", "t"))
    }
    intercept[IllegalArgumentException](TableRef("raw", "", "d", "t"))
  }
}
