package graft.api

import graft.SparkSpecBase

class GraftSessionSpec extends SparkSpecBase {

  test("remoteEndpoint: explicit > SPARK_REMOTE > classic; blank means unset") {
    assert(GraftSession.remoteEndpoint(None, Map.empty) === None)
    assert(GraftSession.remoteEndpoint(None, Map("SPARK_REMOTE" -> "")) === None)
    assert(GraftSession.remoteEndpoint(None, Map("SPARK_REMOTE" -> "  ")) === None)
    assert(GraftSession.remoteEndpoint(None,
      Map("SPARK_REMOTE" -> "sc://cluster:15002")) === Some("sc://cluster:15002"))
    assert(GraftSession.remoteEndpoint(Some("sc://other:15002"),
      Map("SPARK_REMOTE" -> "sc://cluster:15002")) === Some("sc://other:15002"))
  }

  test("classic dispatch: builder without a remote lands on a usable local session") {
    // empty env ⇒ classic path; getOrCreate returns the active test session
    val s = GraftSession.builder(appName = "graft-spec", env = Map.empty)
      .master("local[2]").getOrCreate()
    assert(s.range(3).count() === 3)
  }

  test("defaults carry the library's session confs") {
    assert(GraftSession.Defaults("spark.sql.session.timeZone") === "UTC")
    assert(GraftSession.Defaults("spark.sql.adaptive.enabled") === "true")
  }
}
