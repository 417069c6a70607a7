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

  test("Connect posture: the table/lake Scala API refuses a Connect session with the remedy named") {
    // classic sessions pass the guard (the real session class)
    GraftSession.requireClassic(spark.getClass.getName, "the graft table API")
    assert(spark.getClass.getName.startsWith("org.apache.spark.sql.classic."),
      s"dispatch assumption broken: ${spark.getClass.getName}")
    // a Connect session class refuses with a CLEAR message instead of an
    // opaque 'sparkContext is not supported' resolution error, and names
    // the surface that DOES work over Connect (SQL + server-side exts)
    val e = intercept[UnsupportedOperationException](
      GraftSession.requireClassic(
        "org.apache.spark.sql.connect.SparkSession", "the graft table API"))
    assert(e.getMessage.contains("Spark Connect"))
    assert(e.getMessage.contains("spark.sql.extensions=graft.GraftExtensions"))
    assert(e.getMessage.contains("the graft table API"))
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
