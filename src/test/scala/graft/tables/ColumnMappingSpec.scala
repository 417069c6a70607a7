package graft.tables

import graft.SparkSpecBase
import graft.conf.GraftSettings
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Column mapping: RENAME/DROP COLUMN as metadata-only commits. Every
  * case asserts the storage shape (zero files touched) alongside the
  * result — metadata-only IS the feature. */
class ColumnMappingSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    s"file://${Files.createTempDirectory(prefix).toString}/t"

  private def table(path: String,
      s: GraftSettings = GraftSettings.default): GraftTable =
    GraftTable(spark, path)(s)

  test("RENAME COLUMN touches no files; every read path serves the new name") {
    val t = table(tmp("cm-rename-"))
    t.append((1 to 100).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val files = t.liveFiles().toSet
    val v0 = t.version
    t.renameColumn("v", "label")
    assert(t.liveFiles().toSet === files, "rename must move zero data files")
    assert(t.version === v0 + 1 && !t.commits().last.dataChange)
    assert(t.read().columns.toSeq === Seq("id", "label"))
    assert(t.read().select("label").as[String].collect().toSet
      === (1 to 100).map(i => s"v$i").toSet)
    assert(t.readRelation().filter(col("label") === "v5").count() === 1)
    assert(spark.read.format("graft").load(t.path)
      .select("label").where(col("id") === 7).as[String].head() === "v7")
    // time travel shows the OLD name with the same data
    assert(t.readAt(v0).columns.toSeq === Seq("id", "v"))
    // appends keep flowing under the new logical name, into the SAME
    // physical column — both generations readable in one scan
    t.append(Seq((101, "v101")).toDF("id", "label"))
    assert(t.read().count() === 101)
    assert(t.read().filter(col("label") === "v101").count() === 1)
  }

  test("stats pruning survives a rename (stats are keyed by physical name)") {
    val t = table(tmp("cm-prune-"))
    t.append((1 to 100).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.append((101 to 200).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.renameColumn("id", "doc_id")
    assert(t.prunedFiles(col("doc_id") === 150).size === 1,
      "rename must not destroy data skipping")
    assert(t.readWhere(col("doc_id") === 150).count() === 1)
    // and a file written AFTER the rename prunes too
    t.append((201 to 300).map(i => (i, s"v$i")).toDF("doc_id", "v").coalesce(1))
    assert(t.prunedFiles(col("doc_id") === 250).size === 1)
  }

  test("DROP COLUMN tombstones; re-added name gets fresh bytes, never the old ones") {
    val t = table(tmp("cm-drop-"))
    t.append(Seq((1, "secret1", 10), (2, "secret2", 20)).toDF("id", "note", "amt")
      .coalesce(1))
    val files = t.liveFiles().toSet
    val v0 = t.version
    t.dropColumn("note")
    assert(t.liveFiles().toSet === files, "drop must move zero data files")
    assert(t.read().columns.toSeq === Seq("id", "amt"))
    // time travel below the drop still reads the original bytes
    assert(t.readAt(v0).select("note").as[String].collect().toSet
      === Set("secret1", "secret2"))
    // a NEW column named `note` must NOT resurrect the old bytes
    t.append(Seq((3, 30, "fresh")).toDF("id", "amt", "note"))
    val got = t.read().select("id", "note").as[(Int, String)].collect().toMap
    assert(got(1) == null && got(2) == null,
      s"old rows must read NULL for the re-added column, got $got")
    assert(got(3) === "fresh")
    // rename the re-added column: still no resurrection
    t.renameColumn("note", "comment")
    val got2 = t.read().select("id", "comment").as[(Int, String)].collect().toMap
    assert(got2(1) == null && got2(3) === "fresh")
  }

  test("DML and deletion vectors compose with a renamed column") {
    val t = table(tmp("cm-dml-"),
      GraftSettings.default.copy(deletionVectors = true))
    t.append((1 to 50).map(i => (i, i * 10)).toDF("id", "amt").coalesce(1))
    t.renameColumn("amt", "total")
    val c = t.delete(col("total") <= 100).get // DV path, logical predicate
    assert(c.dvs.exists(_.nonEmpty))
    assert(t.read().count() === 40)
    t.update(col("id") === 20, Map("total" -> lit(999)))
    assert(t.read().filter(col("id") === 20).select("total").as[Int].head() === 999)
    // OPTIMIZE purges DVs and rewrites under the mapping — data intact
    t.optimize()
    assert(t.snapshot().dvFor.isEmpty)
    assert(t.read().filter(col("id") === 20).select("total").as[Int].head() === 999)
    assert(t.read().count() === 40)
  }

  test("rename refused on bucket keys and constraint-referenced columns") {
    val p = tmp("cm-refuse-")
    val t = table(p)
    t.setBucketSpec(Seq("id"), 4)
    t.append(Seq((1, 5)).toDF("id", "qty"))
    intercept[Exception](t.renameColumn("id", "key"))
    t.addConstraint("pos", "qty > 0")
    intercept[Exception](t.renameColumn("qty", "n"))
    intercept[Exception](t.dropColumn("qty"))
    t.dropConstraint("pos")
    t.renameColumn("qty", "n") // now fine
    assert(t.read().columns.toSeq === Seq("id", "n"))
  }

  test("SQL: ALTER TABLE '<path>' RENAME/DROP COLUMN; catalog ALTER delegates") {
    val p = tmp("cm-sql-")
    val t = table(p)
    t.append(Seq((1, "a", 1.5)).toDF("id", "v", "w"))
    spark.sql(s"ALTER TABLE '$p' RENAME COLUMN v TO label")
    assert(t.read().columns.toSeq === Seq("id", "label", "w"))
    spark.sql(s"ALTER TABLE '$p' DROP COLUMN w")
    assert(t.read().columns.toSeq === Seq("id", "label"))
    spark.sql(s"ALTER TABLE '$p' DROP COLUMN IF EXISTS ghost") // tolerated
    intercept[Exception](spark.sql(s"ALTER TABLE '$p' DROP COLUMN ghost"))
    // dotted paths address NESTED struct leaves through the same surface
    import spark.implicits._
    val p2 = tmp("cm-sql-nested-")
    val t2 = table(p2)
    t2.append(Seq((1, ("x", 2))).toDF("id", "s"))
    spark.sql(s"ALTER TABLE '$p2' RENAME COLUMN s._1 TO tag")
    assert(t2.read().select(col("s.tag")).as[String].head() === "x")
    spark.sql(s"ALTER TABLE '$p2' DROP COLUMN IF EXISTS s.ghost") // tolerated
    spark.sql(s"ALTER TABLE '$p2' DROP COLUMN s._2")
    assert(t2.read().schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
      === Seq("tag"))
    // vanilla catalog DDL is untouched by the new shapes
    spark.sql("DROP TABLE IF EXISTS cm_plain")
    spark.sql("CREATE TABLE cm_plain (id INT) USING parquet")
    spark.sql("ALTER TABLE cm_plain SET TBLPROPERTIES ('k'='v')")
    spark.sql("DROP TABLE cm_plain")
  }

  test("streaming: a rename mid-stream fails the query loudly") {
    val t = table(tmp("cm-stream-"))
    t.append((1 to 5).map(i => (i, s"v$i")).toDF("id", "v"))
    // drive the Source directly: the mid-stream guard lives on ONE pinned
    // instance (a restarted query re-pins and picks the new schema up,
    // which the second half shows)
    val src = new GraftStreamSource(t, Map.empty)(GraftSettings.default)
    val off0 = src.latestOffset(null,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    src.getBatch(None, GraftOffset.parse(off0)) // snapshot batch: fine
    t.renameColumn("v", "label")
    t.append(Seq((6, "v6")).toDF("id", "label"))
    val off1 = src.latestOffset(off0,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    val e = intercept[IllegalStateException](
      src.getBatch(Some(GraftOffset.parse(off0)), GraftOffset.parse(off1)))
    assert(e.getMessage.contains("changed during the stream"))
    // a FRESH stream picks up the renamed schema and the post-rename row
    val ckpt2 = Files.createTempDirectory("cm-stream-ck2-").toString
    val out2 = Files.createTempDirectory("cm-stream-out2-").toString
    val q2 = spark.readStream.format("graft").load(t.path)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt2).option("path", out2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    val got = spark.read.parquet(out2)
    assert(got.columns.toSeq === Seq("id", "label"))
    assert(got.count() === 6)
  }

  test("CDF synthesis reads each commit under ITS OWN mapping") {
    val t = table(tmp("cm-cdf-"),
      GraftSettings.default.copy(changeDataFeed = true))
    t.append(Seq((1, "a")).toDF("id", "v")) // v1: pre-rename
    t.renameColumn("v", "label") // v2 (metadata, invisible to CDF)
    t.append(Seq((2, "b")).toDF("id", "label")) // v3
    val ch = t.readChanges(0)
    assert(ch.filter(col("_commit_version") === 1)
      .select("id").as[Int].collect().toSeq === Seq(1))
    assert(ch.select("id").as[Int].collect().toSet === Set(1, 2))
  }

  test("rename back restores the plain (metadata-free) schema") {
    val t = table(tmp("cm-back-"))
    t.append(Seq((1, "a")).toDF("id", "v"))
    t.renameColumn("v", "w")
    t.renameColumn("w", "v")
    assert(t.read().as[(Int, String)].collect().toSeq === Seq((1, "a")))
    val stored = org.apache.spark.sql.types.DataType
      .fromJson(t.currentSchemaJson.get)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(!ColumnMapping.active(stored),
      "renaming back to the physical name should leave no mapping state")
  }

  test("NESTED rename touches no files; reads, DML, and appends serve the new leaf name") {
    val t = table(tmp("cm-nested-"))
    t.append(Seq(
      (1, ("alice", 30)), (2, ("bob", 40)), (3, ("carol", 50)))
      .toDF("id", "s").coalesce(1))
    val files = t.liveFiles().toSet
    t.renameColumn("s._1", "name")
    assert(t.liveFiles().toSet === files, "nested rename must move zero data files")
    assert(t.read().schema("s").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("name", "_2"))
    assert(t.read().select(col("s.name")).as[String].collect().toSet
      === Set("alice", "bob", "carol"))
    assert(t.readRelation().filter(col("s.name") === "bob")
      .select("id").as[Int].head() === 2)
    // post-rename DML: nested assignment through the renamed leaf, then a
    // delete filtered on it — through the SQL command path
    spark.sql("DROP TABLE IF EXISTS cm_nested")
    spark.sql(s"CREATE TABLE cm_nested USING graft LOCATION '${t.path}'")
    spark.sql("UPDATE cm_nested SET s.name = 'BOB' WHERE id = 2")
    assert(t.read().filter(col("id") === 2).select(col("s.name")).as[String].head()
      === "BOB")
    spark.sql("DELETE FROM cm_nested WHERE s.name = 'carol'")
    assert(t.read().count() === 2)
    // appends keep flowing under the new logical leaf, into the SAME
    // physical nested column — both generations readable in one scan
    t.append(Seq((4, ("dave", 60))).toDF("id", "s")
      .withColumn("s", col("s").cast(t.read().schema("s").dataType)))
    assert(t.read().filter(col("s.name") === "dave").count() === 1)
    assert(t.read().count() === 3)
  }

  test("rename inside array<struct> engages the mapped paths (deep-wrapper active)") {
    val t = table(tmp("cm-arr-"))
    t.append(Seq((1, Seq(("a", 10), ("b", 20))), (2, Seq(("c", 30))))
      .toDF("id", "s"))
    t.renameColumn("s._1", "tag")
    val elem = t.read().schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(elem.fieldNames.toSeq === Seq("tag", "_2"))
    // values must come from the files' physical leaf, not read as NULL
    // (pre-fix, active() missed metadata under an array wrapper and the
    // read served the logical name against files that never carried it)
    assert(t.read().selectExpr("explode(s.tag)").as[String].collect().toSet
      === Set("a", "b", "c"))
    assert(t.readRelation().selectExpr("explode(s.tag)").as[String].collect().toSet
      === Set("a", "b", "c"))
    // post-rename appends land in the SAME physical leaf
    t.append(Seq((3, Seq(("d", 40)))).toDF("id", "s")
      .withColumn("s", col("s").cast(t.read().schema("s").dataType)))
    assert(t.read().selectExpr("explode(s.tag)").as[String].collect().toSet
      === Set("a", "b", "c", "d"))
  }

  test("a fresh stream on a nested-renamed table serves LOGICAL nested names") {
    val root = Files.createTempDirectory("cm-nested-stream-").toString
    val t = table(s"$root/t")
    t.append(Seq((1, ("a", 10)), (2, ("b", 20))).toDF("id", "s"))
    t.renameColumn("s._1", "tag")
    val q = spark.readStream.format("graft").load(t.path)
      .writeStream.format("graft")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$root/sink")
    q.awaitTermination()
    val sink = table(s"$root/sink")
    assert(sink.read().schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
      === Seq("tag", "_2"))
    assert(sink.read().select(col("id"), col("s.tag")).as[(Int, String)]
      .collect().toMap === Map(1 -> "a", 2 -> "b"))
  }

  test("NESTED drop tombstones the leaf; a re-added leaf name never resurrects old bytes") {
    val t = table(tmp("cm-nested-drop-"))
    t.append(Seq((1, ("secret1", 10)), (2, ("secret2", 20)))
      .toDF("id", "s").coalesce(1))
    t.renameColumn("s._1", "note")
    t.renameColumn("s._2", "amt")
    val files = t.liveFiles().toSet
    t.dropColumn("s.note")
    assert(t.liveFiles().toSet === files, "nested drop must move zero data files")
    assert(t.read().schema("s").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("amt"))
    // dropping the last live leaf of a struct is refused
    val e = intercept[IllegalArgumentException](t.dropColumn("s.amt"))
    assert(e.getMessage.contains("only column"))
    // re-adding the SAME leaf name must read fresh bytes (NULL for old
    // rows), never the tombstoned physical's old values
    val structType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("amt", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("note", org.apache.spark.sql.types.StringType)))
    t.append(Seq((3, (30, "fresh"))).toDF("id", "s")
      .withColumn("s", col("s").cast(structType)))
    val notes = t.read().select(col("id"), col("s.note")).as[(Int, String)]
      .collect().toMap
    assert(notes(3) === "fresh")
    assert(notes(1) == null && notes(2) == null,
      s"old rows must read NULL for the re-added leaf, got $notes")
  }

  test("mapFilter never strengthens a hint beneath NOT (polarity soundness)") {
    import org.apache.spark.sql.sources
    val m = Map("logical" -> "phys")
    val known = sources.EqualTo("logical", 1)
    val knownMapped = sources.EqualTo("phys", 1)
    val unknown = sources.AlwaysTrue() // shape mapFilter cannot translate
    // positive position: AND may weaken to its translatable side
    assert(ColumnMapping.mapFilter(m, sources.And(known, unknown))
      === Some(knownMapped))
    // the SAME AND beneath NOT must drop entirely: Not(And(a, u)) -> Not(a)
    // admits FEWER rows than the truth — row-group stats would then skip
    // groups holding matching rows (the unsound prune this pins)
    assert(ColumnMapping.mapFilter(m, sources.Not(sources.And(known, unknown)))
      === None)
    // OR beneath NOT may weaken: Not(Or(a, u)) = Not(a) AND Not(u) ⊇ Not(a)
    assert(ColumnMapping.mapFilter(m, sources.Not(sources.Or(known, unknown)))
      === Some(sources.Not(knownMapped)))
    // positive OR with an untranslatable side drops (both sides required)
    assert(ColumnMapping.mapFilter(m, sources.Or(known, unknown)) === None)
    // double negation restores positive polarity: weakening is sound again
    assert(ColumnMapping.mapFilter(m,
      sources.Not(sources.Not(sources.And(known, unknown))))
      === Some(sources.Not(sources.Not(knownMapped))))
    // fully-translatable trees map through unchanged under any polarity
    assert(ColumnMapping.mapFilter(m, sources.Not(sources.And(known,
      sources.GreaterThan("logical", 0))))
      === Some(sources.Not(sources.And(knownMapped,
        sources.GreaterThan("phys", 0)))))
  }
}
