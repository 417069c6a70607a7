package graft

import graft.codec.AvroSchemaConverter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: a session built withExtensions(GraftExtensions) runs
  * the engine's codec/vector functions from plain `spark.sql`. Uses its
  * own session — extensions bind at session build time. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate returns any ACTIVE session and would silently skip the
    // extensions when other suites ran first — force a fresh session (the
    // SparkContext is still shared; extensions bind per-session)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("avro encode/decode round-trips through SQL") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    df.createOrReplaceTempView("t")
    val schema = AvroSchemaConverter.toAvroSchema(
      df.schema.asInstanceOf[StructType], "Rec").toString.replace("'", "''")
    val back = spark.sql(
      s"""SELECT graft_from_avro(graft_to_avro(struct(id, name), '$schema'), '$schema') AS r
         FROM t""")
      .select("r.id", "r.name").as[(Int, String)].collect().toSet
    assert(back === Set((1, "a"), (2, "b")))
  }

  test("protobuf encode/decode round-trips through SQL") {
    import spark.implicits._
    val df = Seq((7, 1.5), (8, 2.5)).toDF("id", "w")
    df.createOrReplaceTempView("pb")
    val proto = graft.codec.ProtoSchemaGen.protoFile(
      df.schema.asInstanceOf[StructType], "Rec").replace("'", "''")
    val back = spark.sql(
      s"""SELECT graft_from_protobuf(graft_to_protobuf(struct(id, w)), '$proto') AS r
         FROM pb""")
      .select("r.id", "r.w").as[(Int, Double)].collect().toSet
    assert(back === Set((7, 1.5), (8, 2.5)))
  }

  test("vector functions available in SQL; qdot matches the Column API") {
    import spark.implicits._
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("v")
    val dot = spark.sql("SELECT graft_dot(a, b) AS d FROM v").as[Double].head()
    assert(math.abs(dot - 32.0) < 1e-9)
    val q = spark.sql("SELECT graft_qdot(a, b) AS q FROM v").as[Long].head()
    assert(q === 32L * 1000000000000L)
    // SQ codes: grid [0,8) step 8/256 -> code = floor(x/0.03125); L2 in code space
    val sq = spark.sql(
      """SELECT graft_sq_l2(
           graft_sq_encode(a, array(0.0D, 0.0D, 0.0D), array(0.03125D, 0.03125D, 0.03125D)),
           graft_sq_encode(b, array(0.0D, 0.0D, 0.0D), array(0.03125D, 0.03125D, 0.03125D))) AS s
         FROM v""").as[Long].head()
    // codes: (32,64,96) vs (128,160,192) -> 3 * 96^2
    assert(sq === 3L * 96 * 96)
  }

  test("text functions available in SQL and agree with the Column API") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the house mail bob@example.com"),
      (2L, "der hund und die katze ist das"))
      .toDF("id", "text")
    df.createOrReplaceTempView("docs")
    val viaSql = spark.sql(
      """SELECT id, graft_langid(text) AS lang, graft_quality_score(text) AS q,
        graft_redact_pii(text) AS red, graft_fingerprint(text) AS fp,
        graft_token_count(text) AS n, graft_bpe_tokens(text) AS nb
        FROM docs ORDER BY id""").collect()
    import graft.ext.TextAnalysis._
    import org.apache.spark.sql.functions.col
    val viaCols = df.select(col("id"), langid(col("text")).as("lang"),
        qualityScore(col("text")).as("q"), redactPii(col("text")).as("red"),
        fingerprint(col("text")).as("fp"), tokenCount(col("text")).as("n"),
        bpeTokenCount(col("text")).as("nb"))
      .orderBy("id").collect()
    assert(viaSql.toSeq === viaCols.toSeq)
    assert(viaSql(0).getString(1) === "en" && viaSql(1).getString(1) === "de")
    assert(viaSql(0).getString(3).contains("<EMAIL>"))
  }

  test("fingerprint/hash functions in SQL agree with the Column API") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"))
      .toDF("id", "text")
    df.createOrReplaceTempView("fp_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_simhash64(text) AS sh, graft_portable_hash(text) AS ph
        FROM fp_docs ORDER BY id""").collect()
    import org.apache.spark.sql.functions.col
    val viaCols = df.select(col("id"),
        graft.ext.Dedup.simhash64(col("text")).as("sh"),
        graft.ext.TextAnalysis.portableHash60(col("text")).as("ph"))
      .orderBy("id").collect()
    assert(viaSql.toSeq === viaCols.toSeq)
    // near-dup texts: small but nonzero hamming distance via SQL
    val ham = spark.sql(
      """SELECT graft_hamming(a.sh, b.sh) FROM
        (SELECT graft_simhash64(text) AS sh FROM fp_docs WHERE id = 1) a,
        (SELECT graft_simhash64(text) AS sh FROM fp_docs WHERE id = 2) b""")
      .head().getInt(0)
    assert(ham > 0 && ham <= 16, s"near-dup simhash distance out of range: $ham")
    assert(viaSql(0).getLong(2) >= 0L, "portable hash is non-negative")
  }
}
