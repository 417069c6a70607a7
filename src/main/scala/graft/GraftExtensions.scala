package graft

import graft.codec.{FromAvro, FromProtobuf, ToAvro, ToProtobuf}
import graft.functions.{ByteCodeL2, DotProduct, QuantizedDotProduct, SqEncodeBytes}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native expressions — the
  * idiomatic Spark extension point (`spark.sql.extensions=graft.GraftExtensions`
  * or `.withExtensions(new GraftExtensions)`), so `spark.sql` users call
  * the codec and vector functions without touching the Scala API:
  *
  * {{{
  *   SELECT graft_from_avro(payload, '{"type":"record",...}') FROM raw
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * Every function maps 1:1 onto the same Catalyst expression the Column
  * API builds — one implementation, two surfaces.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL DML over graft tables (DELETE / UPDATE / MERGE INTO) — post-hoc
    // so Spark's own resolution has fully bound the conditions/assignments
    // first. ANSI time travel (VERSION/TIMESTAMP AS OF) must intercept the
    // UNRESOLVED relation BEFORE the main resolution batch (whose built-in
    // relation resolver throws UNSUPPORTED_FEATURE.TIME_TRAVEL for v1
    // tables), so it rides the hint-resolution batch, which runs first.
    ext.injectPostHocResolutionRule(session => new graft.tables.GraftDmlRule(session))
    ext.injectHintResolutionRule(session => new graft.tables.GraftTimeTravelRule(session))
    // MERGE WITH SCHEMA EVOLUTION needs the star/explicit clause shape,
    // which Spark's resolver erases — record it pre-resolution (tags
    // survive into the resolved node GraftDmlRule intercepts)
    ext.injectHintResolutionRule(session => new graft.tables.GraftMergeShapeRule(session))
    // maintenance statements Delta adds to SQL and vanilla Spark lacks:
    // VACUUM / OPTIMIZE [ZORDER BY] / DESCRIBE HISTORY / RESTORE ...
    // VERSION AS OF — keyword-anchored, everything else delegates
    ext.injectParser((_, delegate) => new graft.tables.GraftSqlParser(delegate))
    // table-valued functions for PATH-based tables (no catalog entry
    // needed — the SQL twins of GraftTable.history/readRelation):
    //   SELECT * FROM graft_history('/lake/t')
    //   SELECT * FROM graft_at('/lake/t', 3)   -- version optional
    registerTable(ext, "graft_history",
      "commit history of the graft table at the given path", args => {
        requireArgs(args, 1, "graft_history")
        graft.tables.GraftTable(activeSession, litString(args(0), "graft_history"))
          .history().queryExecution.analyzed
      })
    registerTable(ext, "graft_at",
      "snapshot of the graft table at the given path (and optional version)", args => {
        require(args.nonEmpty && args.length <= 2,
          s"graft_at expects (path[, version]), got ${args.length} arguments")
        val table = graft.tables.GraftTable(activeSession, litString(args(0), "graft_at"))
        val asOf = if (args.length == 2) litLong(args(1), "graft_at") else Long.MaxValue
        table.readRelation(asOf).queryExecution.analyzed
      })
    register(ext, "graft_from_avro", "decode Avro binary with the given schema JSON",
      args => { requireArgs(args, 2, "graft_from_avro"); FromAvro(args(0), args(1)) })
    register(ext, "graft_to_avro", "encode a struct as Avro binary with the given schema JSON",
      args => { requireArgs(args, 2, "graft_to_avro"); ToAvro(args(0), args(1)) })
    register(ext, "graft_from_protobuf", "decode proto3 binary with the given .proto text",
      args => { requireArgs(args, 2, "graft_from_protobuf"); FromProtobuf(args(0), args(1), None) })
    register(ext, "graft_to_protobuf", "encode a struct as proto3 binary",
      args => { requireArgs(args, 1, "graft_to_protobuf"); ToProtobuf(args(0)) })
    register(ext, "graft_dot", "double-precision dot product of two float arrays",
      args => { requireArgs(args, 2, "graft_dot"); DotProduct(args(0), args(1)) })
    register(ext, "graft_qdot", "fixed-point (1e-12) integer dot product, engine-portable",
      args => { requireArgs(args, 2, "graft_qdot"); QuantizedDotProduct(args(0), args(1)) })
    register(ext, "graft_sq_encode", "8-bit scalar-quantize a vector to binary codes (vec, mins, steps)",
      args => { requireArgs(args, 3, "graft_sq_encode"); SqEncodeBytes(args(0), args(1), args(2)) })
    register(ext, "graft_sq_l2", "squared L2 between two byte-code vectors as BIGINT",
      args => { requireArgs(args, 2, "graft_sq_l2"); ByteCodeL2(args(0), args(1)) })
    // text-analysis Column combinators, surfaced to SQL through the eager
    // node->expression bridge (same builtin-composed trees, zero UDFs)
    registerText(ext, "graft_langid", "n-gram/stopword language id over {en,de,fr,es,zh}",
      graft.ext.TextAnalysis.langid)
    registerText(ext, "graft_quality_score", "composite text-quality score",
      graft.ext.TextAnalysis.qualityScore)
    registerText(ext, "graft_redact_pii", "replace email/IPv4/phone shapes with typed tags",
      graft.ext.TextAnalysis.redactPii)
    registerText(ext, "graft_fingerprint", "md5 fingerprint of normalized text",
      graft.ext.TextAnalysis.fingerprint)
    registerText(ext, "graft_token_count", "whitespace token count",
      graft.ext.TextAnalysis.tokenCount)
    registerText(ext, "graft_bpe_tokens", "BPE-ish subword token count",
      graft.ext.TextAnalysis.bpeTokenCount)
    registerText(ext, "graft_simhash64", "64-bit SimHash of word tokens",
      graft.ext.Dedup.simhash64)
    registerText(ext, "graft_portable_hash", "md5-derived 60-bit hash, engine-portable",
      graft.ext.TextAnalysis.portableHash60)
    register(ext, "graft_hamming", "Hamming distance between two 64-bit fingerprints", args => {
      requireArgs(args, 2, "graft_hamming")
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.eagerExpression(graft.ext.Dedup.hamming64(
        ColumnBridge.column(args(0)), ColumnBridge.column(args(1))))
    })
  }

  private def registerText(
      ext: SparkSessionExtensions,
      name: String,
      usage: String,
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    register(ext, name, usage, args => {
      requireArgs(args, 1, name)
      ColumnBridge.eagerExpression(f(ColumnBridge.column(args(0))))
    })
  }

  private def requireArgs(args: Seq[Expression], n: Int, fn: String): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  private def activeSession: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.active

  private def litString(e: Expression, fn: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, org.apache.spark.sql.types.StringType)
        if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a string literal, got $other")
  }

  private def litLong(e: Expression, fn: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, dt)
        if v != null && Seq(org.apache.spark.sql.types.ByteType,
          org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType).contains(dt) =>
      v.toString.toLong
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal version, got $other")
  }

  private def registerTable(
      ext: SparkSessionExtensions,
      name: String,
      usage: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    ext.injectTableFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      builder))

  private def register(
      ext: SparkSessionExtensions,
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      builder))
}
