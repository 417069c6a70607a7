package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One catalog entry: a Spark implementation plus, when SQL-expressible, a
  * DuckDB oracle query over the same parquet tables (driver contract — see
  * repo SparkEntry/Verify). Queries without an oracle get the driver's
  * weaker rows-only check.
  */
final case class CatalogQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDsl {

  /** Load a driver-provided test table (TESTDATA.md layout).
    *
    * `events.parquet` has shipped `ts` in two physical layouts across
    * driver releases: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects, so it is read as nanos-since-epoch via the legacy
    * conf — and plain TIMESTAMP(MICROS) with isAdjustedToUTC=false, which
    * Spark reads as TIMESTAMP_NTZ. Normalize both to the session-zoned
    * micros TimestampType (session TZ is UTC everywhere in this repo, so
    * the NTZ cast is a value-preserving reinterpretation), matching how
    * micro-precision engines (e.g. the DuckDB oracle) read the same file.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Exact aggregation discipline for oracle parity AND for 100 TB money
    * math: floating sums depend on partition/merge order, so `sum(double)`
    * is not reproducible run-to-run on a cluster. We aggregate through
    * DECIMAL (exact, order-independent, overflow-checked) and emit DOUBLE
    * as the public result type. The DuckDB oracles mirror the same casts,
    * making results bit-identical across engines.
    *
    * dec2: for columns generated with 2 decimal places (prices, balances,
    * quantities, discounts). dec6: for full-precision doubles.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
  def dsum2(c: Column): Column = sum(dec2(c)).cast("double")
  def dsum6(c: Column): Column = sum(dec6(c)).cast("double")

  /** Exact mean: decimal sum over row count, both engines identically. */
  def davg2(c: Column): Column = dsum2(c) / count(lit(1))

  /** Revenue term `extendedprice * (1 - discount)` in exact decimal. */
  def revenue(price: Column, discount: Column): Column =
    dec2(price) * (lit(1) - dec2(discount))

  /** Engine-portable `num/den` rounded half-up at scale 6, for
    * NON-NEGATIVE integer columns: computed in exact integer arithmetic —
    * `(2·num·10⁶ + den) div (2·den)` — scale-shifted by an exact decimal
    * multiply, then emitted as DOUBLE. A double DIVISION rounds
    * engine-specifically when the true quotient lands on a scale-6
    * midpoint (e.g. odd/128 = x.xxxxxx5 exactly — the d19 hash-fail
    * class); integer math makes the rounding the operator's own. The
    * final decimal→double cast is safe: both engines correctly round the
    * SAME exact decimal value, so the bits match. The output must be
    * DOUBLE, not DECIMAL — the driver's canonicalizer hash-mismatches any
    * DECIMAL output column even when values are identical (r2 q36 lesson,
    * re-learned in r5 on d19/d20/d21/d22/q43). Positive-only because
    * Spark's `div` truncates toward zero while DuckDB's `//` floors —
    * they agree only on non-negative operands. */
  def ratio6(num: Column, den: Column): Column =
    (call_function("div", num * lit(2000000L) + den, den * lit(2L))
      .cast(DecimalType(12, 0)) * expr("CAST(0.000001 AS DECIMAL(7,6))"))
      .cast(DecimalType(18, 6)).cast("double")

  /** DuckDB mirror of [[ratio6]]. */
  def ratio6Sql(num: String, den: String): String =
    s"CAST(CAST(CAST((2 * ($num) * 1000000 + ($den)) // (2 * ($den)) AS DECIMAL(12,0))" +
      s" * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(18,6)) AS DOUBLE)"

  /** DuckDB CTE chain mirroring [[graft.ext.LexIndex]]'s BM25 search over
    * `documents` in more-like-this mode (query docs `doc_id <
    * maxQueryId`, self excluded, k1 = 1.2, b = 0.75, distinct query
    * terms): defines `bm` = (query_id, doc_id, score_pico, rn) with `rn`
    * the per-query BM25 rank. Returned WITHOUT the leading `WITH` so it
    * composes into a larger chain (e28 fuses it with the LSH CTEs); CTE
    * names are l-prefixed to avoid collisions. Shared by d51 and e28 —
    * the index result must equal this corpus-level recomputation, so the
    * oracle gates the whole postings/stats/pruning machinery. Every
    * fractional factor freezes to micro units through DECIMAL(28,6) (the
    * d24 discipline) before the exact-BIGINT product/sum. */
  def bm25CtesSql(maxQueryId: Int): String =
    s"""ltok AS (SELECT doc_id,
          unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
        FROM documents),
      lt2 AS (SELECT doc_id, token FROM ltok WHERE length(token) > 0),
      ltf AS (SELECT doc_id, token, count(*) AS tf FROM lt2 GROUP BY 1, 2),
      ldl AS (SELECT d.doc_id, coalesce(x.dl, 0) AS dl
              FROM documents d LEFT JOIN
                (SELECT doc_id, count(*) AS dl FROM lt2 GROUP BY 1) x USING (doc_id)),
      lst AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM ldl),
      ldf AS (SELECT token, count(*) AS df FROM ltf GROUP BY 1),
      lq AS (SELECT DISTINCT doc_id AS query_id, token FROM lt2 WHERE doc_id < $maxQueryId),
      lsc AS (SELECT lq.query_id, ltf.doc_id,
                CAST(CAST(ln(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5)) AS DECIMAL(28,6)) * 1000000 AS BIGINT)
                * CAST(CAST((CAST(tf AS DOUBLE) * (1.2 + 1.0))
                    / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
                    AS DECIMAL(28,6)) * 1000000 AS BIGINT) AS term_pico
              FROM lq JOIN ltf USING (token) JOIN ldf USING (token)
                   JOIN ldl ON ltf.doc_id = ldl.doc_id CROSS JOIN lst
              WHERE ltf.doc_id <> lq.query_id),
      lagg AS (SELECT query_id, doc_id, CAST(sum(term_pico) AS BIGINT) AS score_pico
               FROM lsc GROUP BY 1, 2),
      bm AS (SELECT query_id, doc_id, score_pico,
               row_number() OVER (PARTITION BY query_id ORDER BY score_pico DESC, doc_id) AS rn
             FROM lagg)"""
}
