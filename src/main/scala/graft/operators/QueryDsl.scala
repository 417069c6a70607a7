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
}
