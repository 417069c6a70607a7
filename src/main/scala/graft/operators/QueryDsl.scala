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
    * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; read it as nanos-since-epoch (legacy conf)
    * and rebuild a micros TimestampType — truncation, matching how
    * micro-precision engines (e.g. the DuckDB oracle) read the same file.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
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
}
