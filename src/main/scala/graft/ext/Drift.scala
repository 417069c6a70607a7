package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * check a production pipeline runs when a new crawl lands: "does this
  * batch's quality/score/length distribution still look like the corpus
  * the model was tuned on?" Two standard statistics, both computed
  * distributed and (up to one final IEEE division) integer-EXACT, so
  * the same number reproduces on any engine:
  *
  *  - [[ksStatistic]] — the two-sample Kolmogorov–Smirnov D: the max
  *    absolute gap between the empirical CDFs. The CDFs are global
  *    cumulative sums over per-value counts, computed via
  *    [[Prefix.cumSum]] (never a partition-less window); the gap is
  *    compared as exact integer cross-products `|c1·n2 − c2·n1|` and
  *    divided once at the end.
  *  - [[psi]] — population stability index over equal-width bins:
  *    `Σ (p−q)·ln(p/q)` with add-one smoothing for empty bins. Shares
  *    are exact ppm integers, each `ln` is micro-nat-quantized before
  *    multiplication (the d19 discipline), terms are exact LONGs at
  *    scale 1e12, and the sum pays ONE final IEEE division.
  *
  * Both take an INTEGER value column (micro-quantized scores — the form
  * every scorer in this package already emits); binning real-valued
  * signals is the caller's quantization decision, not a hidden default.
  */
object Drift {

  /** Two-sample KS statistic over integer `valueCol`. Returns one row
    * `(n1, n2, ks)`; fails loudly on an empty side (an empty snapshot
    * has no CDF). NULL values are a scoring bug upstream — also loud. */
  def ksStatistic(df1: DataFrame, df2: DataFrame, valueCol: String)(
      implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    val c1 = df1.select(col(valueCol).as("__v")).groupBy("__v")
      .agg(count(lit(1)).as("__c1"))
    val c2 = df2.select(col(valueCol).as("__v")).groupBy("__v")
      .agg(count(lit(1)).as("__c2"))
    val merged = c1.join(c2, Seq("__v"), "full_outer")
      .select(col("__v"),
        coalesce(col("__c1"), lit(0L)).as("__c1"),
        coalesce(col("__c2"), lit(0L)).as("__c2"))
    val cum = Prefix.cumSum(merged, "__v", Seq("__c1", "__c2"))
    val totals = merged.agg(sum(col("__c1")).as("n1"), sum(col("__c2")).as("n2"),
      sum(when(col("__v").isNull, 1L).otherwise(0L)).as("__nulls"))
    val guarded = totals.where(
      when(col("n1") > 0 && col("n2") > 0 && col("__nulls") === 0L, lit(true))
        .otherwise(raise_error(lit(
          "ksStatistic: both snapshots must be non-empty with non-NULL values"))))
      .drop("__nulls")
    cum.crossJoin(broadcast(guarded))
      .select(col("n1"), col("n2"),
        abs(col("cum___c1") * col("n2") - col("cum___c2") * col("n1")).as("__num"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("__num")).as("__d"))
      .select(col("n1"), col("n2"),
        (col("__d").cast("double") / (col("n1") * col("n2")).cast("double")).as("ks"))
  }

  /** PSI over equal-width bins of integer `valueCol` (`bin = v DIV
    * binWidth`, floored). Add-one smoothing on BIN COUNTS keeps empty
    * bins finite (the standard practice); shares are exact ppm of the
    * smoothed totals. Returns one row `(n1, n2, n_bins, psi)`.
    *
    * Convention: >0.25 is "significant shift" in the credit-scoring
    * literature the metric comes from — but calibrate on your own
    * corpus; the value is only comparable under the SAME binWidth. */
  def psi(df1: DataFrame, df2: DataFrame, valueCol: String, binWidth: Long)(
      implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bins(df: DataFrame, cnt: String): DataFrame =
      df.select(floorDiv(col(valueCol), binWidth).as("__b"))
        .groupBy("__b").agg(count(lit(1)).as(cnt))
    val merged = bins(df1, "__c1").join(bins(df2, "__c2"), Seq("__b"), "full_outer")
      .select(col("__b"),
        (coalesce(col("__c1"), lit(0L)) + 1L).as("__s1"),
        (coalesce(col("__c2"), lit(0L)) + 1L).as("__s2"))
    val totals = merged.agg(
      sum(col("__s1")).as("__t1"), sum(col("__s2")).as("__t2"),
      count(lit(1)).as("n_bins"))
    merged.crossJoin(broadcast(totals))
      .select(col("__t1"), col("__t2"), col("n_bins"),
        // exact ppm shares (integer floor), micro-quantized ln of the
        // EXACT count ratio (s1·t2 / s2·t1 — not of the floored shares,
        // whose double division would reorder across engines)
        ((expr("__s1 * 1000000 DIV __t1") - expr("__s2 * 1000000 DIV __t2"))
          * (log((col("__s1") * col("__t2")).cast("double")
              / (col("__s2") * col("__t1")).cast("double"))
            .cast("decimal(28,6)") * lit(1000000)).cast("long")).as("__term"))
      .groupBy(col("__t1"), col("__t2"), col("n_bins"))
      .agg(sum(col("__term")).as("__psi12"))
      .select(
        (col("__t1") - col("n_bins")).as("n1"),
        (col("__t2") - col("n_bins")).as("n2"),
        col("n_bins"),
        // one IEEE division of the exact 1e12-scaled long (a decimal
        // scale-shift would need precision 51 on the oracle side)
        (col("__psi12").cast("double") / lit(1e12)).as("psi"))
  }

  /** Floor division for possibly-negative integer values (Spark's DIV
    * truncates toward zero; bins must be contiguous across zero). */
  private def floorDiv(v: Column, w: Long): Column =
    floor(v.cast("double") / w.toDouble).cast("long")
}
