package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sums — the scalable replacement for the
  * classic anti-pattern `Window.orderBy(x)` with no partition key, which
  * funnels the ENTIRE dataset through one task (Spark even warns: "No
  * Partition Defined for Window operation"). Cumulative anything over a
  * corpus-sized frame must never single-thread at 100 TB.
  *
  * Shape: range-repartition on the order column (so partition p holds a
  * contiguous key range, ordered across partitions by construction),
  * then a cumulative sum is (a) the IN-PARTITION running sum — a
  * partitioned window, parallel — plus (b) the total of every EARLIER
  * partition — computed by a window over the per-partition totals, a
  * frame with one row PER PARTITION (metadata-scale: thousands of rows
  * on a thousand-executor cluster, never corpus-scale) and broadcast
  * back. Two shuffles total (the range exchange + the tiny totals agg);
  * nothing corpus-sized ever sits in one task.
  */
object Prefix {

  /** Append inclusive prefix sums `cum_<v>` of each `valueCols` column,
    * taken in ascending `orderCol` order. Single-key convenience form of
    * [[cumSumBy]]. */
  def cumSum(df: DataFrame, orderCol: String, valueCols: Seq[String])(
      implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame =
    cumSumBy(df, Seq(col(orderCol).asc), valueCols)

  /** Append inclusive prefix sums `cum_<v>` of each `valueCols` column,
    * taken in `orderCols` order (any mix of asc/desc sort expressions).
    *
    * The order-key tuple MUST be unique per row (pre-aggregate ties
    * first, or append a unique id as the last key — every caller here
    * does one of the two): rows tied on the full key would get an
    * arbitrary intra-tie cumulative split. The frame is materialized
    * once after the range exchange because `repartitionByRange` SAMPLES
    * its child to pick boundaries — the partition id must be the same
    * frozen value for the totals pass and the join-back pass. */
  def cumSumBy(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
      valueCols: Seq[String])(
      implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(orderCols.nonEmpty, "cumSumBy needs at least one order column")
    require(valueCols.nonEmpty, "cumSumBy needs at least one value column")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = Parallelism.materialize(
      df.repartitionByRange(parts, orderCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val aggs = valueCols.map(v => sum(col(v)).as(s"__t_$v"))
    val totals = ranged.groupBy(col("__pid")).agg(aggs.head, aggs.tail: _*)
    // one row per partition: this window is metadata-scale by construction
    val prevW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(
      col("__pid") +:
        valueCols.map(v =>
          coalesce(sum(col(s"__t_$v")).over(prevW), lit(0L)).as(s"__o_$v")): _*)
    val localW = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsets), "__pid")
      .select(
        df.columns.map(col) ++
          valueCols.map(v =>
            (sum(col(v)).over(localW) + col(s"__o_$v")).as(s"cum_$v")): _*)
  }
}
