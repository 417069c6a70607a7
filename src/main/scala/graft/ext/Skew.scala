package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations.
  *
  * First line of defense at runtime is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default with AQE) — it
  * handles sort-merge joins whose partitions are outliers. Salting remains
  * necessary when (a) one key dominates so hard a single key exceeds a
  * task, or (b) the skew is in an aggregation, which AQE does not split.
  */
object Skew {

  /** Uniform salt in [0, salt): deterministic given the row's content. */
  private def saltCol(cols: Seq[Column], salt: Int): Column =
    pmod(xxhash64(cols: _*), lit(salt)).cast("int")

  /** Salted equi-join: the big side scatters each row into one of `salt`
    * sub-keys; the small side replicates `salt` times. Breaks a hot key
    * into `salt` parallel join tasks at the cost of replicating the small
    * side — use when ONE side is small enough to replicate but too big /
    * too skew-prone to broadcast whole. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val bigSalted = big.withColumn("__salt",
      saltCol(big.columns.map(col).toSeq, salt))
    val smallSalted = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigSalted.join(smallSalted, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Keys whose frequency exceeds `minCount` — the candidates for special
    * handling. One cheap partial-agg pass. */
  def hotKeys(df: DataFrame, keys: Seq[String], minCount: Long): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select(keys.map(col): _*)

  /** Two-path skew-aware join: rows with hot keys go through the salted
    * path, the long tail joins normally — so the small side is only
    * replicated for the handful of keys that need it.
    *
    * Plan shape: one pass to find hot keys (broadcast back), two joins,
    * one union — all shuffle volumes bounded by the actual skew. */
  def skewAwareJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      hotKeyMinCount: Long,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    // correctness restriction: the hot/cold split semi-filters the small
    // side, so right/full-outer results would lose unmatched small-side
    // rows with hot keys — only big-side-preserving join types are sound
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(normalized),
      s"skewAwareJoin supports inner/left/left_semi/left_anti, got '$joinType' " +
        "(right/full outer would drop unmatched small-side rows with hot keys)")
    val hot = broadcast(hotKeys(big, keys, hotKeyMinCount))
    val bigHot = big.join(hot, keys, "left_semi")
    val bigCold = big.join(hot, keys, "left_anti")
    val smallHot = small.join(hot, keys, "left_semi")
    saltedJoin(bigHot, smallHot, keys, salt, joinType)
      .unionByName(bigCold.join(small, keys, joinType))
  }

  /** Salted two-phase aggregation: partial aggregate on (keys, salt), then
    * final aggregate on keys — caps any single reducer's input at
    * ~hotKeyCount/salt rows. Aggregations must be decomposable
    * (sum/count/min/max — pass partial and final expression builders). */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salt: Int)(
      partial: Seq[Column],
      finalAgg: Seq[Column]): DataFrame = {
    df.withColumn("__salt", saltCol(df.columns.map(col).toSeq, salt))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }
}
