package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with the same key and `rightTs < leftTs` (strict) — the time-series join
  * Spark lacks as a built-in.
  *
  * Implementation is the union-interleave pattern, NOT a theta join: tag
  * both sides, union, sort within each key by (ts, side), and carry the
  * last-seen right payload forward with `last(ignoreNulls) over rows
  * unbounded preceding`. One shuffle on the key, O(n log n) — survives
  * 100 TB where a `l.key = r.key AND r.ts < l.ts` theta join would
  * degenerate into a per-key cross product.
  */
object AsOf {

  /** @param left       rows to annotate
    * @param right      lookup side
    * @param keyCols    equality keys present on both sides
    * @param leftTs     event-time column name on `left`
    * @param rightTs    event-time column name on `right`
    * @param rightCols  right payload columns to attach (null when no match)
    * @param rightTieBreak column ordering right rows at identical ts
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // The right payload travels as ONE struct so the match is row-atomic:
    // carrying each column separately with last(ignoreNulls) would let a
    // null in one payload column fall back to an OLDER right row's value,
    // mixing columns from different right rows.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0))
      .withColumn("__tie", lit(null).cast(right.schema(rightTieBreak).dataType))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__tie")) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rTagged = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", col(rightTieBreak))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__tie")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)

    // right rows must be visible to later left rows: order (ts, side desc?)
    // Strict `<`: a left row at ts T must NOT see right rows at ts == T, so
    // within equal ts, left(0) sorts BEFORE right(1) => ascending side works
    // with lookback window ending at the current row.
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(
        (keyCols.map(col) ++
          leftCols.filterNot(keyCols.contains).map(col) ++
          rightCols.map(c => col(s"__last.$c").as(s"asof_$c"))): _*)
  }
}
