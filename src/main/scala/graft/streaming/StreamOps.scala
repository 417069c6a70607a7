package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured-Streaming operator surface beyond the reference's
  * run-to-drain pipelines (the reference uses no watermarks/windows/state —
  * SURVEY.md §2.B "Streaming semantics" — but a complete engine exposes
  * them): event-time windowed aggregation, session windows, and custom
  * keyed state via flatMapGroupsWithState.
  *
  * All helpers work identically on batch DataFrames (Spark unifies the
  * plans), which is how the specs drive them deterministically.
  */
object StreamOps {

  /** Tumbling/sliding event-time counts with a watermark bounding state. */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLength: String,
      slide: Option[String] = None,
      watermark: String = "10 minutes",
      valueCol: String = "value"): DataFrame = {
    require(events.columns.contains(valueCol),
      s"windowedAgg sums '$valueCol' (valueCol) — the frame has " +
        s"[${events.columns.mkString(", ")}]")
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val win = slide match {
      case Some(s) => window(col(tsCol), windowLength, s)
      case None    => window(col(tsCol), windowLength)
    }
    withWm.groupBy(win, col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col(keyCol), col("n"), col("total_value"))
  }

  /** Session windows: activity grouped per key with a gap timeout. */
  def sessionize(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    withWm.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), min(tsCol).as("first_event"), max(tsCol).as("last_event"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"), col("first_event"), col("last_event"))
  }

  /** Streaming deduplication bounded by event time: duplicates of an id
    * arriving within the watermark horizon are dropped, and state for ids
    * older than the watermark is evicted — the unbounded-state trap of a
    * naive `dropDuplicates` on an infinite stream. Batch frames fall back
    * to plain `dropDuplicates` (same result on finite data). */
  def dedupWithinWatermark(
      events: DataFrame,
      idCols: Seq[String],
      tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)

  /** Stream-stream event-time interval join (the impressions⨝clicks
    * shape): right rows must land in [left.ts, left.ts + `within`].
    * Both sides carry watermarks so the join state is bounded — Spark
    * evicts buffered rows once they can no longer match. Works identically
    * on batch frames (the time condition is just a filter there). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      within: String,
      watermark: String = "10 minutes"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark(leftTs, watermark) else left).as("l")
    val r = (if (right.isStreaming) right.withWatermark(rightTs, watermark) else right).as("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"))
  }

  // ------------------------------------------------- custom keyed state

  case class KeyedEvent(key: Long, ts: java.sql.Timestamp, value: Double)
  case class RunningState(n: Long, total: Double)
  case class RunningOutput(key: Long, n: Long, total: Double)

  /** Per-key running aggregate on the CURRENT arbitrary-state API
    * (`transformWithState` + [[StatefulProcessor]] with typed
    * [[ValueState]], Spark 4.x) — the successor to
    * `flatMapGroupsWithState`: composable named state variables, timers,
    * TTL, and the RocksDB state store underneath. Kept alongside the
    * legacy surface below so both generations are exercised. */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, KeyedEvent, RunningOutput] {
    @transient private var state: ValueState[RunningState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunningState]("running",
        Encoders.product[RunningState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[RunningOutput] = {
      val prev = if (state.exists()) state.get() else RunningState(0L, 0.0)
      var n = prev.n
      var total = prev.total
      rows.foreach { e => n += 1; total += e.value }
      state.update(RunningState(n, total))
      Iterator.single(RunningOutput(key, n, total))
    }
  }

  /** `runningTotals` on the transformWithState API. Requires the RocksDB
    * state store provider (set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider` on the session). */
  def runningTotalsTws(events: Dataset[KeyedEvent]): Dataset[RunningOutput] = {
    implicit val outEnc: Encoder[RunningOutput] = Encoders.product[RunningOutput]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.key)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Per-key running aggregate with explicit state — the
    * `flatMapGroupsWithState` surface (custom state the reference keeps in
    * Delta via foreachBatch instead; exposed natively here). `idleTimeout`
    * (a duration, e.g. "30 minutes") evicts a key's state after that much
    * processing time without new events — the unbounded-state guard for
    * high-cardinality key spaces; the key's final totals are emitted once
    * at eviction. None = state lives for the query's lifetime. */
  def runningTotals(events: Dataset[KeyedEvent],
      idleTimeout: Option[String] = None): Dataset[RunningOutput] = {
    implicit val outEnc: Encoder[RunningOutput] = Encoders.product[RunningOutput]
    implicit val stateEnc: Encoder[RunningState] = Encoders.product[RunningState]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    val timeout =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.key)
      .flatMapGroupsWithState[RunningState, RunningOutput](
        OutputMode.Append(), timeout) {
        (key: Long, rows: Iterator[KeyedEvent], state: GroupState[RunningState]) =>
          if (state.hasTimedOut) {
            // idle eviction: flush the final totals, then drop the state
            val fin = state.getOption.getOrElse(RunningState(0L, 0.0))
            state.remove()
            Iterator(RunningOutput(key, fin.n, fin.total))
          } else {
            val prev = state.getOption.getOrElse(RunningState(0L, 0.0))
            var n = prev.n
            var total = prev.total
            rows.foreach { e => n += 1; total += e.value }
            state.update(RunningState(n, total))
            // re-armed on every batch that sees the key, so only true
            // idleness expires it
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator(RunningOutput(key, n, total))
          }
      }
  }
}
