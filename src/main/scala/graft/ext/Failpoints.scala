package graft.ext

/** One-shot crash injection for the persisted-index replay-contract specs:
  * a spec arms a named point, the next hit throws once and disarms. The
  * points sit in the crash windows the ingest contract defends — between
  * the ingest-token append and the store append(s) — so a test can kill an
  * ingest exactly there and replay it through the real foreachBatch.
  *
  * Per-INSTANCE (a field on each index), so parallel suites sharing the
  * JVM cannot interfere; the production path pays a `contains` on an empty
  * set per ingest, nothing more.
  */
private[graft] final class Failpoints {
  @volatile private var armed: Set[String] = Set.empty

  def arm(point: String): Unit = synchronized { armed += point }

  /** Throw once if `point` is armed, disarming it (so the replay attempt
    * that follows the injected crash runs through). */
  def hit(point: String): Unit = synchronized {
    if (armed.contains(point)) {
      armed -= point
      throw new IllegalStateException(s"injected crash at failpoint '$point'")
    }
  }
}
