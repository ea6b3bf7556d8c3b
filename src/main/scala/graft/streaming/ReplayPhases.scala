package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Process-wide phase accumulator for streaming-replay benchmarks
  * (round 17, VERDICT r16 #1/#7): three driver records in a row showed
  * q138/q144 medians drifting upward on untouched code, and wall-time
  * alone could not say WHERE — so every replay's micro-batch progress
  * is split into named phases and emitted with the bench artifact,
  * making the next drift attributable from `bench/results.json` alone.
  *
  * Mechanics: a [[StreamingQueryListener]] attached to every replay
  * session (and the bench's main session — the versioned-table feed
  * replays stream on it directly) accumulates `durationMs` components
  * across ALL micro-batches into process-wide counters; the bench
  * snapshots the counters around each timed run and diffs. Phases:
  *
  *   - `trigger`  — Σ triggerExecution: everything a micro-batch does
  *     (offset resolution, WAL, planning, execution, commit log).
  *     `wall − trigger` is the replay's FLOOR: session setup, source
  *     fixture writes, query start/stop, gaps between batches.
  *   - `sink`     — Σ addBatch: batch execution INCLUDING the sink
  *     write (the physical plan runs inside it). State-store work
  *     happens inside its tasks; it is reported separately (below) as
  *     a task-summed quantity, NOT subtracted here — different clock
  *     domains (task time can exceed driver wall under parallelism).
  *   - `commit`   — Σ (walCommit + commitOffsets): offset-log +
  *     commit-log round trips, the checkpoint-I/O component.
  *   - `state`    — Σ state-store commit/update/removal times across
  *     all partitions and operators (task-summed; comparable round
  *     over round, not to wall).
  *   - `batches`  — micro-batch count (a drifting count means the
  *     source fixture or trigger behavior changed, not the operator).
  *
  * Listener events are delivered asynchronously; [[quiesce]] waits
  * until every started query's terminate event has drained so a
  * snapshot taken right after `awaitTermination` cannot miss the last
  * batch's progress. Zero overhead when [[enabled]] is false (the
  * default outside the bench): sessions get no listener attached. */
object ReplayPhases {
  @volatile var enabled = false

  private val trigger = new AtomicLong
  private val sink = new AtomicLong
  private val commit = new AtomicLong
  private val state = new AtomicLong
  private val batches = new AtomicLong
  private val started = new AtomicLong
  private val done = new AtomicLong

  // one listener per SparkSession (the StreamingQueryManager is
  // per-session); weak keys so short-lived replay sessions are not
  // pinned by the attachment registry
  private val attached = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private final class Collector extends StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit =
      started.incrementAndGet()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      def g(k: String): Long =
        Option(p.durationMs.get(k)).map(_.longValue()).getOrElse(0L)
      trigger.addAndGet(g("triggerExecution"))
      sink.addAndGet(g("addBatch"))
      commit.addAndGet(g("walCommit") + g("commitOffsets"))
      p.stateOperators.foreach(so => state.addAndGet(
        so.allUpdatesTimeMs + so.allRemovalsTimeMs + so.commitTimeMs))
      batches.incrementAndGet()
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      done.incrementAndGet()
  }

  /** Attach the collector to `s` (idempotent per session; no-op unless
    * [[enabled]]). Called by `EventsStreaming.replaySession` and by the
    * bench on its main session. */
  def attach(s: SparkSession): Unit =
    if (enabled &&
        attached.putIfAbsent(s, java.lang.Boolean.TRUE) == null)
      s.streams.addListener(new Collector)

  final case class Snap(trigger: Long, sink: Long, commit: Long,
      state: Long, batches: Long) {
    def -(o: Snap): Snap = Snap(trigger - o.trigger, sink - o.sink,
      commit - o.commit, state - o.state, batches - o.batches)
  }

  /** Wait (bounded) for the async listener bus to drain every
    * terminated query's events, then read the counters. */
  def snapshot(maxWaitMs: Long = 2000L): Snap = {
    val deadline = System.currentTimeMillis() + maxWaitMs
    while (started.get() != done.get() &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(10)
    Snap(trigger.get(), sink.get(), commit.get(), state.get(),
      batches.get())
  }
}
