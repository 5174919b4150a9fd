package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key running totals via `transformWithState` — Spark 4's
  * arbitrary-state API (the successor to flatMapGroupsWithState, backed by
  * the RocksDB state store): one ValueState row per user carries (n, Σ),
  * each micro-batch folds its input in and emits the CUMULATIVE totals.
  *
  * The emission history is therefore the state's audit trail: a key emits
  * once per batch it has input, with totals over everything seen so far —
  * which a batch engine replays exactly from the same batch split (q225's
  * oracle: slice-1 totals for keys with slice-1 input, full totals for keys
  * with slice-2 input). Sums are pre-scaled integers, so cross-batch
  * accumulation is exact — no float drift across checkpointed state.
  */
class RunningTotals
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var state: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long)]("totals",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val prev = if (state.exists()) state.get() else (0L, 0L)
    var n = prev._1
    var sum = prev._2
    rows.foreach { r => n += 1L; sum += r._2 }
    state.update((n, sum))
    Iterator.single((key, n, sum))
  }
}

/** ListState companion to [[RunningTotals]]: each user's LAST-3 events by
  * (event time, id) — the bounded recency buffer behind "recently viewed"
  * features. Micro-batch input order is arbitrary, so the processor sorts
  * the batch and merges it with the (already-sorted) stored tail before
  * trimming — the state is a deterministic function of the data, never of
  * shuffle order. Emits the tail as a comma string after every batch with
  * input.
  */
class RecentEvents
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, String)] {

  @transient private var recent: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[(Long, Long)]("recent",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, String)] = {
    val merged = (recent.get().toArray ++ rows.map(r => (r._2, r._3)))
      .sortBy(identity).takeRight(3)
    recent.put(merged)
    Iterator.single((key, merged.map(_._2).mkString(",")))
  }
}

/** Timer-driven session close — the third transformWithState facet (q225:
  * ValueState, q226: ListState, here: EVENT-TIME TIMERS): a user's session
  * stays open in state while events arrive; an event-time timer at
  * last_event + 30 min is re-armed on every event (the previous timer
  * deleted — two live timers would double-emit), and when the WATERMARK
  * passes it, [[handleExpiredTimer]] emits the closed session and clears
  * state. Emission is therefore driven by watermark progression across
  * micro-batches — the contract q227's fixture pins batch by batch.
  */
class SessionTimeout extends StatefulProcessor[Long,
    (Long, java.sql.Timestamp), (Long, Long)] {

  private val TimeoutMs = 30L * 60L * 1000L
  // (n_events, last_event_ms, armed_timer_ms)
  @transient private var session: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    session = getHandle.getValueState[(Long, Long, Long)]("session",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val ts = rows.map(_._2.getTime).toArray
    java.util.Arrays.sort(ts)
    val prev = if (session.exists()) Some(session.get()) else None
    val n0 = prev.map(_._1).getOrElse(0L)
    prev.filter(_._3 > 0L).foreach(p => getHandle.deleteTimer(p._3))
    // A later micro-batch can deliver only LATE events (older than the
    // stored last_event but still inside the watermark); the session close
    // stays anchored at the true max event time, never re-armed earlier.
    val last = math.max(prev.map(_._2).getOrElse(Long.MinValue), ts.last)
    val timer = last + TimeoutMs
    getHandle.registerTimer(timer)
    session.update((n0 + ts.length, last, timer))
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long)] = {
    val out = if (session.exists()) {
      val s = session.get()
      session.clear()
      Iterator.single((key, s._1))
    } else Iterator.empty
    out
  }
}

/** Streaming Misra–Gries heavy hitters per key (q299) — BOUNDED sub-keyed
  * state where [[TypeCounts]] is unbounded: at most `k` counters per user
  * no matter how many distinct event types the stream carries, which is the
  * difference between O(keys·k) and O(keys·types) state at 100 TB.
  *
  * Classic summary (Misra & Gries 1982): an arriving item increments its
  * counter if tracked, claims a free slot at 1 if any, else EVERY counter
  * decrements by one (zeros evicted). Guarantees hold under ANY processing
  * order and any batch split — est ≤ true count, est ≥ true − n/(k+1), and
  * every item with true count > n/(k+1) is tracked — so the oracle-visible
  * surface (q299's verdict rows over exactly-counted heavy types) is
  * deterministic even though the sketch's internal tie-breaking is not.
  * Emits (user, n_seen_total, "type:est,…" sorted) per batch; n_seen makes
  * the LAST snapshot per user identifiable relationally.
  */
class HeavyHitters(k: Int)
    extends StatefulProcessor[Long, (Long, String), (Long, Long, String)] {

  @transient private var counters: MapState[String, Long] = _
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counters = getHandle.getMapState[String, Long]("mg",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    seen = getHandle.getValueState[Long]("seen",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, Long, String)] = {
    var n = if (seen.exists()) seen.get() else 0L
    rows.foreach { r =>
      val t = r._2
      n += 1L
      if (counters.containsKey(t)) {
        counters.updateValue(t, counters.getValue(t) + 1L)
      } else {
        val entries = counters.iterator().toArray
        if (entries.length < k) {
          counters.updateValue(t, 1L)
        } else {
          // full: decrement all, evict zeros, drop the arrival
          entries.foreach { kv =>
            if (kv._2 <= 1L) counters.removeKey(kv._1)
            else counters.updateValue(kv._1, kv._2 - 1L)
          }
        }
      }
    }
    seen.update(n)
    val snapshot = counters.iterator().map(kv => (kv._1, kv._2)).toArray
      .sortBy(_._1).map { case (t, c) => s"$t:$c" }.mkString(",")
    Iterator.single((key, n, snapshot))
  }
}

/** MapState facet (q225: ValueState, q226: ListState, q227: timers): a
  * per-user map of event_type → running count, updated key-wise per batch
  * and emitted as a canonical "type:count" string sorted by type — the
  * per-key sub-keyed state shape (feature counters per entity) that a
  * ValueState-of-map would rewrite wholesale on every update, while
  * MapState touches only the sub-keys the batch contains.
  */
class TypeCounts
    extends StatefulProcessor[Long, (Long, String), (Long, String)] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, String)] = {
    rows.foreach { r =>
      val t = r._2
      val prev = if (counts.containsKey(t)) counts.getValue(t) else 0L
      counts.updateValue(t, prev + 1L)
    }
    val snapshot = counts.iterator().map(kv => (kv._1, kv._2)).toArray
      .sortBy(_._1).map { case (t, n) => s"$t:$n" }.mkString(",")
    Iterator.single((key, snapshot))
  }
}
