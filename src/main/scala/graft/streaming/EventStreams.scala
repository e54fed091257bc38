package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the stream-shaped `events` table.
  *
  * The reference is batch-only (its SCAN cursor is bounded —
  * /root/reference/src/redduck_extension.cpp:209-217), so this module is
  * the engine's beyond-parity streaming capability: the same transforms
  * users run in batch (`q32_events_hourly`) expressed as an unbounded
  * `readStream` pipeline with watermarks, plus arbitrary keyed state via
  * `mapGroupsWithState`.
  *
  * Scale notes: windowed aggregation state is partitioned by (window,
  * key) across the cluster; the watermark bounds state size. The
  * sessionizer keys state by user — skewed users are one hot key each,
  * bounded by their own event rate, and state eviction ties to the
  * processing-time timeout.
  */
object EventStreams {

  final case class Evt(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class UserTotal(user_id: Long, n_events: Long, sum_value: Double)

  /** Tumbling-window counts with a watermark — streaming twin of
    * `q32_events_hourly`. Emits (hour_start, event_type, n, sum_value).
    */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window rates (1h window, 15m slide) — the overlapping-window
    * variant.
    */
  def slidingTypeRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming exact dedup: first occurrence per content fingerprint wins,
    * duplicates arriving later are dropped. The watermark bounds the
    * dedup state — a duplicate arriving more than `horizon` after its
    * original MAY pass (state already evicted), which is the standard
    * bounded-state contract of `dropDuplicates` on streams. The
    * fingerprint is the md5 of normalized content (same key as the batch
    * `exactDedup`), so batch backfills and the stream agree on identity.
    */
  def streamingDedup(events: DataFrame, contentCols: Seq[String],
      horizon: String = "1 hour"): DataFrame =
    events
      .withColumn("__fp", graft.operators.DedupOps.rowFingerprint(contentCols.map(col)))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming dedup against the PERSISTED batch ledger
    * ([[graft.operators.DedupOps.writeLedger]]): rows whose fingerprint
    * was admitted to the batch corpus drop via a stream-static LEFT
    * ANTI join; rows duplicated WITHIN the stream then dedup through
    * the watermarked state exactly like [[streamingDedup]]. Both
    * regimes key on the same `rowFingerprint` as batch `exactDedup` —
    * the batch backfill, the ledger and the stream agree on identity
    * byte for byte.
    *
    * Snapshot semantics: the ledger's FILE LISTING is captured when the
    * stream is defined (parquet's InMemoryFileIndex) — files appended
    * by a later `appendToLedger` are NOT picked up mid-stream. That is
    * the right contract for the intended topology (the ledger holds
    * what was admitted BEFORE the stream started; in-flight duplicates
    * are the watermarked state's job); a long-lived stream adopts a
    * grown ledger by restarting from its checkpoint.
    */
  def streamingDedupAgainstLedger(events: DataFrame, contentCols: Seq[String],
      ledgerPath: String, horizon: String = "1 hour"): DataFrame = {
    // read through LedgerGuard like every batch consumer: a raw
    // recursive parquet read of a MANIFEST-mode ledger would ingest
    // the retired generation alongside the current one (keep-2
    // retention) — digests a forget already purged would keep
    // anti-join-dropping re-admittable rows — and a plain ledger read
    // during a writer's swap window would miss the staging fallback
    val ledger = graft.operators.LedgerGuard
      .readLedger(events.sparkSession, ledgerPath)
      .select(col("digest").as("__fp"))
    events
      .withColumn("__fp", graft.operators.DedupOps.rowFingerprint(contentCols.map(col)))
      .join(ledger, Seq("__fp"), "left_anti")
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }

  /** Stream-stream interval join: each purchase joins the same user's
    * clicks from the preceding hour. Both sides carry watermarks and the
    * join predicate bounds event time on both sides, which is what lets
    * Spark EVICT buffered rows once the watermark passes the bound —
    * join state stays O(users × 1h of events), not O(stream). At scale
    * both sides hash-partition on user_id, so the match is local to a
    * state-store partition.
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
        col("p_user") === col("user_id") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
          col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** Arbitrary keyed state: cumulative per-user totals via
    * `mapGroupsWithState` (update mode). The state survives across
    * micro-batches; at 100 TB/day the state store is RocksDB-backed and
    * partitioned by user hash.
    */
  def runningUserTotals(events: Dataset[Evt]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Evt], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          batch.foreach { e => n += 1; s += e.value }
          val next = UserTotal(userId, n, s)
          state.update(next)
          next
      }
  }

  /** Gap-based sessionization via flatMapGroupsWithState: closes a
    * session when `gapMinutes` of EVENT time passes without events for
    * the user. Cross-batch LATE events (the per-batch sort can't order
    * across triggers) merge into the open session with MONOTONE bounds
    * — start only moves earlier, end only later — rather than
    * regressing `session_end` below `session_start`.
    *
    * `closeIdleSessions = true` additionally registers a
    * PROCESSING-TIME timeout of the same gap: a user who simply goes
    * away gets their final session FLUSHED and their state REMOVED —
    * without it the last session per user is never emitted and per-key
    * state lives for the query's lifetime (the unbounded-state trap).
    * It is opt-in because registered processing-time timeouts make the
    * micro-batch engine run CONTINUOUS batches under the default
    * trigger to evaluate them — a production query sets a trigger
    * interval anyway; a drive-to-quiescence test harness
    * (`processAllAvailable`) would spin forever.
    */
  final case class SessionAcc(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  def sessionize(events: Dataset[Evt], gapMinutes: Int,
      closeIdleSessions: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    val timeoutMode =
      if (closeIdleSessions) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append, timeoutMode) {
        (userId: Long, batch: Iterator[Evt], state: GroupState[SessionAcc]) =>
          def toSession(a: SessionAcc): Session =
            Session(userId, new java.sql.Timestamp(a.start),
              new java.sql.Timestamp(a.last), a.n)
          if (closeIdleSessions && state.hasTimedOut) {
            // no events for a gap of processing time: flush the open
            // session and RELEASE the key's state
            val out = state.getOption.map(toSession).iterator
            state.remove()
            out
          } else {
            // within one micro-batch events arrive unordered: sort locally
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[Session]
            var acc = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              acc match {
                case Some(a) if t - a.last <= gapMs =>
                  // monotone bounds: a late straggler (t below start —
                  // possible only across batches) widens the session
                  // backward, never drags session_end below start
                  acc = Some(SessionAcc(math.min(a.start, t),
                    math.max(a.last, t), a.n + 1))
                case Some(a) =>
                  closed += toSession(a)
                  acc = Some(SessionAcc(t, t, 1))
                case None =>
                  acc = Some(SessionAcc(t, t, 1))
              }
            }
            acc.foreach { a =>
              state.update(a)
              // setTimeoutDuration requires a positive duration
              if (closeIdleSessions) state.setTimeoutDuration(math.max(gapMs, 1L))
            }
            closed.result().iterator
          }
      }
  }
}
