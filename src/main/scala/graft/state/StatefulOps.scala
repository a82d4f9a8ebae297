package graft.state

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.aggregates.{Evidence, EvidenceMerge}
import graft.schema._

/** Stateful streaming operators (SURVEY §2.10 / §3).
  *
  * The reference coordinates concurrent writers with row locks, Redis
  * NX locks, and CAS updates (api/events.py:1139-1199,
  * verify_signal.py:102-189,479-530). Under Spark keyed state each key
  * has exactly ONE owner per micro-batch, so every lock/CAS collapses
  * into a pure state-transition function — the concurrency tests of the
  * reference become property tests on these functions.
  */
object StatefulOps {

  // ---------------------------------------------------------------
  // A1 — event upsert (reference api/events.py:916-1282)
  // ---------------------------------------------------------------

  /** Hard bound on per-key kept evidence. A hot event_key otherwise
    * accumulates state forever (SURVEY §7.4 risk 7) — the reference
    * bounds the same growth with its background compaction job
    * (api/events.py:1186-1191, worker/jobs/events_compact.py).
    */
  val MaxEvidencePerKey: Int = 256

  // ---------------------------------------------------------------
  // Event-time state TTLs. Per-key state is bounded (MaxEvidencePerKey)
  // but KEY COUNT is not — without expiry the state store grows without
  // limit at scale. Each wrapper sets an EventTimeTimeout at
  // last-event-time + TTL (TTL-from-last-write, exactly the reference's
  // Redis `setex` semantics), so an idle key is dropped once the
  // watermark passes its horizon and a later arrival re-enters fresh.
  // TTL values are the reference's own windows.
  // ---------------------------------------------------------------

  /** 14 d — dedup/event retention (x_kol_poll.py:110-111 `setex 14d`). */
  val EventTtlUs: Long = 14L * 24 * 3600 * 1000000L
  /** 14 d — signal replay horizon (terminal states absorb within it;
    * the durable signals table remains the permanent record, matching
    * the reference where Redis locks/cooldowns expire but PG keeps the
    * row — verify_signal.py:40-70).
    */
  val SignalTtlUs: Long = 14L * 24 * 3600 * 1000000L
  /** 1 h — card dedup window (api/cards/dedup.py:102 DEDUP_TTL_SEC). */
  val CardTtlUs: Long = 3600L * 1000000L
  /** 24 h — heat series retention (minute buckets are aggregated into
    * daily trend windows; reference Redis counters expire likewise).
    */
  val EmaTtlUs: Long = 24L * 3600 * 1000000L

  /** Arm the per-key event-time timeout: last event time + ttl, clamped
    * above the current watermark (Spark rejects a timeout at-or-before
    * the watermark; the clamp makes an already-expired horizon fire on
    * the next trigger instead of failing the batch).
    */
  private def armTimeout(state: GroupState[_], lastEventUs: Long,
      ttlUs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(lastEventUs / 1000L + ttlUs / 1000L,
        state.getCurrentWatermarkMs() + 1L))

  /** Pure per-key fold: merge new evidence into the running event row.
    * Deterministic regardless of within-batch arrival order: evidence
    * merge is commutative, `last/start` use min/max, and latest-wins
    * columns use EVENT time (max tsUs), not arrival order (SURVEY §7.4
    * risk 2).
    *
    * Eviction is deterministic and grouping-invariant: the kept set is
    * the `maxEvidence` SMALLEST elements under the total order
    * (ts, dedupKey) — earliest-ts representatives — so any micro-batch
    * partitioning of the same inputs converges to the same state.
    * `evidenceCount` keeps counting logically (kept + evicted);
    * `evidenceOverflow` = how many were evicted. One approximation,
    * documented: a dedupKey that re-arrives AFTER its item was evicted
    * is counted again (bounded state cannot remember evicted identities
    * — the reference's lock-timeout fallback path skips merging
    * entirely in the analogous hotspot case).
    */
  def upsertEvent(key: String, eventType: String,
      posts: Seq[(Evidence, Double)], prev: Option[EventRow],
      maxEvidence: Int = MaxEvidencePerKey): EventRow = {
    val sortedPosts = posts.sortBy { case (e, _) => (e.ts, EvidenceMerge.dedupKey(e)) }
    val prevKept = prev.map(p => p.evidence.map(e => EvidenceMerge.dedupKey(e) -> e).toMap)
      .getOrElse(Map.empty[String, Evidence])
    val mergedEv = sortedPosts.map(_._1).foldLeft(prevKept) { (acc, e) =>
      val k = EvidenceMerge.dedupKey(e)
      acc.updatedWith(k) {
        case Some(old) => Some(EvidenceMerge.mergeItems(old, e))
        case None      => Some(e)
      }
    }
    // logical count: previous logical total + genuinely-new keys
    val logicalCount = prev.map(_.evidenceCount).getOrElse(0) +
      (mergedEv.size - prevKept.size)
    // deterministic eviction under the (ts, dedupKey) total order
    val kept = mergedEv.toSeq
      .sortBy { case (k, e) => (e.ts, k) }
      .take(maxEvidence)
    val tsAll = mergedEv.values.map(_.ts)
    // start/last fold in prev explicitly: an evicted item's ts must not
    // be able to retract a previously-observed bound
    val startUs = (prev.map(_.startUs).toSeq ++ Seq(tsAll.min)).min
    val lastUs = (prev.map(_.lastUs).toSeq ++ Seq(tsAll.max)).max
    // total order (ts, value): a bare maxBy(ts) breaks ties by list
    // position, which depends on how arrivals were batched — replaying
    // the same data with different micro-batch boundaries would then
    // disagree on the winner
    val latestSentiment = (prev.map(p => (p.lastUs, p.lastSentimentScore)).toSeq ++
      sortedPosts.map { case (e, s) => (e.ts, s) }).max._2
    EventRow(
      eventKey = key,
      eventType = eventType,
      startUs = startUs,
      lastUs = lastUs,
      evidenceCount = logicalCount,
      evidence = kept.sortBy(_._1).map(_._2),
      lastSentimentScore = latestSentiment,
      version = prev.map(_.version + 1).getOrElse(1),
      evidenceOverflow = logicalCount - kept.size)
  }

  /** Named shape of the upsert input (tuple encoders are positional
    * and cannot carry the watermark helper column).
    */
  final case class UpsertInput(key: String, eventType: String,
      evidence: Evidence, sentiment: Double)

  /** Streaming wrapper: Dataset[(eventKey, eventType, Evidence,
    * sentiment)] → updated EventRow per key per trigger. State expires
    * [[EventTtlUs]] after the key's last evidence (event time); an
    * arrival after expiry re-enters as a fresh version-1 row.
    */
  def eventUpsertStream(ds: Dataset[(String, String, Evidence, Double)],
      lateness: String = "14 days", ttlUs: Long = EventTtlUs)
      : Dataset[EventRow] =
    eventUpsertStreamNamed(ds.toDF("key", "eventType", "evidence", "sentiment"),
      lateness, ttlUs)

  /** [[eventUpsertStream]] over named columns `key, eventType, evidence,
    * sentiment` (+ optionally an already-watermarked event-time column,
    * as produced by PostPipeline.toEvidence — in that case the upstream
    * watermark is reused instead of defining a second one, which Spark
    * disallows within a single chain).
    */
  def eventUpsertStreamNamed(named: org.apache.spark.sql.DataFrame,
      lateness: String = "14 days", ttlUs: Long = EventTtlUs)
      : Dataset[EventRow] = {
    val fn = (key: String, rows: Iterator[UpsertInput],
        state: GroupState[EventRow]) => {
      val batch = rows.toSeq
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else if (batch.isEmpty) Iterator.empty
      else {
        val updated = upsertEvent(key, batch.head.eventType,
          batch.map(r => (r.evidence, r.sentiment)), state.getOption)
        state.update(updated)
        armTimeout(state, updated.lastUs, ttlUs)
        Iterator.single(updated)
      }
    }
    val typed = named.as[UpsertInput](Encoders.product[UpsertInput])
    withEventTime(typed, col("evidence").getField("ts"), lateness)(
      Encoders.product[UpsertInput])
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[EventRow, EventRow](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(fn)(
        // product for STATE too: re-measured after the eviction bound
        // landed (round 4) — on ≤256-evidence rows the unsafe-row codec
        // beats kryo's generic Seq/Map serialization in both size and
        // per-batch round-trip time
        Encoders.product[EventRow], Encoders.product[EventRow])
  }

  /** Metadata key Spark stamps on a watermarked attribute. */
  private val WatermarkDelayKey = "spark.watermarkDelayMs"

  /** Attach an event-time watermark for EventTimeTimeout — unless the
    * input already carries one (redefining a watermark downstream of
    * another in the same chain is disallowed; PostPipeline's dedup
    * watermark flows through toEvidence for exactly this reason).
    *
    * The helper column must SURVIVE into the stateful operator's child
    * output: the streaming analyzer looks for a watermarked attribute
    * there, not for the EventTimeWatermark node. Case-class encoders
    * ignore the extra column; tuple inputs are re-shaped to case
    * classes by their wrappers first.
    */
  private def withEventTime[T](ds: Dataset[T],
      usCol: org.apache.spark.sql.Column, lateness: String)
      (implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    val df = ds.toDF()
    if (df.queryExecution.analyzed.output
        .exists(_.metadata.contains(WatermarkDelayKey))) ds
    else df
      .withColumn("__event_time", timestamp_micros(usCol))
      .withWatermark("__event_time", lateness)
      .as[T]
  }

  // ---------------------------------------------------------------
  // R4 — signal state machine (reference verify_signal.py:268-573)
  // ---------------------------------------------------------------

  final case class SignalState(state: String, sinceUs: Long,
      cooldownUntilUs: Long)

  val VerifyDelayUs: Long = 180L * 1000000L // 180 s delay gate
  val CooldownUs: Long = 45L * 1000000L     // 45 s per-key cooldown

  /** Pure transition: (current state, verdict) → (new state, emitted
    * transition). Mirrors the three-branch verify semantics: upgrade →
    * verified, downgrade → downgraded, insufficient → hold with
    * confidence 0; delay gate before any transition; cooldown between
    * attempts; terminal states absorb.
    */
  def transition(st: SignalState, in: VerdictInput)
      : (SignalState, Option[SignalTransition]) = {
    if (st.state != "candidate") (st, None) // terminal
    else if (in.tsUs < st.sinceUs + VerifyDelayUs) (st, None) // delay gate
    else if (in.tsUs < st.cooldownUntilUs) (st, None) // cooling down
    else in.verdict match {
      case "upgrade" =>
        val next = SignalState("verified", in.tsUs, 0L)
        (next, Some(SignalTransition(in.eventKey, "candidate", "verified",
          in.confidence, in.tsUs)))
      case "downgrade" =>
        val next = SignalState("downgraded", in.tsUs, 0L)
        (next, Some(SignalTransition(in.eventKey, "candidate", "downgraded",
          in.confidence, in.tsUs)))
      case "insufficient" =>
        (st.copy(cooldownUntilUs = in.tsUs + CooldownUs),
          Some(SignalTransition(in.eventKey, "candidate", "candidate", 0.0,
            in.tsUs)))
      case _ => // hold
        (st.copy(cooldownUntilUs = in.tsUs + CooldownUs), None)
    }
  }

  /** Streaming wrapper. New keys enter as candidates at first sight.
    * State expires [[SignalTtlUs]] after the last verdict — an expired
    * key's next verdict re-enters as a fresh candidate (the durable
    * signals sink keeps the historical record, as the reference's PG
    * row outlives its Redis locks/cooldowns).
    */
  def signalStream(ds: Dataset[VerdictInput],
      lateness: String = "0 seconds", ttlUs: Long = SignalTtlUs)
      : Dataset[SignalTransition] = {
    implicit val stateEnc = Encoders.product[SignalState]
    implicit val outEnc = Encoders.product[SignalTransition]
    withEventTime(ds, col("tsUs"), lateness)(ds.encoder)
      .groupByKey(_.eventKey)(Encoders.STRING)
      .flatMapGroupsWithState[SignalState, SignalTransition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[SignalState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(v => (v.tsUs, v.verdict))
            var st = state.getOption.getOrElse(
              SignalState("candidate", sorted.head.tsUs, 0L))
            val out = Seq.newBuilder[SignalTransition]
            sorted.foreach { in =>
              val (next, emitted) = transition(st, in)
              st = next
              emitted.foreach(out += _)
            }
            state.update(st)
            armTimeout(state, sorted.last.tsUs, ttlUs)
            out.result().iterator
          }
      }
  }

  // ---------------------------------------------------------------
  // D4 — card state-version dedup (reference api/cards/dedup.py:10-131)
  // ---------------------------------------------------------------

  def versionSig(c: CardVersion): String =
    s"${c.state}|${c.riskLevel}|degrade:${if (c.degrade) 1 else 0}"

  /** Version signature extended with the hit-rule hash (reference
    * api/cards/dedup.py:114-131): `_mr` + md5 of the SORTED
    * comma-joined rule ids, first 8 hex — order-insensitive, absent
    * when no rules hit, so an MR* set change re-emits the card.
    */
  def versionSigWithRules(base: String, hitRules: Seq[String]): String =
    if (hitRules.isEmpty) base
    else {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(hitRules.sorted.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      s"${base}_mr$h"
    }

  /** Emit a card only when its version signature changed since the
    * last emit for that key (S2 avatar-change detection is the same
    * pattern with sig = avatar hash).
    */
  def cardDedupStream(ds: Dataset[CardVersion],
      lateness: String = "0 seconds", ttlUs: Long = CardTtlUs)
      : Dataset[CardVersion] = {
    implicit val stateEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[CardVersion]
    withEventTime(ds, col("tsUs"), lateness)(ds.encoder)
      .groupByKey(_.eventKey)(Encoders.STRING)
      .flatMapGroupsWithState[String, CardVersion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[String]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var last = state.getOption.getOrElse("")
            val out = Seq.newBuilder[CardVersion]
            sorted.foreach { c =>
              val sig = versionSig(c)
              if (sig != last) { out += c; last = sig }
            }
            state.update(last)
            // 1 h dedup window from the last card emission/suppression
            // (reference DEDUP_TTL_SEC): after it, the same signature
            // re-emits — exactly the Redis-key-expired behavior
            armTimeout(state, sorted.last.tsUs, ttlUs)
            out.result().iterator
          }
      }
  }

  // ---------------------------------------------------------------
  // A3 — EMA smoothing (reference api/signals/heat.py:81-95)
  // ---------------------------------------------------------------

  /** Per-key EMA: ema = α·x + (1-α)·prev, seeded with the first value.
    * A series idle past [[EmaTtlUs]] drops its state and re-seeds on
    * the next sample.
    */
  /** Named shape of the EMA input (see [[UpsertInput]]). */
  final case class EmaInput(key: String, ts: Long, x: Double)

  def emaStream(ds: Dataset[(String, Long, Double)], alpha: Double,
      lateness: String = "0 seconds", ttlUs: Long = EmaTtlUs)
      : Dataset[(String, Long, Double)] = {
    implicit val stateEnc = Encoders.scalaDouble
    implicit val outEnc = Encoders.tuple(Encoders.STRING,
      Encoders.scalaLong, Encoders.scalaDouble)
    val named = ds.toDF("key", "ts", "x").as[EmaInput](Encoders.product[EmaInput])
    withEventTime(named, col("ts"), lateness)(Encoders.product[EmaInput])
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Double, (String, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[Double]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(_.ts)
            var prev = state.getOption
            val out = sorted.map { r =>
              val ema = prev match {
                case Some(p) => alpha * r.x + (1 - alpha) * p
                case None    => r.x
              }
              prev = Some(ema)
              (r.key, r.ts, ema)
            }
            prev.foreach(state.update)
            armTimeout(state, sorted.last.ts, ttlUs)
            out.iterator
          }
      }
  }
}

/** S7/S8 — outbox retry semantics (reference worker/jobs/outbox_retry
  * .py:17-289, outbox_dlq_recover.py:31-96) as pure row transitions,
  * applied inside `foreachBatch` against the outbox table.
  */
object OutboxRetry {

  val MaxAttempts = 20
  val MaxBackoffSec = 600L

  def backoffSec(attempt: Int): Long =
    math.min(math.pow(2.0, attempt).toLong, MaxBackoffSec)

  def isDue(e: OutboxEntry, nowUs: Long): Boolean =
    (e.status == "pending" || e.status == "retry") && e.nextTryUs <= nowUs

  /** One delivery attempt outcome applied to a row. */
  def step(e: OutboxEntry, success: Boolean, nowUs: Long,
      error: String = ""): OutboxEntry = {
    if (!isDue(e, nowUs)) e
    else if (success) e.copy(status = "done", updatedUs = nowUs)
    else {
      val attempt = e.attempt + 1
      if (attempt >= MaxAttempts)
        e.copy(status = "dlq", attempt = attempt, lastError = error,
          updatedUs = nowUs)
      else
        e.copy(status = "retry", attempt = attempt, lastError = error,
          nextTryUs = nowUs + backoffSec(attempt) * 1000000L,
          updatedUs = nowUs)
    }
  }

  /** DLQ recovery: age-gated move back to retry (S8). */
  def recover(e: OutboxEntry, nowUs: Long, minAgeUs: Long): OutboxEntry =
    if (e.status == "dlq" && nowUs - e.updatedUs >= minAgeUs)
      e.copy(status = "retry", attempt = 0, nextTryUs = nowUs,
        updatedUs = nowUs)
    else e
}
