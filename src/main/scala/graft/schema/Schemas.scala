package graft.schema

import graft.aggregates.Evidence

/** Typed row models for the stateful/streaming operators (SURVEY §1.4).
  * Timestamps are epoch MICROSECONDS (`*_us`) — Spark TimestampType
  * precision — so state survives engine round-trips losslessly.
  */

/** Normalized social post (reference raw_posts, api/models.py:22-36). */
final case class RawPost(
    id: String,
    source: String,
    author: String,
    text: String,
    tsUs: Long,
    tokenCa: Option[String],
    symbol: Option[String],
    isCandidate: Boolean,
    sentimentScore: Double)

/** Aggregated event row (reference events, api/models.py:39-51).
  * `evidenceCount` is the LOGICAL count (every distinct evidence ever
  * merged); `evidence` holds at most `StatefulOps.MaxEvidencePerKey`
  * earliest-ts representatives, and `evidenceOverflow` counts the
  * evicted remainder (reference bounds evidence via the background
  * compaction job enqueued at api/events.py:1186-1191).
  */
final case class EventRow(
    eventKey: String,
    eventType: String,
    startUs: Long,
    lastUs: Long,
    evidenceCount: Int,
    evidence: Seq[Evidence],
    lastSentimentScore: Double,
    version: Int,
    evidenceOverflow: Int = 0)

/** Signal state-machine input: one verification attempt result
  * (reference worker/jobs/onchain/verify_signal.py:268-573).
  */
final case class VerdictInput(
    eventKey: String,
    verdict: String, // upgrade | downgrade | hold | insufficient
    confidence: Double,
    tsUs: Long)

/** Emitted state transition (reference signal_events audit rows). */
final case class SignalTransition(
    eventKey: String,
    fromState: String,
    toState: String,
    confidence: Double,
    tsUs: Long)

/** Card identity for state-version dedup (reference api/cards/dedup.py). */
final case class CardVersion(
    eventKey: String,
    state: String,
    riskLevel: String,
    degrade: Boolean,
    tsUs: Long)

/** Outbox row (reference push_outbox, DATABASE.md:525-559). */
final case class OutboxEntry(
    id: Long,
    eventKey: String,
    payloadJson: String,
    status: String, // pending | retry | done | dlq
    attempt: Int,
    nextTryUs: Long,
    lastError: String,
    createdUs: Long,
    updatedUs: Long)
