package graft.rules

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicReference

import graft.rules.RulesConfig.RulesDoc

/** TTL-throttled hot-reloading rules holder — the Spark-driver analog
  * of the reference's `HotConfigRegistry` + `RuleLoader`
  * (api/config/hotreload.py:70-383, api/rules/eval_event.py:34-125):
  *
  *   - reload checks are throttled to one stat per `ttlMillis`
  *     (monotonic clock; reference min-1s TTL scan), `force` bypasses;
  *   - change detection is (mtime, size)-first — a pure cache hint:
  *     any difference in EITHER falls through to the content sha1, so
  *     a rewrite landing within the same millisecond still swaps as
  *     long as the byte count moved, and a touch without a byte change
  *     never does;
  *   - a REJECTED file version (oversize, overcount, parse failure) is
  *     remembered by its (mtime, size), so it is stat'd once and
  *     counted once in `rejected` — not re-read and re-counted on
  *     every TTL tick while it sits on disk;
  *   - the swap is atomic (single volatile reference) and LAST-GOOD:
  *     a file that fails size/count validation or YAML parsing leaves
  *     the previous doc serving, mirroring the reference returning
  *     `(None, "error")` while the registry keeps the old namespace;
  *   - versioning follows the reference: the doc's own `version` field
  *     when present, else the content sha1's 12-hex prefix
  *     (hotreload.py:266-277).
  *
  * Caps are the reference's safety limits (eval_event.py:22-24):
  * files over 256 KB and docs over 200 rules are rejected (last-good).
  *
  * Streaming integration needs NO broadcast machinery: rule conditions
  * compile to literal Catalyst columns, so each micro-batch that calls
  * [[current]] inside `foreachBatch` builds that batch's plan from the
  * freshly-resolved doc — the swap lands atomically on the next batch
  * boundary, which is exactly the reference's per-event registry
  * snapshot read. StreamingSpec drives a mid-stream swap end-to-end.
  */
final class HotRules(path: Path, ttlMillis: Long = 60000L,
    env: Map[String, String] = sys.env,
    nowNanos: () => Long = () => System.nanoTime()) {

  import HotRules.State

  private val state = new AtomicReference[Option[State]](None)
  @volatile private var lastCheckNanos: Long = Long.MinValue
  @volatile private var rejectedCount: Long = 0L
  // (mtime, size) of the last REJECTED file version — reject once per
  // distinct version, not once per TTL tick
  @volatile private var lastRejected: Option[(Long, Long)] = None

  reloadIfStale(force = true)

  /** Last-good doc (throttled reload check first). Throws only if the
    * file has NEVER parsed — matching the reference, which refuses to
    * serve without an initial load (hotreload.py:122).
    */
  def current(): RulesDoc = {
    reloadIfStale()
    state.get().getOrElse(throw new IllegalStateException(
      s"rules never loaded from $path")).doc
  }

  /** Version string of the serving doc (doc version, else sha1[0,12)). */
  def version(): String = state.get().map(_.version).getOrElse("error")

  /** Count of reload attempts rejected by validation (last-good kept). */
  def rejected: Long = rejectedCount

  /** Returns true iff this call swapped in a new doc. */
  def reloadIfStale(force: Boolean = false): Boolean = synchronized {
    val now = nowNanos()
    val due = force || lastCheckNanos == Long.MinValue ||
      now - lastCheckNanos >= ttlMillis * 1000000L
    if (!due) return false
    lastCheckNanos = now
    val prev = state.get()
    var statted: Option[(Long, Long)] = None
    def reject(): Boolean = {
      if (statted != lastRejected || statted.isEmpty) rejectedCount += 1
      lastRejected = statted
      false // last-good keeps serving
    }
    try {
      val mtime = Files.getLastModifiedTime(path).toMillis
      val size = Files.size(path)
      statted = Some((mtime, size))
      // (mtime, size) is a HINT only: a match with the serving or the
      // last-rejected version skips the read; any mismatch falls
      // through to the sha compare
      if (prev.exists(s => s.mtimeMillis == mtime && s.sizeBytes == size))
        return false
      if (lastRejected.contains((mtime, size))) return false
      if (size > HotRules.MaxFileBytes) return reject()
      val bytes = Files.readAllBytes(path)
      val sha = HotRules.sha1Hex(bytes)
      if (prev.exists(_.sha1 == sha)) { // touched, not changed
        state.set(prev.map(_.copy(mtimeMillis = mtime, sizeBytes = size)))
        return false
      }
      val doc = RulesConfig.parse(new String(bytes, StandardCharsets.UTF_8), env)
      if (doc.rules.size > HotRules.MaxRulesCount) return reject()
      val version = Option(doc.version).filter(_.nonEmpty).getOrElse(sha.take(12))
      state.set(Some(State(mtime, size, sha, doc, version)))
      lastRejected = None
      true
    } catch {
      case scala.util.control.NonFatal(_) => reject()
    }
  }
}

object HotRules {
  private final case class State(mtimeMillis: Long, sizeBytes: Long,
      sha1: String, doc: RulesDoc, version: String)

  /** Reference safety limits (eval_event.py:22-24). */
  val MaxFileBytes: Long = 262144L
  val MaxRulesCount: Int = 200

  private def sha1Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-1").digest(bytes)
      .map(b => f"$b%02x").mkString
}
