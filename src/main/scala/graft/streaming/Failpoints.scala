package graft.streaming

/** Crash-injection points for the state tables' durability contracts.
  *
  * Every durable mutation inside [[AppendTable]] / [[BucketedTable]] /
  * [[SnapshotTable]] calls [[step]] immediately BEFORE performing the
  * mutation. In production nothing is armed and the call is a single
  * volatile read. Under test, arming the k-th step makes that mutation
  * (and everything after it) never happen — simulating a process kill
  * at every file-op boundary, which is exactly the matrix the tables'
  * crash contracts promise to survive: after ANY kill point, `read()`
  * must observe either the full pre-state or the full post-state, and
  * a replay of the same operation must converge to the post-state.
  * StateCrashSpec sweeps k over every point of every operation.
  *
  * Crash-AFTER-op-i is the same point as crash-BEFORE-op-i+1, and
  * crash after the final op is indistinguishable from completion, so
  * before-each-op points cover the whole boundary matrix.
  *
  * Driver-side only by design: the tables' own file ops all run on the
  * calling (driver) thread — Spark write ACTIONS block in it — so a
  * plain thread-local armed counter is race-free under parallel test
  * suites.
  */
object Failpoints {

  /** The injected kill. Extends Error, not Exception, so incidental
    * `catch NonFatal` blocks inside the code under test cannot
    * swallow the simulated crash.
    */
  final class Crash(val at: Int, val label: String)
      extends Error(s"injected crash at step $at ($label)")

  private val armedAt = new ThreadLocal[Int] {
    override def initialValue(): Int = 0 // 0 = disarmed
  }
  private val count = new ThreadLocal[Int] {
    override def initialValue(): Int = 0
  }

  /** Arm the k-th (1-based) durable mutation on this thread to crash. */
  def arm(k: Int): Unit = { require(k >= 1); armedAt.set(k); count.set(0) }

  def disarm(): Unit = { armedAt.set(0); count.set(0) }

  /** Steps observed since the last arm/disarm — lets a sweep detect
    * "armed past the end" (operation completed without crashing).
    */
  def observed: Int = count.get()

  private val hooks = new ThreadLocal[Map[String, () => Unit]] {
    override def initialValue(): Map[String, () => Unit] = Map.empty
  }

  /** Test-only interleaving hook: run `f` ONCE when the named step is
    * next reached (removed before invocation, so a competing table
    * operation inside `f` does not recurse). This is how the
    * concurrent-writer specs inject "another writer committed while
    * this operation was in flight" at an exact boundary.
    */
  def installHook(label: String)(f: => Unit): Unit =
    hooks.set(hooks.get + (label -> (() => f)))

  def clearHooks(): Unit = hooks.set(Map.empty)

  /** Called by the tables before each durable mutation. */
  private[streaming] def step(label: String): Unit = {
    hooks.get.get(label).foreach { f =>
      hooks.set(hooks.get - label)
      f()
    }
    val k = armedAt.get()
    if (k > 0) {
      val c = count.get() + 1
      count.set(c)
      if (c == k) throw new Crash(k, label)
    }
  }
}
