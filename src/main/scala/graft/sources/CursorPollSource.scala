package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 — cursor-based incremental poll source, as a native Structured
  * Streaming DataSource V2.
  *
  * The reference ingests social posts by POLLING an HTTP API per
  * followed handle, persisting a per-handle `since_id` cursor so each
  * poll fetches only newer posts (worker/jobs/x_kol_poll.py:187-299,
  * cursor load/store at :120-131). This source re-expresses that
  * contract in Spark's exactly-once offset model instead of a hand
  *-rolled cursor store:
  *
  *   - the "remote feed" is a directory per handle of append-only,
  *     sequence-named page files (the sandbox stand-in for the HTTP
  *     endpoint — pages arrive in order and are immutable, exactly
  *     like a paged `since_id` fetch);
  *   - the streaming [[Offset]] IS the cursor map `handle → pages
  *     consumed`. Spark checkpoints it in the offset log, so restart
  *     resumes every handle from its cursor with no duplicate and no
  *     loss — the reference needs Redis + idempotent upserts for the
  *     same guarantee;
  *   - each micro-batch advances every handle's cursor by at most
  *     `maxPagesPerHandlePerBatch` (default 16) — the poller's rate
  *     limiting (x_kol_poll.py batch cap) as admission control;
  *   - one [[InputPartition]] per handle per batch: handles poll in
  *     parallel across executors, and a hot handle never fans out of
  *     order (page order within a handle is the since_id contract).
  *
  * Page file format: one post per line,
  * `id TAB source TAB author TAB tokenCa TAB symbol TAB isCandidate
  * TAB sentimentScore TAB tsUs TAB text` — text is last so it may
  * contain anything but newline/TAB (the feed writer normalizes).
  * Empty tokenCa/symbol decode as null. The row schema matches
  * [[graft.schema.RawPost]] field-for-field, so
  * `.as[RawPost]` feeds [[graft.streaming.PostPipeline]] directly.
  *
  * Scale shape: `latestOffset` lists each handle directory (bounded:
  * handles are the followed-KOL set, thousands at most — the
  * reference stores them in a config table) and never reads page
  * bytes; page reads happen only inside partition readers, on
  * executors, for exactly the cursor delta. Nothing about the corpus
  * size touches the driver.
  */
object CursorPollSource {
  val ShortName = "graft-poll"

  /** Field-for-field the [[graft.schema.RawPost]] encoder schema. */
  val Schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("author", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tsUs", LongType, nullable = false),
    StructField("tokenCa", StringType, nullable = true),
    StructField("symbol", StringType, nullable = true),
    StructField("isCandidate", BooleanType, nullable = false),
    StructField("sentimentScore", DoubleType, nullable = false)))

  /** Cursor map offset. Serialized deterministically (sorted handles)
    * as `handle=count` lines so offset-log entries are stable and
    * diffable. Handle names are directory names; the feed writer keeps
    * them in `[A-Za-z0-9_\-\.]` (no `=` or newline).
    */
  final case class CursorOffset(cursors: Map[String, Int]) extends Offset {
    override def json(): String =
      cursors.toSeq.sorted.map { case (h, c) => s"$h=$c" }.mkString("\n")
  }

  object CursorOffset {
    def parse(s: String): CursorOffset = CursorOffset(
      s.split("\n").iterator.filter(_.nonEmpty).map { line =>
        val i = line.lastIndexOf('=')
        require(i > 0, s"bad cursor line: $line")
        line.substring(0, i) -> line.substring(i + 1).toInt
      }.toMap)
  }

  /** The page files of one handle, in cursor order. */
  def pagesOf(root: String, handle: String): Seq[String] = {
    val d = new java.io.File(root, handle)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.getName).sorted.toSeq
  }

  def handlesOf(root: String): Seq[String] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  /** Instrumentation: the wall-clock at which each end offset was
    * ADMITTED (decided in `latestOffset`) — the per-event ingest
    * timestamp of every row in that offset's micro-batch. StreamBench
    * joins this against the durable-commit wall-clock to report TRUE
    * per-event ingest→commit latency (the reference's published
    * contract) instead of a batch-duration proxy. Bounded map, driver
    * side only; the measurement path is outside every gate plan.
    */
  private val AdmissionCap = 100000

  /** Insertion-order LRU: when the cap is hit, only the OLDEST stamp
    * is dropped — the offset most likely already committed and
    * measured. The previous clear-the-whole-map overflow behavior
    * dropped stamps for offsets whose batches had NOT yet committed
    * (round-10 advice), silently degrading those batches to the
    * batch-duration fallback while the artifact still claimed the
    * per-row method; consumers now count fallback batches explicitly
    * (StreamBench `latency_fallback_batches`) so any residual
    * degradation is visible, not claimed away.
    */
  private val admissionUs = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Long](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Long]): Boolean =
        size() > AdmissionCap
    })

  /** First-production wins: once the feed drains, every subsequent
    * trigger re-produces the SAME (unchanged) end offset — re-stamping
    * it would post-date admission past the batch's own commit.
    */
  private[sources] def recordAdmission(offsetJson: String): Unit =
    admissionUs.putIfAbsent(offsetJson, System.currentTimeMillis() * 1000L)

  def admissionTimeUs(offsetJson: String): Option[Long] =
    Option(admissionUs.get(offsetJson))

  /** Start a fresh measurement window (a new bench run re-plays the
    * same cursor sequence; stale stamps must not serve it). */
  def resetAdmissions(): Unit = admissionUs.clear()
}

/** `spark.readStream.format("graft-poll").option("path", root)` (the
  * short name registers via META-INF/services, as public file sources
  * do).
  */
class CursorPollProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = CursorPollSource.ShortName
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CursorPollSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new CursorPollTable(opts.get("path"),
      opts.getInt("maxPagesPerHandlePerBatch", 16))
  }
}

class CursorPollTable(root: String, maxPagesPerBatch: Int)
    extends Table with SupportsRead {
  require(root != null, "graft-poll requires .option(\"path\", feedRoot)")
  override def name(): String = s"graft-poll($root)"
  override def schema(): StructType = CursorPollSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = CursorPollSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new CursorPollStream(root, maxPagesPerBatch)
    }
}

class CursorPollStream(root: String, maxPagesPerBatch: Int)
    extends MicroBatchStream with SupportsAdmissionControl {
  import CursorPollSource._

  /** No checkpoint yet → every handle starts from page 0 (the
    * reference's first-poll backfill, x_kol_poll.py:205-214). */
  override def initialOffset(): Offset = CursorOffset(Map.empty)

  /** Advance each handle's cursor from the CURRENT start toward its
    * available page count, capped per batch — the poll rate limit as
    * admission control (correct across restarts: `start` is the
    * checkpointed cursor map, never a guess held in memory). Listing
    * only; no page bytes are read on the driver.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CursorOffset].cursors
    val off = CursorOffset(handlesOf(root).map { h =>
      val have = pagesOf(root, h).size
      h -> math.min(have, from.getOrElse(h, 0) + maxPagesPerBatch)
    }.toMap)
    recordAdmission(off.json())
    off
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit)")

  override def deserializeOffset(json: String): Offset = CursorOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CursorOffset].cursors
    val e = end.asInstanceOf[CursorOffset].cursors
    e.toSeq.sorted.flatMap { case (h, to) =>
      val from = s.getOrElse(h, 0)
      if (to > from)
        Some(CursorPollPartition(root, h,
          pagesOf(root, h).slice(from, to).toArray): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new CursorPollReader(p.asInstanceOf[CursorPollPartition])
    }

  /** The feed is durable and immutable — nothing to acknowledge (the
    * reference's cursor store write IS our offset-log commit). */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** One handle's cursor delta: the page files to read this batch. */
final case class CursorPollPartition(root: String, handle: String,
    pages: Array[String]) extends InputPartition

class CursorPollReader(p: CursorPollPartition)
    extends PartitionReader[InternalRow] {
  private val lines: Iterator[String] = p.pages.iterator.flatMap { page =>
    val src = scala.io.Source.fromFile(
      new java.io.File(new java.io.File(p.root, p.handle), page), "UTF-8")
    try src.getLines().toVector finally src.close()
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (!lines.hasNext) return false
    val f = lines.next().split("\t", 9)
    require(f.length == 9, s"graft-poll: bad page line in ${p.handle}: ${f.length} fields")
    def str(s: String): UTF8String =
      if (s.isEmpty) null else UTF8String.fromString(s)
    row = InternalRow(
      str(f(0)), str(f(1)), str(f(2)), str(f(8)),
      f(7).toLong, str(f(3)), str(f(4)),
      f(5).toBoolean, f(6).toDouble)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
