package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.AppendTable

/** Zone-map rehearsal (round 13, L77 at log scale): builds a long
  * event log — many committed batches, each covering a disjoint
  * time slice, the shape a streaming ingest leaves on disk — and
  * measures what the zones buy: a narrow time-window read opens a
  * handful of directories instead of the whole log. Claims are
  * `require`d in-run:
  *
  *   1. the range read returns EXACTLY the rows the residual filter
  *      admits from a full scan (zones are an optimization, never a
  *      correctness input);
  *   2. the pruned read opens ≤ the overlapping directory count
  *      while the full scan unions every one;
  *   3. the measured wall-clock ratio is reported (and must beat 2×
  *      on the narrow window — conservative; the directory ratio is
  *      the scale-invariant number).
  *
  * 100 TB shape: the dir-open ratio IS the cost model — parquet
  * footer reads and task scheduling scale with directories opened,
  * so a 3/60 open ratio on this box is the same 3/60 on a log 1000×
  * wider; wall-clock here under-reports the win because local reads
  * amortize driver overheads a cluster pays per file.
  */
object ZoneRehearsal {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = 60
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files
      .createTempDirectory("zone_rehearsal").toString
    val t0 = System.nanoTime()

    // one batch per disjoint time slice over a 20×-documents feed
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val rep = 20
    val feed = base.select(
      explode(sequence(lit(0), lit(rep - 1))).as("r"),
      col("doc_id"), col("n_chars"))
      .select((col("doc_id") * rep + col("r")).as("ts"), col("n_chars"))
      .localCheckpoint()
    val n = feed.count()
    val slice = n / nBatches + 1
    val t = new AppendTable(spark, s"$root/log", statsCol = Some("ts"))
    for (b <- 0 until nBatches)
      t.append(feed.filter(col("ts") >= b * slice &&
        col("ts") < (b + 1) * slice), b.toLong)
    println(s"[zone] log: $n rows in $nBatches committed dirs")

    // the narrow window: strictly inside three consecutive batches
    val lo = 10L * slice + slice / 2
    val hi = 12L * slice + slice / 2
    def timeIt[A](f: => A): (A, Double) = {
      val s0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - s0) / 1e9)
    }
    // warm both paths once (JVM/codegen), then measure
    t.read().get.filter(col("ts").between(lo, hi)).count()
    t.readRange(lo, hi).get.count()
    val (fullRows, fullS) = timeIt(
      t.read().get.filter(col("ts").between(lo, hi))
        .agg(count(lit(1)), sum("n_chars")).head())
    val (rangeRows, rangeS) = timeIt(
      t.readRange(lo, hi).get
        .agg(count(lit(1)), sum("n_chars")).head())

    require(fullRows == rangeRows,
      s"range read diverged from the filtered full scan: " +
        s"$rangeRows vs $fullRows")
    val opened = t.rangeDirs(lo, hi).size
    require(opened <= 3 && opened >= 1,
      s"pruning failed: opened $opened of ${t.readFanIn} dirs")
    require(t.readFanIn == nBatches)
    println(f"[zone] window rows=${fullRows.getLong(0)} " +
      f"opened=$opened/${t.readFanIn} dirs; " +
      f"full=$fullS%.2f s pruned=$rangeS%.2f s " +
      f"speedup=${fullS / rangeS}%.1f x")
    // the dir ratio is the claim of record; the local wall-clock
    // bound is deliberately loose (small files amortize poorly)
    require(fullS / rangeS >= 1.3,
      f"expected a wall win from 20x fewer dirs, got ${fullS / rangeS}%.1f x")

    val wallS = (System.nanoTime() - t0) / 1e9
    println(f"[zone] PASS in $wallS%.1f s")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
