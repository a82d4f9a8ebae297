package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Corpus-level frequent-item mining (boilerplate phrase / hot-line /
  * stopword detection) at a SUPPORT THRESHOLD, exactly — via the
  * two-pass Misra-Gries sketch (Misra & Gries 1982; the "MG summary"
  * of Cormode's frequent-items survey).
  *
  * Why not plain groupBy+count? Its shuffle carries one row per
  * DISTINCT item — at 100 TB the distinct-phrase universe is ~the
  * corpus size (most n-grams are unique), so the "find the 0.1 %
  * boilerplate" question pays a full-corpus shuffle for counts that
  * are overwhelmingly 1. Here:
  *
  *   - pass 1 (map-side only, NO shuffle of items): each partition
  *     runs an MG sketch with k counters — bounded memory, one row
  *     emitted per SURVIVING counter (≤ k per partition) plus one
  *     partition-total row. MG guarantee: any item with
  *     partition-frequency > N_p/(k+1) survives; an item with global
  *     frequency ≥ s·N exceeds that bar in at least one partition
  *     (pigeonhole), so the union of per-partition survivors is a
  *     SUPERSET of every global heavy hitter whenever k+1 > 1/s.
  *   - pass 2: exact recount of the candidate set only — items
  *     broadcast-semi-joined (candidates ≤ partitions·k rows), so the
  *     count shuffle carries candidate occurrences, not the corpus's
  *     distinct universe.
  *
  * The OUTPUT is exact and partitioning-independent: candidates are a
  * superset however the input splits, and the final counts come from
  * the exact recount — the sketch only bounds WHERE we look, never
  * what we report. Support is integer ppm (count·10⁶ ≥ ppm·N) so the
  * threshold maths is float-free on both engines.
  */
object HeavyHitters {

  /** Per-partition Misra-Gries: k counters, decrement-all when full.
    * Emits (item, isTotal=false) per surviving counter and one
    * (null, true) row carrying the partition's item count.
    */
  private def mgCandidates(items: Iterator[String], k: Int): Iterator[(String, Long)] = {
    val counters = new java.util.HashMap[String, Long](k * 2)
    var total = 0L
    while (items.hasNext) {
      val x = items.next()
      total += 1
      val c = counters.get(x)
      if (c != 0L || counters.containsKey(x)) counters.put(x, c + 1)
      else if (counters.size < k) counters.put(x, 1L)
      else {
        // decrement-all; drop zeroed counters
        val it = counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1)
        }
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = counters.keySet().iterator()
    while (it.hasNext) out += ((it.next(), 0L))
    out += ((null, total))
    out.iterator
  }

  /** Pass 1 alone: the map-side MG sketch rows, (item, n_p) per
    * surviving counter plus one (null, partition total) row. Public so
    * the scale rehearsal can measure the candidate-superset size the
    * two-pass design broadcasts; [[frequentItems]] is the user API.
    */
  def mgPass1(items: DataFrame, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col("item").cast("string"))
      .filter(col("item").isNotNull)
      .as[String]
      .mapPartitions(it => mgCandidates(it, k))
      .toDF("item", "n_p")
  }

  /** All items (single string column `item`) with exact count ≥
    * supportPpm·N/10⁶, as (item, cnt). `counters` defaults to the MG
    * bound ⌈10⁶/supportPpm⌉ + 1 (the smallest k with a superset
    * guarantee); raise it to shrink the candidate set's false-positive
    * tail, never for correctness.
    */
  def frequentItems(items: DataFrame, supportPpm: Long,
      counters: Int = 0): DataFrame = {
    require(supportPpm > 0, "supportPpm must be positive")
    val k =
      if (counters > 0) counters
      else (1000000L / supportPpm).toInt + 2
    val pass1 = mgPass1(items, k)
      .localCheckpoint() // consumed twice (total + candidates), tiny
    val total = pass1.filter(col("item").isNull)
      .agg(sum("n_p")).head.getLong(0)
    val candidates = pass1.filter(col("item").isNotNull)
      .select("item").distinct()
    items.join(broadcast(candidates), Seq("item"))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 1000000L >= lit(supportPpm) * lit(total))
  }

  /** Frequent word n-gram PHRASES over a document corpus — the
    * boilerplate-phrase miner ("subscribe to our newsletter" at
    * corpus scale). Occurrences come from the codegen'd
    * [[graft.expressions.WordShinglesAll]] kernel (multiplicity
    * preserved — frequency mining counts occurrences, not the
    * per-doc sets the dedup family uses).
    */
  def frequentPhrases(df: DataFrame, textCol: String, n: Int,
      supportPpm: Long, counters: Int = 0): DataFrame =
    frequentItems(
      df.select(explode(TextAnalysis.shinglesAll(col(textCol), n)).as("item")),
      supportPpm, counters)
}
