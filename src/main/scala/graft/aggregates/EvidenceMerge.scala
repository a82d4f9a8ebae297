package graft.aggregates

import scala.collection.immutable.TreeMap

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Evidence item (reference internal schema api/events.py:589-619):
  * `{source, ts, ref: map, summary, weight}`; `ts` is epoch micros.
  */
final case class Evidence(
    source: String,
    ts: Long,
    ref: Map[String, String],
    summary: String,
    weight: Double)

/** D3 — evidence dedup-merge (reference api/events.py:531-586 keys,
  * :682-875 merge), re-specified as a commutative + associative
  * `Aggregator` so it is shuffle-order-insensitive (SURVEY §7.4 risk 1):
  *
  *   - dedup key per source family: x → tweet_id else /status/<id> from
  *     url; dex → tx else chain:pool:ts_bucket; goplus →
  *     endpoint|chain|address; default → sorted ref entries;
  *   - on duplicate: union refs preferring non-empty values, keep
  *     earliest ts, max weight, longest summary (ties broken
  *     lexicographically so merge order cannot matter);
  *   - output canonically ordered by dedup key.
  */
object EvidenceMerge {

  def dedupKey(e: Evidence): String = {
    val ref = Option(e.ref).getOrElse(Map.empty[String, String])
    def get(k: String): Option[String] = ref.get(k).filter(_.nonEmpty)
    e.source match {
      case "x" | "twitter" =>
        get("tweet_id")
          .orElse(get("url").flatMap { u =>
            val i = u.indexOf("/status/")
            if (i >= 0) Some(u.substring(i + 8).takeWhile(_.isDigit)) else None
          })
          .map(id => s"x:$id")
          .getOrElse(defaultKey(e))
      case "dex" =>
        get("tx").map(tx => s"dex:$tx")
          .orElse(for (c <- get("chain"); p <- get("pool"))
            yield s"dex:$c:$p:${e.ts / 600000000L}")
          .getOrElse(defaultKey(e))
      case "goplus" =>
        s"goplus:${get("endpoint").getOrElse("")}|${get("chain").getOrElse("")}|${get("address").getOrElse("")}"
      case _ => defaultKey(e)
    }
  }

  private def defaultKey(e: Evidence): String = {
    val ref = Option(e.ref).getOrElse(Map.empty[String, String])
    val canon = ref.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    s"${e.source}:" + java.security.MessageDigest.getInstance("SHA-1")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Merge two evidence items sharing a dedup key. Commutative:
    * every field resolution is an order-free min/max/longest rule.
    */
  def mergeItems(a: Evidence, b: Evidence): Evidence = {
    val refA = Option(a.ref).getOrElse(Map.empty[String, String])
    val refB = Option(b.ref).getOrElse(Map.empty[String, String])
    val mergedRef = (refA.keySet ++ refB.keySet).map { k =>
      val va = refA.getOrElse(k, "")
      val vb = refB.getOrElse(k, "")
      // prefer non-empty; break non-empty conflicts with lexicographic
      // min so A⊕B == B⊕A
      val v = (va, vb) match {
        case ("", x) => x
        case (x, "") => x
        case (x, y)  => if (x <= y) x else y
      }
      k -> v
    }.toMap
    val summary = {
      val sa = Option(a.summary).getOrElse("")
      val sb = Option(b.summary).getOrElse("")
      if (sa.length > sb.length) sa
      else if (sb.length > sa.length) sb
      else if (sa <= sb) sa else sb
    }
    Evidence(
      source = if (a.source <= b.source) a.source else b.source,
      ts = math.min(a.ts, b.ts),
      ref = mergedRef,
      summary = summary,
      weight = math.max(a.weight, b.weight))
  }

  type Buf = TreeMap[String, Evidence]

  /** Aggregator over rows of Evidence grouped by event key. */
  val aggregator: Aggregator[Evidence, Buf, Seq[Evidence]] =
    new Aggregator[Evidence, Buf, Seq[Evidence]] {
      override def zero: Buf = TreeMap.empty

      override def reduce(buf: Buf, e: Evidence): Buf = {
        val k = dedupKey(e)
        buf.updatedWith(k) {
          case Some(prev) => Some(mergeItems(prev, e))
          case None       => Some(e)
        }
      }

      override def merge(a: Buf, b: Buf): Buf =
        b.foldLeft(a) { case (acc, (k, e)) =>
          acc.updatedWith(k) {
            case Some(prev) => Some(mergeItems(prev, e))
            case None       => Some(e)
          }
        }

      override def finish(buf: Buf): Seq[Evidence] = buf.values.toSeq

      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[Seq[Evidence]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Evidence]]()
    }
}
