package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake repair — the curation-grade subset of ftfy's "fix
  * encoding" pass: UTF-8 text that was mis-decoded as Windows-1252
  * leaves characteristic two/three-char sequences ("Ã©" for é,
  * "â€™" for ’); web crawls are full of them, and they poison
  * tokenizers and dedup fingerprints alike. The fix table below
  * covers the high-frequency printable cases (accented Latin +
  * smart punctuation); a full ftfy (heuristic re-decode, control
  * bytes) would slot in as a mapPartitions stage behind the same
  * two-column contract.
  *
  * Pure `replace` chain over codegen'd built-ins — map-side, zero
  * shuffle, DuckDB-mirrorable. The declared table order is
  * LOAD-BEARING: replacements can cascade (on "â€"+"â€œ", fixing
  * â€œ→“ first creates the sequence â€“, which only the
  * later-ordered â€“ rule rewrites — reversing the order changes the
  * output), so the chain must run in exactly this order on BOTH
  * engines. The generated oracle SQL folds the same order; parity
  * holds because the orders match, not because order is irrelevant.
  */
object Mojibake {

  /** (mojibake sequence, repaired text) — UTF-8 bytes of the target
    * char read as cp1252. Printable sequences only (control-byte
    * cases need the mapPartitions path).
    */
  val Fixes: Seq[(String, String)] = Seq(
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¼" -> "ü", "Ã¶" -> "ö", "Ã¤" -> "ä",
    "Ã±" -> "ñ", "Ã§" -> "ç", "Ã³" -> "ó", "Ã¡" -> "á", "Ãº" -> "ú",
    "â€™" -> "’", "â€˜" -> "‘", "â€œ" -> "“", "â€¦" -> "…",
    "â€“" -> "–", "â€”" -> "—")

  /** Repaired text: the fix chain applied in table order. */
  def fix(text: Column): Column =
    Fixes.foldLeft(text) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }

  /** Number of mojibake sequences present in the ORIGINAL text
    * (per-sequence occurrence counts summed; each count is
    * (len − len(without)) / len(seq), all in chars).
    */
  def hitCount(text: Column): Column =
    Fixes.map { case (bad, _) =>
      ((length(text) - length(replace(text, lit(bad), lit("")))) /
        bad.length).cast("long")
    }.reduce(_ + _)
}
