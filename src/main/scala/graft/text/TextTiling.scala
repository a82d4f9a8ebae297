package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TextTiling-style semantic segmentation (Hearst 1997, the lexical-
  * cohesion variant): find TOPIC-SHIFT boundaries inside a document,
  * so long-document chunking (L31) can cut at semantic seams instead
  * of blind stride offsets — the difference between a training
  * example that carries one coherent topic and one that welds two.
  *
  * Per document: fixed blocks of `blockTokens` tokens; per adjacent
  * gap the lexical cohesion = Jaccard over the blocks' DISTINCT token
  * sets (exact rational → 1e-6 fixed point, so the whole chain is
  * integer); per gap the valley depth = max(0, sim_left − sim) +
  * max(0, sim_right − sim) (missing neighbors contribute 0); a gap is
  * a BOUNDARY when its depth strictly exceeds the mean depth —
  * compared as depth·nGaps > Σdepth, an exact integer
  * cross-multiplication with no division anywhere.
  *
  * Scale shape: the whole computation is a map-side per-doc kernel
  * (the TextRank convention — graphs/blocks are doc-local and bounded
  * by doc length), one pass, zero shuffles at any corpus size.
  * Boundaries emit as a comma-joined gap-index string so the DuckDB
  * oracle compares byte-for-byte without array-rendering hazards.
  */
object TextTiling {

  final case class DocTiles(docId: Long, nBlocks: Int, nGaps: Int,
      boundaries: String, nSegments: Int)

  /** The per-doc kernel, shared by the operator and the spec. */
  private[graft] def tileOf(toks: Seq[String],
      blockTokens: Int): (Int, Int, Seq[Int]) = {
    val blocks = toks.grouped(blockTokens).map(_.distinct.toSet).toVector
    val nb = blocks.length
    if (nb < 2) return (nb, 0, Nil)
    val sims = (1 until nb).map { g =>
      val inter = (blocks(g - 1) & blocks(g)).size
      val union = (blocks(g - 1) | blocks(g)).size
      math.floor(inter.toDouble / union.toDouble * 1000000.0 + 0.5).toLong
    }
    val ng = sims.length
    val depths = sims.indices.map { j =>
      val left = if (j > 0) math.max(0L, sims(j - 1) - sims(j)) else 0L
      val right =
        if (j < ng - 1) math.max(0L, sims(j + 1) - sims(j)) else 0L
      left + right
    }
    val sd = depths.sum
    val bounds = depths.indices.collect {
      case j if depths(j) > 0 && depths(j) * ng > sd => j + 1 // gap index
    }
    (nb, ng, bounds)
  }

  final case class SegChunk(docId: Long, segIdx: Int, chunkIdx: Int,
      tokStart: Int, nToks: Int, chunk: String)

  /** Seam-aware chunking (L31 × L73): stride windows like
    * [[graft.operators.Chunking.chunkByTokens]], but cut WITHIN the
    * TextTiling segments — no training example welds two topics.
    * Window offsets restart at each segment (width/stride in tokens,
    * tail clamped at the segment end); provenance = (segment index,
    * chunk index within segment, global token start). Same map-side
    * per-doc kernel shape as [[segments]]: zero shuffles, output rows
    * ∝ chunks.
    */
  def segmentedChunks(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, blockTokens: Int = 10, width: Int = 16,
      stride: Int = 12): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      s"need 0 < stride <= width: $width/$stride")
    import spark.implicits._
    df.select(col(idCol).cast("long"), TextAnalysis.tokens(col(textCol)))
      .as[(Long, Seq[String])]
      .mapPartitions(_.flatMap { case (id, toks) =>
        val (_, _, bounds) = tileOf(toks, blockTokens)
        val offs = (0 +: bounds.map(_ * blockTokens) :+ toks.length).toVector
        offs.sliding(2).zipWithIndex.flatMap { case (Seq(st, en), si) =>
          val m = en - st
          if (m <= 0) Nil
          else (0 to (m - 1) / stride).map { k =>
            val o = st + k * stride
            val e2 = math.min(en, o + width)
            SegChunk(id, si, k, o, e2 - o,
              toks.slice(o, e2).mkString(" "))
          }
        }
      })
      .toDF()
      .select(col("docId").as("doc_id"), col("segIdx").as("seg_idx"),
        col("chunkIdx").as("chunk_idx"), col("tokStart").as("tok_start"),
        col("nToks").as("n_toks"), col("chunk"))
  }

  /** One row per doc: block/gap counts, boundary gap indices
    * (1-based, comma-joined, "" when none), resulting segment count.
    */
  def segments(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, blockTokens: Int = 10): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), TextAnalysis.tokens(col(textCol)))
      .as[(Long, Seq[String])]
      .mapPartitions(_.map { case (id, toks) =>
        val (nb, ng, bounds) = tileOf(toks, blockTokens)
        DocTiles(id, nb, ng, bounds.mkString(","), bounds.length + 1)
      })
      .toDF()
      .select(col("docId").as("doc_id"), col("nBlocks").as("n_blocks"),
        col("nGaps").as("n_gaps"), col("boundaries"),
        col("nSegments").as("n_segments"))
  }
}
