package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions._

/** Session extensions: SQL registration for the custom expressions and
  * the opt-in unbounded-scan lint (SURVEY §4 — the reference's BQ LINT
  * "require LIMIT / time-window" guard re-expressed as an analysis
  * check).
  *
  * Use: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`. The function
  * set is also installable into a live session via
  * [[GraftExtensions.registerFunctions]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectCheckRule(spark => UnboundedScanLint(spark))
  }
}

object GraftExtensions {

  private def litStr(e: Expression, what: String): String = e match {
    case Literal(v: UTF8String, _) => v.toString
    case Literal(null, _)          => ""
    case _ => throw new IllegalArgumentException(s"$what must be a string literal")
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(s"$what must be an int literal")
  }

  /** (name, info, builder) for each SQL-exposed custom expression. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("blake2s",
      new ExpressionInfo(classOf[Blake2sHash].getName, "blake2s"),
      (args: Seq[Expression]) => args match {
        case Seq(c)       => Blake2sHash(c, 32, "")
        case Seq(c, n)    => Blake2sHash(c, litInt(n, "digest bytes"), "")
        case Seq(c, n, k) => Blake2sHash(c, litInt(n, "digest bytes"),
          litStr(k, "key"))
        case _ => throw new IllegalArgumentException(
          "blake2s(str[, digestBytes[, key]])")
      }),
    ("nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args.head)),
    ("canonical_url",
      new ExpressionInfo(classOf[CanonicalUrl].getName, "canonical_url"),
      (args: Seq[Expression]) => CanonicalUrl(args.head)),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(c)    => WordShingles(c, 3)
        case Seq(c, n) => WordShingles(c, litInt(n, "n"))
        case _ => throw new IllegalArgumentException("word_shingles(str[, n])")
      }),
    ("py6g",
      new ExpressionInfo(classOf[PyG6Format].getName, "py6g"),
      (args: Seq[Expression]) => PyG6Format(args.head)),
    ("keyword_priority",
      new ExpressionInfo(classOf[KeywordPriority].getName, "keyword_priority"),
      (args: Seq[Expression]) => args match {
        case Seq(c)    => KeywordPriority(c, 5)
        case Seq(c, k) => KeywordPriority(c, litInt(k, "topK"))
        case _ => throw new IllegalArgumentException("keyword_priority(str[, topK])")
      }))

  /** Install the SQL functions into an already-running session. */
  def registerFunctions(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** Opt-in analysis check: reject queries that scan a "guarded" table
  * with neither a pushed-down filter nor a limit anywhere above the
  * scan. Mirrors the reference's BQ lint (bq_provider.py:581-602:
  * require LIMIT / time-window before execution) — at 100 TB an
  * unbounded scan is a cost bug, and failing at ANALYSIS time is free.
  *
  * Enable per session:
  * `spark.conf.set("spark.graft.lint.guardedTables", "lineitem,events")`.
  */
case class UnboundedScanLint(spark: SparkSession)
    extends (LogicalPlan => Unit) {

  private def guarded: Seq[String] =
    spark.conf.get("spark.graft.lint.guardedTables", "")
      .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq

  override def apply(plan: LogicalPlan): Unit = {
    val tables = guarded
    // Enforce on real query shapes and on writes. Every Dataset
    // CONSTRUCTION passes analysis too — flagging a bare
    // `spark.read.parquet(...)` would make it impossible to even build
    // the frame one intends to filter next. Known gap: a filterless
    // projection consumed via collect() has no marker node at analysis
    // time and is not caught; a physical-plan guard would be needed.
    val isQuery = plan.exists {
      case _: Aggregate | _: Join | _: Sort | _: Window => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Command => true
      case _ => false
    }
    if (tables.nonEmpty && isQuery) check(plan, bounded = false, tables)
  }

  private def scanName(lr: LogicalRelation): String =
    lr.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.rootPaths.map(_.getName.toLowerCase).mkString(",")
      case other => other.toString.toLowerCase
    }

  private def check(plan: LogicalPlan, bounded: Boolean,
      tables: Seq[String]): Unit = plan match {
    case lr: LogicalRelation =>
      val name = scanName(lr)
      if (!bounded && tables.exists(name.contains))
        throw new IllegalStateException(
          s"graft lint: unbounded scan over guarded table '$name' — " +
            "add a filter or limit (spark.graft.lint.guardedTables)")
    case f: Filter      => f.children.foreach(check(_, bounded = true, tables))
    case l: GlobalLimit => l.children.foreach(check(_, bounded = true, tables))
    case l: LocalLimit  => l.children.foreach(check(_, bounded = true, tables))
    case other          => other.children.foreach(check(_, bounded, tables))
  }
}
