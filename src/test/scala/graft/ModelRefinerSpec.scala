package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.ModelRefiner

/** The trained refiner artifact genuinely classifies: on the
  * model-branch rows its type decision agrees with the rules weak
  * labels (the supervision source) near-perfectly, and its confidence
  * VARIES per post — the property the constant-0.35 stand-in lacked
  * and the reason the artifact exists.
  */
class ModelRefinerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("model branch agrees with the rules labels and emits varying confidence") {
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .withColumn("post",
        concat(lit("$"), upper(col("source")), lit(" "), col("text"),
          when(col("doc_id") % 4 === 0, " launch now").otherwise(""),
          lit(" ca 0x"), md5(col("text")),
          substring(md5(col("source")), 1, 8)))
    val refined = ModelRefiner.refine(spark, d, "doc_id", "post").toDF()
      .join(d.select(col("doc_id").as("docId"),
        lower(col("post")).contains("launch").as("rulesLaunch")), Seq("docId"))
      .collect()
    val model = refined.filter(_.getAs[String]("backend") == "model")
    assert(model.nonEmpty && refined.exists(_.getAs[String]("backend") == "rules"))
    val agree = model.count { r =>
      (r.getAs[String]("refinedType") == "token_launch") ==
        r.getAs[Boolean]("rulesLaunch")
    }
    assert(agree.toDouble / model.length >= 0.95,
      s"model/rules agreement ${agree.toDouble / model.length} < 0.95")
    // a learned confidence varies; the stand-in's was one constant
    val confs = model.map(_.getAs[Double]("confidence")).distinct
    assert(confs.length > 10, s"confidence barely varies: ${confs.length} values")
    assert(refined.filter(_.getAs[String]("backend") == "rules")
      .forall(_.getAs[Double]("confidence") == 0.35))
  }
}
