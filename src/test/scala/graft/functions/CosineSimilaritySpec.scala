package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftFunctions, SparkSpec}
import graft.functions.VectorFunctions
import graft.sources.Tables

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = {
    val e = Tables(spark, sf(), "embeddings").limit(50)
      .select(col("vec_id"), col("embedding"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
  }

  test("codegen cosine is bit-identical to the HOF formulation") {
    val both = pairs.select(
      GraftFunctions.cosine(pairs, col("x"), col("y")).as("fast"),
      VectorFunctions.cosine(col("x"), col("y")).as("hof"))
    val diff = both.filter(col("fast") =!= col("hof")).count()
    assert(diff == 0, s"$diff of ${both.count()} pairs diverged")
  }

  test("null inputs and ragged lengths yield null (HOF zip_with parity)") {
    val df = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(1.0f, 0.0f))),
      (None, Some(Seq(1.0f, 0.0f))),
      (Some(Seq(1.0f)), Some(Seq(1.0f, 0.0f))) // truncated vector: null, not prefix-cosine
    ).toDF("x", "y")
    val got = df.select(GraftFunctions.cosine(df, col("x"), col("y"))).collect()
    assert(got(0).getDouble(0) == 1.0)
    assert(got(1).isNullAt(0))
    assert(got(2).isNullAt(0))
  }

  test("SparkSessionExtensions injector exposes graft_cosine to SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)))").collect()
    assert(r.head.getDouble(0) == 0.0)
  }

  test("the expression runs inside whole-stage codegen") {
    // scan+project has no exchange, so no AQE wrapper hides the span
    val e = Tables(spark, sf(), "embeddings")
    val df = e.select(GraftFunctions.cosine(e, col("embedding"), col("embedding")))
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("Found 1 WholeStageCodegen") && codegen.contains("graft_cosine"),
      codegen.take(500))
  }

  test("a null ELEMENT nulls the result, matching HOF propagation") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), NULL), " +
        "array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)))").collect()
    assert(r.head.isNullAt(0))
  }
}
