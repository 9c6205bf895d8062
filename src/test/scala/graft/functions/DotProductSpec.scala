package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftFunctions, SparkSpec}
import graft.functions.VectorFunctions
import graft.sources.Tables

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = {
    val e = Tables(spark, sf(), "embeddings").limit(50)
      .select(col("vec_id"), col("embedding"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
  }

  test("codegen dot is bit-identical to the HOF fold (float×float)") {
    val both = pairs.select(
      GraftFunctions.dot(pairs, col("x"), col("y")).as("fast"),
      VectorFunctions.dot(col("x"), col("y")).as("hof"))
    val diff = both.filter(col("fast") =!= col("hof")).count()
    assert(diff == 0, s"$diff of ${both.count()} pairs diverged")
  }

  test("float×double-literal planes match the HOF fold bit-for-bit") {
    // the SRP/JL shape: ARRAY<FLOAT> row against an ARRAY<DOUBLE> literal
    val plane = graft.operators.Similarity.srpPlanes(1, 64).head
    val arr = array(plane.map(lit): _*)
    val e = Tables(spark, sf(), "embeddings").limit(100)
    val both = e.select(
      GraftFunctions.dot(e, col("embedding"), arr).as("fast"),
      VectorFunctions.dot(col("embedding"), arr).as("hof"))
    assert(both.filter(col("fast") =!= col("hof")).count() == 0)
  }

  test("nulls, null elements, ragged lengths, empty arrays — HOF parity") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS a,
        |  graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS b,
        |  graft_dot(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c,
        |  graft_dot(array(CAST(1.0 AS FLOAT), NULL), array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS d,
        |  graft_dot(array()::ARRAY<FLOAT>, array()::ARRAY<FLOAT>) AS e
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 6.0)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    assert(r.getDouble(4) == 0.0)
  }

  test("the expression runs inside whole-stage codegen") {
    val e = Tables(spark, sf(), "embeddings")
    val df = e.select(GraftFunctions.dot(e, col("embedding"), col("embedding")))
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("Found 1 WholeStageCodegen") && codegen.contains("graft_dot"),
      codegen.take(500))
  }
}
