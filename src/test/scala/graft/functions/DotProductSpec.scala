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

  test("optimizer rule: the HOF zip_with+aggregate dot pattern rewrites to graft_dot") {
    GraftFunctions.register(spark) // installs RewriteDotProduct too
    val e = Tables(spark, sf(), "embeddings").limit(100)
    // float × float column form
    val hofFF = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(VectorFunctions.dot(col("a.embedding"), col("b.embedding")).as("d"))
    assert(hofFF.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      hofFF.queryExecution.optimizedPlan.toString.take(800))
    // float × double-literal plane form (the cast the optimizer elides)
    val plane = array(graft.operators.Similarity.srpPlanes(1, 64).head.map(lit): _*)
    val hofFD = e.select(VectorFunctions.dot(col("embedding"), plane).as("d"))
    assert(hofFD.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    // and the rewrite is invisible to results: bit-equal to DotProduct
    val both = e.select(
      VectorFunctions.dot(col("embedding"), plane).as("rewritten"),
      GraftFunctions.dot(e, col("embedding"), plane).as("direct"))
    assert(both.filter(col("rewritten") =!= col("direct")).count() == 0)
  }

  test("optimizer rule: near-miss folds are left alone") {
    GraftFunctions.register(spark)
    val e = Tables(spark, sf(), "embeddings").limit(10)
    // different zero, different merge op, non-product lambda — none may fire
    val miss = e.select(
      aggregate(zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(1.0d), (acc, v) => acc + v).as("zero_off"),
      aggregate(zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") + y.cast("double")),
        lit(0.0d), (acc, v) => acc + v).as("sum_not_product"),
      aggregate(zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0d), (acc, v) => greatest(acc, v)).as("max_merge"))
    assert(!miss.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      miss.queryExecution.optimizedPlan.toString.take(800))
    miss.collect() // and they still evaluate
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
