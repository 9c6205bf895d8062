package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

import graft.functions.expr.CosineSimilarity

/** Registration surface for the engine's custom Catalyst expressions.
  *
  * Two entry points:
  *  - [[GraftExtensions]]: `SparkSessionExtensions` injector — enable with
  *    `spark.sql.extensions=graft.GraftExtensions` so SQL users get
  *    `graft_cosine(a, b)` in every session (the idiomatic deploy path);
  *  - [[GraftFunctions.register]]: imperative, idempotent registration for
  *    sessions built without the extension (tests, Verify/Bench mains).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.cosineDescriptor)
}

object GraftFunctions {

  val cosineDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_cosine(a, b) takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  /** Idempotent imperative registration into `spark`'s function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", es => cosineDescriptor._3(es), "internal")

  /** Column-level accessor; caller must have registered on the session
    * owning the plan (operators pass a frame so this is automatic). */
  def cosine(df: DataFrame, a: Column, b: Column): Column = {
    register(df.sparkSession)
    call_function("graft_cosine", a, b)
  }
}
