package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>), per the driver's training-data-pipeline mandate.
  *
  * Two paths:
  *  - bruteForceTopK: exact baseline. The query side is broadcast (it is by
  *    definition small); the corpus streams through the join, so the cost is
  *    |queries| × |corpus| dot products with NO corpus shuffle. This is the
  *    correct plan at any corpus size as long as the query batch is bounded.
  *  - ivfTopK: the scale path. Vectors are assigned to the nearest of C
  *    centroids once (broadcast centroids — again no corpus shuffle), and
  *    each query probes only its own cluster: cost drops to ~|corpus|/C per
  *    query, the classic IVF trade (recall < 1.0, tested with a recall
  *    bound, not a hash match).
  *
  * Determinism: ordering uses ROUND(cosine, 4) with vec_id tiebreak, so the
  * result is insensitive to last-ulp float drift across engines.
  */
object Similarity {

  private def simCol(a: Column, b: Column): Column = round(cosine(a, b), 4)

  /** Exact top-k neighbors for each query vector (queries = rows matching
    * `queryPred`), excluding self. Output: q_id, n_id, sim. */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("sim", simCol(col("q_emb"), col("n_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("sim"))
  }

  /** IVF assignment: nearest centroid per vector (centroids = rows matching
    * `centroidPred`, e.g. vec_id % 50 == 0 for a deterministic codebook).
    * Output: vec_id, embedding, cluster. */
  def ivfAssign(emb: DataFrame, centroidPred: Column): DataFrame = {
    val cent = emb.filter(centroidPred)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("c_id"))
    emb.join(broadcast(cent))
      .withColumn("sim", simCol(col("embedding"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id").as("cluster"))
  }

  /** IVF search, probe=1: each query scans only its own cluster.
    * Output: q_id, n_id, sim. */
  def ivfTopK(emb: DataFrame, centroidPred: Column, queryPred: Column, k: Int): DataFrame = {
    val assigned = ivfAssign(emb, centroidPred)
    val q = assigned.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("cluster"))
    val c = assigned
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("cluster"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    broadcast(q).join(c, Seq("cluster"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", simCol(col("q_emb"), col("n_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("sim"))
  }
}
