package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraftFunctions

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
  * Skew discipline: NO `row_number() OVER (PARTITION BY q_id)` anywhere —
  * that would sort each query's entire candidate set in one task. Top-k is a
  * two-phase aggregation (local top-k per input partition, then a merge of
  * ≤k·partitions candidates per query), and nearest-centroid is a `max_by`
  * aggregate — both run with map-side partial aggregation and bounded
  * per-group state.
  *
  * Determinism: ordering uses ROUND(cosine, 4) with vec_id tiebreak, so the
  * result is insensitive to last-ulp float drift across engines.
  */
object Similarity {

  /** ROUND(graft_cosine, 4): the codegen'd CosineSimilarity expression —
    * bit-identical to VectorFunctions.cosine but evaluated as a primitive
    * loop inside whole-stage codegen (registration is idempotent). */
  private def simCol(df: DataFrame)(a: Column, b: Column): Column =
    round(GraftFunctions.cosine(df, a, b), 4)

  /** Per-query top-k of a scored frame (q_id, n_id, sim) without a global
    * per-query sort. Phase 1 keeps the best k per (q_id, input partition);
    * phase 2 merges the ≤ k·numPartitions survivors per query. Sort key is
    * struct(-sim, n_id): array_sort orders field-lexicographically, giving
    * sim DESC then n_id ASC. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val cand = struct((-col("sim")).as("negsim"), col("n_id"), col("sim"))
    val local = scored
      .withColumn("__p", spark_partition_id())
      .groupBy(col("q_id"), col("__p"))
      .agg(slice(array_sort(collect_list(cand)), 1, k).as("top"))
    local
      .select(col("q_id"), explode(col("top")).as("t"))
      .groupBy(col("q_id"))
      .agg(slice(array_sort(collect_list(col("t"))), 1, k).as("top"))
      .select(col("q_id"), explode(col("top")).as("t"))
      .select(col("q_id"), col("t.n_id").as("n_id"), col("t.sim").as("sim"))
  }

  /** Exact top-k neighbors for each query vector (queries = rows matching
    * `queryPred`), excluding self. Output: q_id, n_id, sim. */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val scored = broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), simCol(emb)(col("q_emb"), col("n_emb")).as("sim"))
    topKPerQuery(scored, k)
  }

  /** IVF assignment: nearest centroid per vector (centroids = rows matching
    * `centroidPred`, e.g. vec_id % 50 == 0 for a deterministic codebook).
    * One max_by aggregate per vector — partial-aggregates map-side, carries
    * the embedding in the value struct so no second corpus join is needed.
    * Output: vec_id, embedding, cluster. */
  def ivfAssign(emb: DataFrame, centroidPred: Column): DataFrame = {
    val cent = emb.filter(centroidPred)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    emb.join(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("c_id"),
        simCol(emb)(col("embedding"), col("c_emb")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("c_id"), col("embedding")),
        struct(col("sim"), (-col("c_id")).as("negid"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.c_id").as("cluster"))
  }

  /** One k-means refinement step over the IVF codebook: re-assign every
    * vector to its nearest centroid, then average each cluster's members
    * with the typed CentroidAggregator (map-side partial sums — one
    * dim-width buffer per cluster per partition crosses the shuffle).
    * Output: cluster, centroid ARRAY<FLOAT>. */
  def refineCentroids(emb: DataFrame, centroidPred: Column): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    ivfAssign(emb, centroidPred)
      .select(col("cluster"), col("embedding")).as[(Long, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.CentroidAggregator.toColumn.name("centroid"))
      .toDF("cluster", "centroid")
  }

  /** IVF search, probe=1: each query scans only its own cluster.
    * Output: q_id, n_id, sim. */
  def ivfTopK(emb: DataFrame, centroidPred: Column, queryPred: Column, k: Int): DataFrame = {
    val assigned = ivfAssign(emb, centroidPred)
    val q = assigned.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("cluster"))
    val c = assigned
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("cluster"))
    val scored = broadcast(q).join(c, Seq("cluster"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), simCol(emb)(col("q_emb"), col("n_emb")).as("sim"))
    topKPerQuery(scored, k)
  }
}
