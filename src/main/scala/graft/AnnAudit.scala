package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** ANN recall audit against PLANTED near-neighbor pairs — the
  * similarity twin of [[BlockingAudit]]'s `planted` mode, closing the
  * round-13 verdict's gap: IVF/SRP recall was measured only at contract
  * SFs (x117's brute-vs-IVF join) because no large-SF embeddings
  * fixture existed. `gen_docs_fixture.py <sf> <dir> emb` now plants
  * vec[i+1] = vec[i] + 5% noise for i % 200 == 0 (cosine ≈ 0.9987, the
  * SemDeDup-style near-dup tier), so vec i is the twin's true nearest
  * neighbor with near-certainty in 64 dims and recall reduces to "did
  * the index return the twin" — feasible at SFs where the all-pairs
  * truth is not.
  *
  * Measures, one JSON line each (env header first, same discipline as
  * [[Bench]]):
  *   - brute-force top-10 over the planted queries (x11's shape): the
  *     calibration row — its twin-recall ≈ 1.0 certifies the planted
  *     pair IS the true neighbor, and its wall time is the exact-scan
  *     cost the index paths must beat;
  *   - IVF recall@10 vs probes (x12's shape: kmeans codebook from a
  *     deterministic seed sample, 2 Lloyd steps) — the production knob
  *     ladder;
  *   - SRP-LSH pair recall (x69's shape, scale-sized parameters: the
  *     contract's 16/1 saturates its 256-way buckets at 200k vectors,
  *     so the audit runs the documented widen-the-bits lever instead).
  *
  * Usage: runMain graft.AnnAudit [probes=1,2,4,8] [centroids=512]
  *        [srp=36/2]   (SPARK_GRAFT_SF_DIR = fixture dir)
  * Not part of the graded contract; artifacts land in logs/. */
object AnnAudit {
  def main(args: Array[String]): Unit = {
    val probes = (if (args.length > 0) args(0) else "1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val centroids = if (args.length > 1) args(1).toInt else 512
    val srpSpec = if (args.length > 2) args(2) else "36/2"
    val Array(srpBits, srpH) = srpSpec.split("/").map(_.toInt)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.local(cpus)
      .config(graft.sources.Tables.nanosAsLongKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.wireCheckpointDir(spark)
    val rt = Runtime.getRuntime
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    println(s"""{"metric":"env","jvm":"${System.getProperty("java.version")}",""" +
      s""""heap_max_gb":${rt.maxMemory() / 1e9},"cpus":${rt.availableProcessors()},""" +
      s""""load_avg":${os.getSystemLoadAverage},"spark_threads":"$cpus",""" +
      s""""sf":"$sfDir","centroids":$centroids,"srp":"$srpSpec"}""")

    // the pyarrow fixture is ONE parquet file → one input split → the
    // corpus side of every assignment/score join would run single-task
    // (measured: the sf10 IVF assignment serialized onto one core). A
    // real 100 TB corpus arrives in thousands of splits; repartition to
    // the session's parallelism so the audit measures the operators,
    // not the fixture's file count.
    val emb = Tables(spark, sfDir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism * 2).cache()
    val n = emb.count()
    // planted twins: vec i (i % 200 == 0) duplicated into i+1 — the
    // QUERY is the twin, its true neighbor is q_id - 1
    val queryPred = pmod(col("vec_id"), lit(200)) === 1
    val nq = emb.filter(queryPred).count()
    // a fixture below ~202 vectors has ZERO planted queries — every
    // recall below would be 0/0 and the JSONL lines would carry bare
    // NaN (invalid JSON); fail loudly instead (round-14 advice)
    require(nq > 0, s"fixture too small for planted queries (n_vecs=$n): " +
      "regenerate with gen_testdata.py at sf >= 0.01 (emb mode)")
    println(s"""{"metric":"fixture","n_vecs":$n,"planted_queries":$nq}""")

    def twinRecall(topk: org.apache.spark.sql.DataFrame): Double =
      topk.filter(col("n_id") === col("q_id") - 1).count().toDouble / nq

    // exact baseline: calibration (twin must be found ≈ always) + the
    // cost the index paths amortize
    val t0 = System.nanoTime()
    val brute = graft.Persist.cut(
      Similarity.bruteForceTopK(emb, queryPred, k = 10))
    val bruteSecs = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"ann_recall","method":"brute","recall_at_10":${twinRecall(brute)},""" +
      s""""secs":$bruteSecs}""")

    val tcb = System.nanoTime()
    val codebook = graft.Persist.cut(
      Similarity.kmeansCodebook(emb, col("vec_id") < centroids, iters = 2))
    val cbSecs = (System.nanoTime() - tcb) / 1e9
    println(s"""{"metric":"codebook","centroids":$centroids,"secs":$cbSecs}""")
    probes.foreach { p =>
      val t = System.nanoTime()
      val res = graft.Persist.cut(
        Similarity.ivfTopKWith(emb, codebook, queryPred, k = 10, probes = p))
      val secs = (System.nanoTime() - t) / 1e9
      println(s"""{"metric":"ann_recall","method":"ivf","probes":$p,""" +
        s""""recall_at_10":${twinRecall(res)},"secs":$secs}""")
    }

    val ts = System.nanoTime()
    val pairs = graft.Persist.cut(
      Similarity.srpNearDupPairs(emb, bits = srpBits, maxHamming = srpH, dim = 64))
    val srpSecs = (System.nanoTime() - ts) / 1e9
    val srpHits = pairs.filter(pmod(col("a_id"), lit(200)) === 0 &&
      col("b_id") === col("a_id") + 1).count()
    println(s"""{"metric":"ann_recall","method":"srp","bits":$srpBits,""" +
      s""""max_hamming":$srpH,"pair_recall":${srpHits.toDouble / nq},""" +
      s""""candidate_pairs":${pairs.count()},"secs":$srpSecs}""")
    spark.stop()
  }
}
