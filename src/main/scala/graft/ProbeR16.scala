package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Scratch profiling main for round-16 optimization work (not part of the
  * driver contract). Times phases of the hot contract queries so targets
  * are measured, not guessed (guide §1). Sections gated by PROBE_* env. */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
      .config(graft.sources.Tables.nanosAsLongKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, TextAnalysis}
    def docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def release(): Unit = {
      spark.catalog.clearCache(); System.gc()
    }

    // --- x128 family phase breakdown -----------------------------------
    if (sys.env.get("PROBE_X128").contains("1")) {
      for (round <- 1 to 3) {
        println(s"-- x128 phases round $round --")
        val sh = time("sh = cut(shingleSet(docs, 3))") {
          graft.Persist.cut(Dedup.shingleSet(docs, 3))
        }
        time("sig build + est pairs (estimatedJaccardPairs)") {
          noop(Dedup.estimatedJaccardPairs(docs, 3, 12, 4))
        }
        time("exact pairs thr=0 (jaccardPairsFromSets)") {
          noop(Dedup.jaccardPairsFromSets(sh, 0.0, 256))
        }
        time("x128 full (jaccardEstimateError)") {
          noop(Dedup.jaccardEstimateError(docs, 3, 12, 4, 256))
        }
        release()
      }
      spark.stop(); return
    }

    // --- CC loop: rounds to convergence + per-stage cost ----------------
    if (sys.env.get("PROBE_CC").contains("1")) {
      for (round <- 1 to 2) {
        println(s"-- cc round $round --")
        val pairs = time("lshCandidatePairs (cut)") {
          graft.Persist.cut(Dedup.lshCandidatePairs(docs, 3, 12, 4))
        }
        println(s"[probe] n_pairs = ${pairs.count()}")
        for (cap <- 1 to 4) {
          time(s"componentMembership maxIters=$cap") {
            Dedup.componentMembership(pairs, cap).foreach {
              case (lbl, conv) =>
                val n = lbl.count()
                println(s"[probe]   converged=$conv labels=$n")
            }
          }
        }
        time("x21 full (dropNearDuplicatesCC)") {
          noop(Dedup.dropNearDuplicatesCC(docs, Dedup.lshCandidatePairs(docs, 3, 12, 4)))
        }
        release()
      }
      spark.stop(); return
    }

    // --- x167 / x161 / x98 / x39 stage costs ----------------------------
    if (sys.env.get("PROBE_MISC").contains("1")) {
      for (round <- 1 to 2) {
        println(s"-- misc round $round --")
        time("x167 packSequences alone") {
          noop(TextAnalysis.packSequences(docs, 512L, 8))
        }
        val pairs = time("x167/x161 lshCandidatePairs (cut)") {
          graft.Persist.cut(Dedup.lshCandidatePairs(docs, 3, 12, 4))
        }
        time("x167 full (packedDupColocation)") {
          noop(Dedup.packedDupColocation(docs, Dedup.lshCandidatePairs(docs, 3, 12, 4), 512L, 8))
        }
        time("x161 full (pairDiffThirds)") {
          noop(Dedup.pairDiffThirds(docs, pairs, 3))
        }
        time("x39 full (duplicatedSpans n=15)") {
          noop(Dedup.duplicatedSpans(docs, 15, 2))
        }
        val batch = docs.filter(col("doc_id") % 10 === 0)
        val hist = docs.filter(col("doc_id") % 10 =!= 0)
        time("x98 index (boilerplateIndex hist)") {
          noop(Dedup.boilerplateIndex(hist, 5))
        }
        time("x98 full (stripBoilerplateAgainst)") {
          noop(Dedup.stripBoilerplateAgainst(batch, Dedup.boilerplateIndex(hist, 5), 5, 2))
        }
        release()
      }
      spark.stop(); return
    }

    spark.stop()
  }
}
