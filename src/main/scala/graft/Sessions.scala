package graft

import org.apache.spark.sql.SparkSession

/** ONE definition of the local session config shared by the three
  * driver-contract mains (Main / Verify / Bench) and the test session —
  * so the runtime knobs the 100 TB design leans on are pinned in code,
  * not inherited from Spark defaults that a version bump could move.
  *
  * The AQE trio is the load-bearing part: the SkewBench story ("a
  * hot-key shuffle re-plans at runtime") assumes
  * `spark.sql.adaptive.{enabled,coalescePartitions.enabled,
  * skewJoin.enabled}`; pinning them here makes the claim a property of
  * the session builder, asserted by SessionConfigSpec, instead of a
  * default three `spark-defaults.conf` lines away from silently off.
  * `conf/cluster-smoke.conf` pins the same three for cluster submits.
  */
object Sessions {

  /** The knobs every graft session pins explicitly (runtime re-plan:
    * partition coalescing + skew-join splitting on live shuffle
    * statistics). */
  val adaptiveKnobs: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    // coalesce to the ADVISORY SIZE (64 MB default), not to max
    // parallelism: the `parallelismFirst=true` default keeps every
    // post-shuffle stage at cluster-width partition counts however few
    // bytes flow through it — per-partition scheduling/fetch overhead
    // with no compute to amortize it (optimization guide §2.2 "fewer,
    // larger reduce partitions"; Spark's own config doc recommends
    // setting this false in production). Partition counts still scale
    // with DATA (bytes/advisory), so the setting is size-adaptive at
    // every SF rather than pinned to either local core count or cluster
    // width.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
    "spark.sql.adaptive.skewJoin.enabled" -> "true")

  /** Wire the reliable-persist checkpoint root into the session.
    * Cluster submits set `spark.graft.checkpoint.dir` alongside
    * `spark.graft.persist.mode=reliable` (conf/cluster-smoke.conf);
    * under that mode Persist.cut calls `df.checkpoint()`, which crashes
    * without a checkpoint directory. ALL THREE contract mains call this
    * (Verify and Bench run the same Persist-using operators Main does),
    * so one `--properties-file` configures the whole persistence story
    * regardless of which main is submitted. No-op when the key is
    * absent (the local[n] default). */
  def wireCheckpointDir(spark: SparkSession): Unit =
    spark.sparkContext.getConf.getOption("spark.graft.checkpoint.dir")
      .foreach(spark.sparkContext.setCheckpointDir)

  /** local[cpus] builder with the shared baseline: shuffle partitions =
    * thread count (local[n] has no cluster to fan to; AQE coalesces
    * below it), UTC (all oracle arithmetic is UTC), UI off, AQE trio
    * pinned. Callers append their own extras (nanosAsLong for
    * event-fixture readers, warehouse dir for tests). */
  def local(cpus: String): SparkSession.Builder =
    adaptiveKnobs.foldLeft(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    ) { case (b, (k, v)) => b.config(k, v) }
}
