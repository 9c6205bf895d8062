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
    // `parallelismFirst` is PARAMETERIZED (env SPARK_GRAFT_AQE_PARALLELISM
    // _FIRST, default = Spark's own default `true`): `false` coalesces
    // every post-shuffle stage to the 64 MB advisory size, which reads
    // well in §2.2 byte terms but uses BYTES as a proxy for COMPUTE — in
    // this engine's hot stages (shingle explode → md5 → aggregate) a few
    // MB of post-shuffle rows carry seconds of per-row work, and
    // coalescing them to 1-2 partitions serializes it. Measured on the
    // full 207-query contract at sf0.1/local[32]: `false` cost +13%
    // total (the worst hit, compute-dense queries like x128/x10/x98,
    // +40-65% each; pipeline_total +96%) and bought nothing — the byte-
    // heavy stages it exists for are already sized by
    // `spark.sql.shuffle.partitions` at cluster scale, where partition
    // counts exceed parallelism and the flag never binds. Keep `true`
    // here; a payload-byte-dominated cluster deployment can flip it via
    // the env knob or conf/cluster-smoke.conf.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> {
      val v = sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true")
      require(v == "true" || v == "false",
        s"SPARK_GRAFT_AQE_PARALLELISM_FIRST must be true|false, got '$v'")
      v
    },
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
  def local(cpus: String): SparkSession.Builder = {
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — ad-hoc session conf overrides for
    // same-binary A/B experiments and deployment-specific tuning (e.g.
    // spark.sql.join.preferSortMergeJoin=false on a cluster). Applied
    // LAST, so an experiment can override a pinned knob without a
    // recompile; empty/absent = exactly the pinned baseline.
    // fail FAST on malformed entries (empty key, or no '='): the knob
    // exists for trusted same-binary A/B experiments, where a typo'd
    // entry silently no-op'ing would invalidate the experiment without
    // any signal (ADVICE r15)
    val extra = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        require(kv.contains("="),
          s"SPARK_GRAFT_EXTRA_CONF entry '$kv' is not key=value")
        val Array(k, v) = kv.split("=", 2)
        require(k.trim.nonEmpty,
          s"SPARK_GRAFT_EXTRA_CONF entry '$kv' has an empty key")
        (k.trim, v)
      }
    (adaptiveKnobs ++ extra).foldLeft(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    ) { case (b, (k, v)) => b.config(k, v) }
  }
}
