package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main for round-15 optimization work (not part of the
  * driver contract; removed or kept harmlessly). Times phases of the
  * streaming twins and the CC loop so optimization targets are measured,
  * not guessed. */
object ProbeR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
      .config(graft.sources.Tables.nanosAsLongKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
    }

    // --- pipeline (Main.run) timing ------------------------------------
    if (sys.env.get("PROBE_PIPELINE").contains("1")) {
      val in = java.nio.file.Files.createTempDirectory("probe_pipe_in")
      val out = java.nio.file.Files.createTempDirectory("probe_pipe_out")
      PipelineFixture.write(in, 6000)
      for (r <- 1 to 4)
        time(s"pipeline Main.run round $r") { Main.run(spark, in.toString, out.toString) }
      val in2 = java.nio.file.Files.createTempDirectory("probe_pipe_in2")
      val out2 = java.nio.file.Files.createTempDirectory("probe_pipe_out2")
      PipelineFixture.write(in2, 20000)
      for (r <- 1 to 4)
        time(s"pipeline peak Main.run round $r") { Main.run(spark, in2.toString, out2.toString) }
      spark.stop(); return
    }

    // --- w05 phase breakdown -------------------------------------------
    for (round <- 1 to 7) {
      val sp = round match {
        case 3 | 4 => "4"
        case 5 | 6 => "1"
        case _ => cpus
      }
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      println(s"-- w05 round $round (shuffle.partitions=$sp) --")
      val e = graft.sources.Tables(spark, sfDir, "events")
        .select("event_id", "ts", "event_type", "value")
      val root = java.nio.file.Files.createTempDirectory("probe_w05")
      val streamDir = root.resolve("stream")
      java.nio.file.Files.createDirectories(streamDir)
      def land(df: org.apache.spark.sql.DataFrame, name: String, mtimeMs: Long): Unit = {
        import java.nio.file.{Files, StandardCopyOption}
        val tmp = root.resolve(name + "_tmp")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val listing = Files.list(tmp)
        val part = try listing.filter { p =>
          val f = p.getFileName.toString
          f.startsWith("part-") && f.endsWith(".parquet")
        }.findFirst.get finally listing.close()
        val dst = streamDir.resolve(name)
        Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      time("w05 land 3 fixture files") {
        land(e.filter(col("event_id") % 10 >= 2), "00_ontime.parquet", 1000000L)
        land(e.filter(col("event_id") % 10 === 1), "01_advance.parquet", 2000000L)
        land(e.filter(col("event_id") % 10 === 0), "02_replay.parquet", 3000000L)
      }
      val stream = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
      val sink = "probe_w05_" + round
      val q = time("w05 stream start..awaitTermination") {
        val q0 = graft.streaming.EventStream.hourlyCounts(stream)
          .writeStream.format("memory").queryName(sink)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q0.awaitTermination(); q0
      }
      time("w05 fold+collect") {
        spark.table(sink).select(col("h"), col("event_type"), col("c"))
          .orderBy("h", "event_type").collect()
      }
      spark.catalog.dropTempView(sink)
      q.stop()
    }

    // --- CC loop iteration count on sf0.1 ------------------------------
    val d = graft.sources.Tables(spark, sfDir, "documents")
    val pairs = time("lshCandidatePairs build+count") {
      val p = graft.operators.Dedup.lshCandidatePairs(d, n = 3, k = 12, bands = 4)
      val c = p.count(); println(s"[probe] pairs = $c"); p
    }
    time("componentMembership (full CC loop)") {
      graft.operators.Dedup.componentMembership(pairs).foreach { case (lbls, conv) =>
        println(s"[probe] cc converged=$conv nodes=${lbls.count()}")
      }
    }
    time("minhashSignatures count") {
      graft.operators.Dedup.minhashSignatures(d, 3, 12).count()
    }
    spark.stop()
  }
}
