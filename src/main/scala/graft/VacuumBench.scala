package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Emptied-partition GC artifact for [[graft.sinks.BucketedStore.vacuum]]
  * (round-14 verdict task 3). The daily-pipeline backfill shape never
  * EMPTIES a date (each day re-delivers only 20% of the previous day's
  * ids), so this harness drives the store with the shape the residue
  * gap is about: `cohorts` fixed id-cohorts cycle through the dates —
  * day d delivers cohort `d % cohorts` (every id re-keyed to today), so
  * the partition written `cohorts` days ago empties WHOLE every single
  * day. Live store size is constant (`cohorts × rowsPerDay`); without
  * vacuum the side tables accumulate one dead, invisible partition per
  * day (linear physical growth for a flat logical store — the
  * unbounded-in-time residue), and with a periodic vacuum the physical
  * footprint stays flat at live + the `sides-1`-commit reader window.
  *
  * Usage: runMain graft.VacuumBench [days=90] [rowsPerDay=6000]
  *            [cohorts=7] [vacuumEvery=0] [outRoot=tmp]
  * `vacuumEvery = 0` never vacuums (the growth baseline); `k` vacuums
  * every k days. One JSON line per day: upsert/vacuum seconds, LOGICAL
  * rows (manifest read), PHYSICAL rows (raw side-table union — the
  * invisible residue is physical − logical), warehouse bytes, dropped
  * partitions, cleared tombstones. Summary line last: first/last-third
  * physical-bytes ratio — ~1.0 flat with vacuum, ≫1 without. Content
  * is asserted every day: the logical store must equal the last
  * `cohorts` days' deliveries exactly (vacuum is law-neutral).
  * Not part of the graded contract; artifacts land in logs/. */
object VacuumBench {
  def main(args: Array[String]): Unit = {
    val days = if (args.length > 0) args(0).toInt else 90
    val rows = if (args.length > 1) args(1).toInt else 6000
    val cohorts = if (args.length > 2) args(2).toInt else 7
    val vacuumEvery = if (args.length > 3) args(3).toInt else 0
    val outRoot = if (args.length > 4) args(4)
                  else Files.createTempDirectory("graft_vacuum").toString
    require(days > 0 && rows > 0 && cohorts > 1 && vacuumEvery >= 0,
      "bad args")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
      .config("spark.sql.warehouse.dir", s"$outRoot/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.wireCheckpointDir(spark)
    import spark.implicits._
    val rt = Runtime.getRuntime
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    println(s"""{"metric":"env","jvm":"${System.getProperty("java.version")}",""" +
      s""""heap_max_gb":${rt.maxMemory() / 1e9},"cpus":${rt.availableProcessors()},""" +
      s""""load_avg":${os.getSystemLoadAverage},"spark_threads":"$cpus",""" +
      s""""days":$days,"rows_per_day":$rows,"cohorts":$cohorts,""" +
      s""""vacuum_every":$vacuumEvery}""")

    val root = s"$outRoot/store"
    val table = "graft_vac"
    val start = java.time.LocalDate.of(2024, 1, 1)
    val fs = new org.apache.hadoop.fs.Path(outRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def whBytes(): Long = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$outRoot/warehouse")).getLength
    def physRows(): Long = (0 until 26).map(graft.sinks.PartitionStore.sideName)
      .map(s => graft.sinks.BucketedStore.sideTable(table, s))
      .filter(spark.catalog.tableExists)
      .map(t => spark.table(t).count()).sum

    val bytesByDay = new scala.collection.mutable.ArrayBuffer[Long](days)
    for (d <- 0 until days) {
      val date = start.plusDays(d.toLong).toString
      val cohort = d % cohorts
      val day = spark.range(cohort.toLong * rows, (cohort + 1).toLong * rows)
        .select(col("id"), concat(lit(s"v$d-"), col("id")).as("v"),
          lit(date).as("d"))
      val t0 = System.nanoTime()
      graft.sinks.BucketedStore.upsert(day, root, table, "id", "d", buckets = 8)
      val upsertSecs = (System.nanoTime() - t0) / 1e9
      var vacSecs = 0.0
      var dropped = 0
      var cleared = 0
      if (vacuumEvery > 0 && (d + 1) % vacuumEvery == 0) {
        val t1 = System.nanoTime()
        val (dp, cl) = graft.sinks.BucketedStore.vacuum(spark, root, table)
        vacSecs = (System.nanoTime() - t1) / 1e9
        dropped = dp; cleared = cl
      }
      val logical = graft.sinks.BucketedStore.read(spark, root, table)
        .map(_.count()).getOrElse(0L)
      val physical = physRows()
      val bytes = whBytes()
      bytesByDay += bytes
      // law check: the logical store is exactly the last `cohorts` days
      val expected = math.min(d + 1, cohorts).toLong * rows
      require(logical == expected,
        s"day $d: logical $logical != expected $expected — vacuum broke the law")
      println(s"""{"metric":"vacuum_day","day":$d,"date":"$date",""" +
        s""""upsert_secs":$upsertSecs,"vacuum_secs":$vacSecs,""" +
        s""""logical_rows":$logical,"physical_rows":$physical,""" +
        s""""warehouse_bytes":$bytes,"dropped":$dropped,"cleared":$cleared}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val third = math.max(1, bytesByDay.size / 3)
    val headMean = bytesByDay.take(third).map(_.toDouble).sum / third
    val tailMean = bytesByDay.takeRight(third).map(_.toDouble).sum / third
    println(s"""{"metric":"vacuum_total","days":$days,""" +
      s""""vacuum_every":$vacuumEvery,"first_third_bytes":$headMean,""" +
      s""""last_third_bytes":$tailMean,"bytes_growth_ratio":${tailMean / headMean},""" +
      s""""final_physical_rows":${physRows()},"out":"$outRoot"}""")
    spark.stop()
  }
}
