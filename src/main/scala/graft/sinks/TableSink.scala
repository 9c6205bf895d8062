package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** S2/S9: sinks.
  *
  * S9 (WriteToBigQuery with CREATE_IF_NEEDED + WRITE_APPEND,
  * 1_run_main_table_pipeline.py:125-130) maps to catalog tables:
  * `saveAsTable` creates-if-needed with the frame's explicit schema, append
  * mode streams batches in. The reference's STREAMING_INSERTS for batch
  * loads is an antipattern (SURVEY §4.2 #4) — file-based parquet appends
  * replace it.
  *
  * S2 (one GCS JSON object per day, app.py:122-133) maps to a
  * day-partitioned write: `partitionBy(ingest_date)` gives the same
  * `date=.../` layout with partition pruning for free (SURVEY §1.2).
  */
object TableSink {

  /** S9: append into a catalog table, creating it if needed. */
  def appendTable(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).saveAsTable(table)

  /** S9 overwrite variant (the work-table finalize, Q18). */
  def overwriteTable(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).saveAsTable(table)

  /** S2: day-partitioned lake write. `dateCol` becomes the physical
    * partition key (directory per day, America/Santiago bucketing is the
    * caller's concern per SURVEY §1.3's timezone decision). */
  def writeDayPartitioned(df: DataFrame, dateCol: String, path: String,
                          format: String = "parquet"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(dateCol)
      .format(format)
      .save(path)

  /** Partition-level delta upsert into a day-partitioned master — the
    * delta-only write path the 90-day backfill audit showed plain
    * parquet needs: the chained full-history merge rewrites EVERY
    * partition every day (measured 22.5 µs per history row per day),
    * while a day's upsert only ever CHANGES the partitions holding
    * today's rows and the old rows today re-delivers. This rewrites
    * exactly those:
    *
    *   1. affected dates = `day`'s own dates ∪ the dates of history
    *      rows whose key today updates (one column-pruned (key, date)
    *      scan of the master + a broadcast join against today's keys —
    *      the only O(history) READ left, and it reads two columns, not
    *      rows; a key-bucketed layout or table-format index removes
    *      even that);
    *   2. keep = affected partitions' rows minus updated keys
    *      (partition-pruned scan — `PartitionFilters`, not a full pass);
    *   3. dynamic-partition-overwrite of keep ∪ day — untouched
    *      partitions' files are never rewritten;
    *   4. affected partitions that end up EMPTY (every row they held
    *      was re-delivered under a new date) are deleted explicitly —
    *      dynamic overwrite only replaces partitions present in the
    *      output, so without this step their stale files would survive.
    *
    * Upsert law is identical to [[graft.operators.Relational.upsert]]:
    * update rows win wholesale, unmatched history survives
    * (spec-pinned equal to the chained full merge, PipelineSpec).
    * Like every plain-parquet overwrite here, the swap is NOT
    * transactional — production wants the SnapshotStore A/B rotation or
    * a transactional table format around it; this is the WRITE-VOLUME
    * shape, measured by BackfillBench's delta mode. */
  def upsertDayPartitions(dayRows: DataFrame, masterDir: String,
                          key: String, dateCol: String): Unit = {
    val spark = dayRows.sparkSession
    // materialized: the write below overwrites partitions the plan reads
    val day = graft.Persist.cut(dayRows)
    val masterPath = new org.apache.hadoop.fs.Path(masterDir)
    val fs = masterPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // first day: no master yet (missing dir, or an existing-but-empty one)
    if (!fs.exists(masterPath) || fs.listStatus(masterPath).isEmpty) {
      day.write.mode(SaveMode.Overwrite).partitionBy(dateCol).parquet(masterDir)
      return
    }
    val hist = spark.read.parquet(masterDir)
    val ids = day.select(col(key)).distinct()
    val affRaw = hist.join(broadcast(ids), key).select(col(dateCol))
      .unionByName(day.select(col(dateCol)))
      .distinct().collect().map(_.get(0)) // bounded: one row per affected DAY
    // NULL dates are first-class: isin(null) never matches (three-valued
    // logic), so a null-date partition would silently escape the rewrite
    // and a re-delivered key's old row would survive as a duplicate (the
    // round-12 advice finding). Spark's partitioned writes spell the null
    // partition __HIVE_DEFAULT_PARTITION__; step 4 must too.
    val affNonNull = affRaw.filter(_ != null)
    def inAffected(c: org.apache.spark.sql.Column) = {
      val base = if (affNonNull.nonEmpty) c.isin(affNonNull: _*) else lit(false)
      if (affNonNull.length != affRaw.length) base || c.isNull else base
    }
    val keep = hist.filter(inAffected(col(dateCol)))
      .join(broadcast(ids), Seq(key), "left_anti")
    // Persist.cut because the write below overwrites partitions the plan
    // reads. CLUSTER CAVEAT: the default cut is localCheckpoint, whose
    // blocks are non-reliable — losing an executor mid-overwrite
    // recomputes from lineage, which now reads the half-overwritten
    // master (invisible on local[n]). Production runs set
    // spark.graft.persist.mode=reliable (df.checkpoint to the wired
    // checkpoint dir) or use [[PartitionStore]], whose staged sides
    // never overlap what the plan reads.
    val out = graft.Persist.cut(keep.unionByName(day))
    out.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dateCol).parquet(masterDir)
    // step 4: drop affected partitions the output no longer carries —
    // dir names spelled exactly as Spark's partitioned write escapes them
    val outDates = out.select(col(dateCol)).distinct().collect()
      .map(_.get(0)).toSet
    affRaw.filterNot(outDates).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$masterDir/$dateCol=${PartitionStore.dirName(d)}"), true)
    }
  }

  /** [[upsertDayPartitions]] over the S9 BUCKETED layout — the
    * composition the round-12 verdict called for: the master lives as a
    * day-partitioned, `key`-bucketed+sorted catalog table
    * ([[writeBucketed]]'s layout plus day partitions) and the day's
    * rows land first in a small bucketed staging table
    * (`<table>__day`), so the two O(history)-side joins of the delta —
    * the affected-dates probe and the keep-side anti-join — are
    * sort-merge joins with ZERO exchange (plan-pinned by PlanSpec with
    * the broadcast escape hatch closed: the shape a 100 TB master
    * forces). The probe additionally carries a day-key RANGE pregate
    * (min/max of today's keys — a correct superset of the equi-join's
    * match set in the same ordering): with in-bucket `sortBy(key)`
    * files, parquet row-group min/max stats prune the probe's READ to
    * the key range today actually touches, so under a rolling-window
    * key pattern the probe cost stays ~flat as history grows
    * (BackfillBench `bucketed` mode) where the plain variant's probe
    * scans every history (key, date) daily.
    *
    * Affected partitions swap via a dynamic-partition-overwrite INSERT
    * (only partitions present in the output rewrite — the session conf
    * is set/restored here because `insertInto` ignores the writer-level
    * option); emptied partitions drop via ALTER TABLE DROP PARTITION
    * (metadata + data, managed table). Upsert law identical to the
    * plain variant; same non-transactional caveat — [[PartitionStore]]
    * is the transactional answer. `dateCol` must be NON-NULL
    * throughout: checked on the day frame (typed DDL partition values
    * have no null spelling), inductive for the table; the plain and
    * [[PartitionStore]] variants handle null dates first-class. */
  def upsertDayPartitionsBucketed(dayRows: DataFrame, table: String,
                                  key: String, dateCol: String,
                                  buckets: Int): Unit = {
    val spark = dayRows.sparkSession
    val day = graft.Persist.cut(dayRows)
    require(day.filter(col(dateCol).isNull).isEmpty,
      s"$dateCol must be non-null for the bucketed delta (see scaladoc)")
    if (!spark.catalog.tableExists(table)) {
      day.write.mode(SaveMode.Overwrite)
        .partitionBy(dateCol).bucketBy(buckets, key).sortBy(key)
        .saveAsTable(table)
      return
    }
    val dayTable = s"${table}__day"
    day.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key).saveAsTable(dayTable)
    val (probe, keepOf) = bucketedDeltaPlan(spark, table, dayTable, key, dateCol)
    val dayT = spark.table(dayTable)
    val affDates = probe.unionByName(dayT.select(col(dateCol)))
      .distinct().collect().map(_.get(0)) // bounded: one row per affected DAY
    val keep = keepOf(col(dateCol).isin(affDates: _*))
    val histCols = spark.table(table).columns.map(col)
    // materialized: the insert below overwrites partitions the plan
    // reads. Same cluster caveat as the plain variant: the default cut
    // is a non-reliable localCheckpoint, so an executor lost mid-insert
    // recomputes from lineage over the half-overwritten table — set
    // spark.graft.persist.mode=reliable on a real cluster, or use
    // [[BucketedStore]], which stages onto sides the plan never reads.
    val out = graft.Persist.cut(
      keep.select(histCols: _*).unionByName(dayT.select(histCols: _*)))
    val owmKey = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(owmKey)
    spark.conf.set(owmKey, "dynamic")
    try out.write.mode(SaveMode.Overwrite).insertInto(table)
    finally prior match {
      case Some(v) => spark.conf.set(owmKey, v)
      case None => spark.conf.unset(owmKey)
    }
    val outDates = out.select(col(dateCol)).distinct().collect()
      .map(_.get(0)).toSet
    // partition value quoted as a SQL string literal (backslash +
    // single-quote escaped): the signature accepts any dateCol type, and
    // an unescaped quote in a string-typed value would break the DDL —
    // the round-13 advice finding
    def sqlLit(d: Any) =
      "'" + d.toString.replace("\\", "\\\\").replace("'", "\\'") + "'"
    affDates.filterNot(outDates).foreach { d =>
      spark.sql(
        s"ALTER TABLE $table DROP IF EXISTS PARTITION ($dateCol=${sqlLit(d)})")
    }
  }

  /** The bucketed delta's two O(history)-side frames — the
    * affected-dates probe (day-key range pregate + bucketed equi-join,
    * column-pruned to (key, dateCol)) and the keep-side anti-join
    * builder — factored out so [[upsertDayPartitionsBucketed]] and
    * PlanSpec's exchange-free pin run the SAME plans. */
  def bucketedDeltaPlan(spark: org.apache.spark.sql.SparkSession,
                        table: String, dayTable: String,
                        key: String, dateCol: String)
      : (DataFrame, org.apache.spark.sql.Column => DataFrame) = {
    val hist = spark.table(table)
    val ids = spark.table(dayTable).select(col(key)).distinct()
    val mm = spark.table(dayTable).agg(min(col(key)), max(col(key))).head()
    val pregate =
      if (mm.isNullAt(0)) lit(false) // empty day: probe matches nothing
      else col(key).between(lit(mm.get(0)), lit(mm.get(1)))
    val probe = hist.select(col(key), col(dateCol)).filter(pregate)
      .join(ids, Seq(key)).select(col(dateCol))
    val keepOf = (inAffected: org.apache.spark.sql.Column) =>
      hist.filter(inAffected).join(ids, Seq(key), "left_anti")
    (probe, keepOf)
  }

  /** Derive the Santiago-zone ingest date from a timestamp column —
    * the reference's day bucketing (app.py:125,138; SURVEY §7.4). */
  def santiagoDate(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_date(from_utc_timestamp(ts, "America/Santiago"))

  /** Range-clustered parquet layout for data skipping: rows are
    * range-partitioned into `files` contiguous, DISJOINT key ranges and
    * sorted within each — so parquet's per-rowgroup min/max statistics
    * become tight and a pushed-down range/point predicate skips whole
    * rowgroups (and, under manifest-tracking table formats, whole files).
    * The unsorted default interleaves keys across every file, making
    * every min/max span the whole domain — stats that prune nothing.
    * This is the scan-side complement to [[writeBucketed]]: bucketing
    * kills the JOIN exchange, range-clustering kills the FILTER scan.
    * Cost: one range exchange (sampling pass + shuffle) at write time. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  files: Int): Unit = {
    val cols = sortCols.map(org.apache.spark.sql.functions.col)
    df.repartitionByRange(files, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Z-order (Morton) clustered layout — [[writeSorted]] for TWO filter
    * dimensions at once. A single-column sort makes that column's
    * per-file min/max tight and leaves every OTHER column's stats
    * spanning the full domain (filters on it prune nothing); interleaving
    * the bits of both keys into one Morton value and range-clustering on
    * it keeps every file inside a small RECTANGLE of the (a, b) space, so
    * predicates on EITHER dimension skip most files — the multi-dimension
    * data-skipping layout lakehouse engines call OPTIMIZE ZORDER BY.
    *
    * Both columns must be NON-NEGATIVE ints bounded by 2^31 (interleaving
    * is positional — rank/bucketize skewed or signed domains first, e.g.
    * via [[graft.operators.Relational.quantileBuckets]], which also
    * equalizes the two dimensions' resolutions). The z-value is a pure
    * bit expression (codegen'd, no UDF) and is DROPPED before the write —
    * projection preserves the clustered order, so the files keep the
    * layout without leaking a helper column. Cost: one range exchange,
    * same as [[writeSorted]]. */
  def writeZOrder(df: DataFrame, path: String, colA: String, colB: String,
                  files: Int): Unit = {
    val z = zValue(col(colA), col(colB))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** 62-bit Morton interleave of two 31-bit non-negative ints: bit j of
    * `a` lands at 2j, bit j of `b` at 2j+1. Pure shift/mask/add chain —
    * stays in whole-stage codegen. */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 31).map { j =>
      shiftleft(shiftright(a.cast("long"), j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(b.cast("long"), j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)

  /** Bucketed catalog table: rows hash-partitioned AND sorted by `key`
    * into `buckets` files per partition. Joins/aggregations between tables
    * bucketed on the same key with the same bucket count need NO exchange
    * — this is the production layout for the master/work frames at 100 TB
    * (SURVEY §7.4 "MERGE without Delta": only the daily delta shuffles). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Small-file compaction — the maintenance pass every append-heavy
    * lake needs at scale: a year of day-partitioned micro-batch appends
    * leaves thousands of KB-sized files per directory, and at 100 TB the
    * NameNode/listing pressure plus one task per tiny file dominates scan
    * cost long before the bytes do. Rewrites `path` into
    * `ceil(totalBytes / targetBytes)` files (file count derives from the
    * MEASURED on-disk footprint, so compaction is idempotent: re-running
    * on an already-compact directory keeps the same file count).
    *
    * The rewrite round-robins rows (`repartition(n)` with no columns —
    * no range sampling, no key skew: equal-sized output files by
    * construction); callers who also want clustering should instead
    * re-run [[writeSorted]]/[[writeZOrder]], which subsume compaction.
    * The swap (write tmp → delete → rename) is the LOCAL/HDFS analogue
    * of a transactional replace; under concurrent readers use
    * [[SnapshotStore.compact]] (A/B rotation — readers
    * never see a half-swapped directory) or a manifest-tracking table
    * format's rewrite-files commit — the compaction plan itself is
    * identical. Returns the output file count. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hPath).getLength
    val files = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    spark.read.parquet(path).repartition(files)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(hPath, true)
    if (!fs.rename(tmp, hPath))
      throw new java.io.IOException(s"compaction swap failed for $path")
    files
  }
}
