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
}
