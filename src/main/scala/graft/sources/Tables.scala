package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet fixture catalog (TESTDATA.md / FIXTURES.md §B).
  *
  * One parquet file per table under `dir`. Reads are plain scans: column
  * pruning and predicate pushdown are left to Catalyst, so callers should
  * select/filter as early as possible — at 100 TB the scan is the dominant
  * cost and `PushedFilters`/`ReadSchema` must reach the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session config required to read the `events` fixture: its `ts` column
    * is INT64 TIMESTAMP(NANOS), which Spark 4 rejects unless surfaced as a
    * raw long. [[apply]] then converts ns→µs with integer division —
    * truncation toward zero for positive epochs, matching how DuckDB (the
    * oracle) narrows the same column to µs TIMESTAMP. */
  val nanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      // legacy ns fixture surfaced as raw long (nanosAsLongKey): ns→µs by
      // integer division, truncation matching DuckDB's narrowing
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // µs fixture written without isAdjustedToUTC (pyarrow default) reads
      // as TIMESTAMP_NTZ; normalize to TIMESTAMP so downstream epoch
      // arithmetic (unix_micros etc.) type-checks. Sessions run UTC, so
      // the cast reinterprets the same microsecond value, bit-for-bit —
      // exactly how DuckDB reads the identical column as TIMESTAMP.
      case TimestampNTZType => df.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => df
    }
  }
}
