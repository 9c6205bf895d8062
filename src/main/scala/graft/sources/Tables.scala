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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
