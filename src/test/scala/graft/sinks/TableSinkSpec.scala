package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TableSinkSpec extends SparkSpec {
  import spark.implicits._

  test("S9: appendTable creates if needed, then appends (CREATE_IF_NEEDED + WRITE_APPEND)") {
    val t = "graft_test_sink"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    TableSink.appendTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    TableSink.appendTable(Seq((3L, "c")).toDF("id", "v"), t)
    assert(spark.table(t).count() == 3)
    TableSink.overwriteTable(Seq((9L, "z")).toDF("id", "v"), t)
    assert(spark.table(t).collect().map(_.getLong(0)).toSeq == Seq(9L))
    spark.sql(s"DROP TABLE $t")
  }

  test("S2: day-partitioned write produces date directories + pruning scan") {
    val out = Files.createTempDirectory("graft_sink").toString
    val df = Seq(
      (1L, "2024-01-15"), (2L, "2024-01-15"), (3L, "2024-01-16")
    ).toDF("id", "ingest_date")
    TableSink.writeDayPartitioned(df, "ingest_date", out)
    assert(new java.io.File(s"$out/ingest_date=2024-01-15").exists())
    val read = spark.read.parquet(out).filter(col("ingest_date") === "2024-01-15")
    assert(read.count() == 2)
    // partition filter must prune, not scan-and-filter
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && !plan.contains("PushedFilters: [IsNotNull(ingest_date)"))
  }

  test("santiagoDate buckets a UTC instant into the America/Santiago day") {
    // 2024-01-15 02:30 UTC = 2024-01-14 23:30 in Santiago (UTC-3, summer)
    val df = Seq("2024-01-15 02:30:00").toDF("ts")
      .select(TableSink.santiagoDate(col("ts").cast("timestamp")).as("d"))
    assert(df.collect().head.getDate(0).toString == "2024-01-14")
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("id", "va")
    val b = (1L to 1000L).map(i => (i, s"b$i")).toDF("id", "vb")
    TableSink.writeBucketed(a, "graft_bkt_a", "id", buckets = 4)
    TableSink.writeBucketed(b, "graft_bkt_b", "id", buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE graft_bkt_a")
      spark.sql("DROP TABLE graft_bkt_b")
    }
  }
}
