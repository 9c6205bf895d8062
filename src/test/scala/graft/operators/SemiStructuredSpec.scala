package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemiStructuredSpec extends SparkSpec {
  import spark.implicits._

  // a payload column with every health class: flat objects, a nested
  // value, a null, an array (valid JSON, not an object), and garbage
  private def fixture = Seq(
    (1L, """{"a": 1, "b": "x"}"""),
    (2L, """{"a": 2}"""),
    (3L, """{"a": 2, "c": {"d": 9}}"""),
    (4L, null: String),
    (5L, """[1, 2]"""),
    (6L, """not json""")
  ).toDF("id", "props")

  test("jsonKeyProfile: presence counts/shares over ALL rows, distinct string values") {
    val out = SemiStructured.jsonKeyProfile(fixture, col("props"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    // shares are over all 6 rows (null/malformed included — the gate is
    // jsonHealth's job, the share must not silently re-base)
    assert(out == Seq(
      ("a", 3L, 0.5, 2L),       // values "1","2","2" → 2 distinct
      ("b", 1L, 0.166667, 1L),
      ("c", 1L, 0.166667, 1L))) // nested value is one JSON-text value
  }

  test("jsonHealth: null vs malformed split; arrays and garbage are malformed, objects are not") {
    val out = SemiStructured.jsonHealth(fixture, col("props")).collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) == (6L, 1L, 2L))
    assert(out.getDouble(3) == 0.333333)
  }

  test("jsonKeyDrift: per-bucket share re-bases on the bucket's row count") {
    val df = Seq(
      ("2024-03-01 10:00:00", """{"a": 1}"""),
      ("2024-03-01 11:00:00", """{"a": 1, "b": 2}"""),
      ("2024-03-02 10:00:00", """{"b": 3}"""),
      ("2024-03-02 11:00:00", null: String)
    ).toDF("s", "props").select(col("s").cast("timestamp").as("ts"), col("props"))
    val out = SemiStructured.jsonKeyDrift(df, col("props"), col("ts"), "day")
      .orderBy("bucket", "key").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == Seq(
      ("2024-03-01 00:00:00.0", "a", 2L, 1.0),
      ("2024-03-01 00:00:00.0", "b", 1L, 0.5),
      ("2024-03-02 00:00:00.0", "b", 1L, 0.5))) // day-2 null row still counts in the base
  }

  test("jsonFieldStats: missing/unparseable extractions stay null, mean over present only") {
    val df = Seq(
      ("t1", """{"k": 10}"""), ("t1", """{"k": 11}"""),
      ("t1", """{"other": 5}"""),  // key absent → null extraction
      ("t2", "garbage"),           // malformed → null extraction
      ("t2", null: String)
    ).toDF("event_type", "props")
    val out = SemiStructured.jsonFieldStats(df, col("props"), "$.k",
        col("event_type"))
      .orderBy("grp").collect()
    val t1 = out(0); val t2 = out(1)
    assert((t1.getString(0), t1.getLong(1), t1.getLong(2), t1.getLong(3),
      t1.getLong(4), t1.getDouble(5)) == ("t1", 3L, 2L, 10L, 11L, 10.5))
    assert((t2.getString(0), t2.getLong(1), t2.getLong(2)) == ("t2", 2L, 0L))
    assert(t2.isNullAt(3) && t2.isNullAt(4) && t2.isNullAt(5))
  }

  test("plan shape: key profile is two bounded aggregates + a 1-row broadcast, no window") {
    val plan = SemiStructured.jsonKeyProfile(fixture, col("props"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }
}
