package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def content(root: String, table: String): Seq[(Long, String, String)] =
    BucketedStore.read(spark, root, table).get.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"),
        r.getAs[Any]("d").toString))
      .sortBy(t => (t._1, t._2)).toSeq

  private def drop(table: String): Unit = Seq("__a", "__b", "__c", "__day")
    .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $table$s"))

  test("upsert law over rotating partitions: updates win wholesale, unmatched history survives, emptied partitions leave the manifest, untouched partitions aren't rewritten") {
    val root = Files.createTempDirectory("graft_bstore").toString
    val t = "bstore_law"
    drop(t)
    try {
      BucketedStore.upsert(
        Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-01")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 4)
      BucketedStore.upsert(
        Seq((3L, "c", "2024-01-02")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 4)
      // 2024-01-01 lives on side A since the first day; capture its files
      val p1 = new java.io.File(s"target/spark-warehouse/${t}__a/d=2024-01-01")
      assert(p1.isDirectory, s"expected live partition dir at $p1")
      val before = p1.listFiles.map(f => f.getName -> f.lastModified).toMap
      // day 3 re-delivers id 3 under a new date (its old partition
      // empties) + a new id 4; 2024-01-01 is NOT affected
      BucketedStore.upsert(
        Seq((3L, "c2", "2024-01-03"), (4L, "e", "2024-01-03")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 4)
      assert(content(root, t) == Seq((1L, "a", "2024-01-01"),
        (2L, "b", "2024-01-01"), (3L, "c2", "2024-01-03"), (4L, "e", "2024-01-03")))
      val m = PartitionStore.manifest(spark, root).get
      assert(m.keySet == Set("2024-01-01", "2024-01-03"),
        s"emptied partition must drop out of the manifest: $m")
      val after = p1.listFiles.map(f => f.getName -> f.lastModified).toMap
      assert(after == before, "unaffected partition was rewritten")
    } finally drop(t)
  }

  test("crash window: a staged-but-uncommitted upsert is invisible; commit flips atomically; an abandoned stage retries cleanly") {
    val root = Files.createTempDirectory("graft_bstore_crash").toString
    val t = "bstore_crash"
    drop(t)
    try {
      BucketedStore.upsert(
        Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 4)
      val old = content(root, t)
      val day = Seq((2L, "b2", "2024-01-03"), (5L, "f", "2024-01-03"))
        .toDF("id", "v", "d")
      // "kill between the idle-side inserts and the commit": every data
      // write ran (idle partitions populated, 2024-01-02 would empty)
      // but the manifest never swapped — readers see the old state
      val staged = BucketedStore.stageUpsert(day, root, t, "id", "d", buckets = 4)
      assert(content(root, t) == old, "uncommitted stage leaked into readers")
      assert(PartitionStore.manifest(spark, root).get.keySet ==
        Set("2024-01-01", "2024-01-02"))
      // the retried run re-stages over the orphaned idle partitions,
      // then commits — one atomic rename later the new state is complete
      val staged2 = BucketedStore.stageUpsert(day, root, t, "id", "d", buckets = 4)
      assert(staged2.newManifest == staged.newManifest)
      staged2.commit()
      assert(content(root, t) == Seq((1L, "a", "2024-01-01"),
        (2L, "b2", "2024-01-03"), (5L, "f", "2024-01-03")))
      assert(PartitionStore.manifest(spark, root).get.keySet ==
        Set("2024-01-01", "2024-01-03"))
    } finally drop(t)
  }

  test("store content equals the chained Relational.upsert full-history merge across overlapping days") {
    val root = Files.createTempDirectory("graft_bstore_eq").toString
    val t = "bstore_eq"
    drop(t)
    try {
      // three days with overlapping key ranges: every day both updates
      // old keys (under new dates) and inserts fresh ones
      val days = Seq(
        (0L until 40L).map(i => (i, s"d0-$i", "2024-02-01")),
        (30L until 70L).map(i => (i, s"d1-$i", "2024-02-02")),
        (60L until 90L).map(i => (i, s"d2-$i", "2024-02-03")))
        .map(_.toDF("id", "v", "d"))
      days.foreach(d => BucketedStore.upsert(d, root, t, "id", "d", buckets = 4))
      val expected = days.tail.foldLeft(days.head)(
          (m, d) => graft.operators.Relational.upsert(m, d, "id"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(content(root, t) == expected)
    } finally drop(t)
  }

  test("consecutive upserts of one partition alternate its side TABLES (the reader-survives-one-swap contract)") {
    val root = Files.createTempDirectory("graft_bstore_ab").toString
    val t = "bstore_ab"
    drop(t)
    try {
      def side() = PartitionStore.manifest(spark, root).get("2024-04-01")
      BucketedStore.upsert(Seq((1L, "a", "2024-04-01")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2)
      val s1 = side()
      // a reader plans against the live side here
      val reader = BucketedStore.read(spark, root, t).get
      BucketedStore.upsert(Seq((1L, "a2", "2024-04-01")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2)
      assert(side() != s1, "rewrite landed on the live side table")
      assert(reader.collect().map(_.getString(1)).toSeq == Seq("a"),
        "reader lost its side across one rotation")
      assert(content(root, t) == Seq((1L, "a2", "2024-04-01")))
    } finally drop(t)
  }

  test("sides=3: a reader's plan survives TWO concurrent upserts; a grown sides setting creates the missing side table on demand") {
    val root = Files.createTempDirectory("graft_bstore_ret").toString
    val t = "bstore_ret"
    drop(t)
    try {
      // store born with the default 2 sides, then the knob grows to 3:
      // the C table must appear on demand and the cycle must lengthen
      BucketedStore.upsert(Seq((1L, "v1", "2024-05-01")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2)
      val reader = BucketedStore.read(spark, root, t).get
      BucketedStore.upsert(Seq((1L, "v2", "2024-05-01")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2, sides = 3)
      BucketedStore.upsert(Seq((1L, "v3", "2024-05-01")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2, sides = 3)
      assert(spark.catalog.tableExists(s"${t}__c"),
        "grown sides must create the missing side table")
      assert(PartitionStore.manifest(spark, root).get("2024-05-01") == "C")
      assert(reader.collect().map(_.getString(1)).toSeq == Seq("v1"),
        "reader lost its side within the 3-side retention window")
      assert(content(root, t) == Seq((1L, "v3", "2024-05-01")))
    } finally drop(t)
  }

  test("an EMPTY day is a committed no-op: same manifest, same content") {
    val root = Files.createTempDirectory("graft_bstore_empty").toString
    val t = "bstore_empty"
    drop(t)
    try {
      BucketedStore.upsert(Seq((1L, "a", "2024-06-01")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2)
      val m1 = PartitionStore.manifest(spark, root).get
      val before = content(root, t)
      BucketedStore.upsert(
        Seq.empty[(Long, String, String)].toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2)
      assert(PartitionStore.manifest(spark, root).get == m1)
      assert(content(root, t) == before)
    } finally drop(t)
  }

  test("DATE-typed dateCol round-trips through manifest keys and partition-pruned reads") {
    val root = Files.createTempDirectory("graft_bstore_date").toString
    val t = "bstore_date"
    drop(t)
    def dt(s: String) = java.sql.Date.valueOf(s)
    try {
      BucketedStore.upsert(
        Seq((1L, "a", dt("2024-03-01")), (2L, "b", dt("2024-03-02")))
          .toDF("id", "v", "d"), root, t, "id", "d", buckets = 2)
      BucketedStore.upsert(
        Seq((1L, "a2", dt("2024-03-03"))).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2)
      assert(content(root, t) == Seq((1L, "a2", "2024-03-03"),
        (2L, "b", "2024-03-02")))
      assert(PartitionStore.manifest(spark, root).get.keySet ==
        Set("2024-03-02", "2024-03-03"))
      // a null date must be rejected up front (typed DDL-less manifest
      // keys have no null spelling — same contract as the bucketed delta)
      val ex = intercept[IllegalArgumentException] {
        BucketedStore.upsert(
          Seq((9L, "z", null: java.sql.Date)).toDF("id", "v", "d"),
          root, t, "id", "d", buckets = 2)
      }
      assert(ex.getMessage.contains("non-null"))
    } finally drop(t)
  }
}
