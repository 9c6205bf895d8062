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

  test("manifest v2 is self-describing: layout params persist, contradicting args are rejected, and a defaulting caller inherits the persisted sides cycle") {
    val root = Files.createTempDirectory("graft_bstore_meta").toString
    val t = "bstore_meta"
    drop(t)
    try {
      BucketedStore.upsert(Seq((1L, "v1", "2024-07-01")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 4, sides = 3)
      val st = PartitionStore.manifestState(spark, root).get
      assert(st.meta("dateCol") == "d" && st.meta("key") == "id" &&
        st.meta("buckets") == "4" && st.sides.contains(3),
        s"layout params must persist in the manifest header: ${st.meta}")
      // a caller repeating the layout wrong is rejected BEFORE any write
      // (a silent buckets mismatch would break co-bucketing; a wrong
      // key/dateCol would corrupt the law)
      val day2 = Seq((1L, "v2", "2024-07-01")).toDF("id", "v", "d")
      Seq(
        () => BucketedStore.upsert(day2, root, t, "id", "d", buckets = 8),
        () => BucketedStore.upsert(day2, root, t, "v", "d", buckets = 4),
        () => BucketedStore.upsert(day2, root, t, "id", "v", buckets = 4)
      ).foreach { call =>
        val ex = intercept[IllegalArgumentException](call())
        assert(ex.getMessage.contains("layout mismatch"), ex.getMessage)
      }
      // a later caller defaulting sides=0 with the conf UNSET must
      // inherit the persisted 3-cycle, not shorten it to the default 2
      // (the round-14 advice retention break)
      BucketedStore.upsert(day2, root, t, "id", "d", buckets = 4)
      BucketedStore.upsert(Seq((1L, "v3", "2024-07-01")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 4)
      assert(PartitionStore.manifest(spark, root).get("2024-07-01") == "C",
        "defaulting caller must rotate on the persisted 3-cycle")
      assert(content(root, t) == Seq((1L, "v3", "2024-07-01")))
    } finally drop(t)
  }

  test("vacuum reclaims an emptied date's invisible side-table rows only after the sides-1 commit window; live dates' rotation copies survive") {
    val root = Files.createTempDirectory("graft_bstore_vac").toString
    val t = "bstore_vac"
    drop(t)
    def raw(): Long = spark.table(s"${t}__a")
      .unionByName(spark.table(s"${t}__b")).count()
    try {
      BucketedStore.upsert(
        Seq((1L, "a", "2024-08-01"), (2L, "b", "2024-08-01")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2) // epoch 1
      val reader = BucketedStore.read(spark, root, t).get // plans at epoch 1
      BucketedStore.upsert(
        Seq((1L, "a2", "2024-08-02"), (2L, "b2", "2024-08-02")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2) // epoch 2: 08-01 emptied + tombstoned
      assert(raw() == 4 && content(root, t).size == 2,
        "expected the emptied date's rows to linger invisibly pre-vacuum")
      // window not yet passed (0 commits since emptying < sides-1 = 1):
      // vacuum is a no-op and the epoch-1 reader still resolves
      assert(BucketedStore.vacuum(spark, root, t) == (0, 0))
      assert(raw() == 4)
      assert(reader.collect().map(_.getString(1)).sorted.toSeq == Seq("a", "b"),
        "a reader within the retention window must survive vacuum")
      BucketedStore.upsert(Seq((3L, "c", "2024-08-03")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2) // epoch 3: window passed for 08-01
      val (dropped, cleared) = BucketedStore.vacuum(spark, root, t)
      assert(dropped == 1 && cleared == 1, s"($dropped, $cleared)")
      assert(raw() == 3, "emptied date's partition must be gone from the side table")
      assert(content(root, t) == Seq((1L, "a2", "2024-08-02"),
        (2L, "b2", "2024-08-02"), (3L, "c", "2024-08-03")))
      assert(PartitionStore.manifestState(spark, root).get.tombs.isEmpty)
    } finally drop(t)
  }

  test("vacuum drops a side table stranded by an explicit sides shrink, never a live one") {
    val root = Files.createTempDirectory("graft_bstore_shrink").toString
    val t = "bstore_shrink"
    drop(t)
    try {
      val d = "2024-09-01"
      BucketedStore.upsert(Seq((1L, "v1", d)).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2, sides = 3) // A
      BucketedStore.upsert(Seq((1L, "v2", d)).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2) // B (persisted 3-cycle)
      BucketedStore.upsert(Seq((1L, "v3", d)).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2) // C
      // explicit shrink to 2: the date rotates off C; __c is stranded
      BucketedStore.upsert(Seq((1L, "v4", d)).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2, sides = 2)
      assert(PartitionStore.manifestState(spark, root).get.sides.contains(2))
      assert(spark.catalog.tableExists(s"${t}__c"))
      BucketedStore.vacuum(spark, root, t)
      assert(!spark.catalog.tableExists(s"${t}__c"),
        "shrink-stranded side table must drop")
      assert(spark.catalog.tableExists(s"${t}__a") &&
        spark.catalog.tableExists(s"${t}__b"))
      assert(content(root, t) == Seq((1L, "v4", d)))
    } finally drop(t)
  }

  test("vacuum is idempotent and crash-tolerant: an interrupted partition-drop-then-commit re-runs to the same clean state") {
    val root = Files.createTempDirectory("graft_bstore_vaccrash").toString
    val t = "bstore_vaccrash"
    drop(t)
    try {
      BucketedStore.upsert(Seq((1L, "a", "2024-08-01")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2) // epoch 1: 08-01 on side A
      BucketedStore.upsert(Seq((1L, "b", "2024-08-02")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2) // epoch 2: 08-01 emptied + tombstoned
      BucketedStore.upsert(Seq((2L, "c", "2024-08-02")).toDF("id", "v", "d"),
        root, t, "id", "d", buckets = 2) // epoch 3: window passed for 08-01
      // crash simulation: a vacuum that died after dropping the
      // reclaimable partition from the side table but before committing
      // the pruned tombstone set
      spark.sql(
        s"ALTER TABLE ${t}__a DROP IF EXISTS PARTITION (d='2024-08-01')")
      assert(PartitionStore.manifestState(spark, root).get.tombs.keySet ==
        Set("2024-08-01"))
      // readable and law-correct in the crash state
      assert(content(root, t) == Seq((1L, "b", "2024-08-02"),
        (2L, "c", "2024-08-02")))
      // the re-run converges: the catalog drop is idempotent, the
      // orphaned tombstone clears — and a live date's stale rotation
      // copy (tracked) is NOT mistaken for residue
      val (dropped, cleared) = BucketedStore.vacuum(spark, root, t)
      assert(dropped == 0 && cleared == 1, s"($dropped, $cleared)")
      assert(PartitionStore.manifestState(spark, root).get.tombs.isEmpty)
      assert(BucketedStore.vacuum(spark, root, t) == ((0, 0)))
      assert(content(root, t) == Seq((1L, "b", "2024-08-02"),
        (2L, "c", "2024-08-02")))
    } finally drop(t)
  }
}
