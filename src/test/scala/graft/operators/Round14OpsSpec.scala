package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-14 fidelity items: the production Gear CDC fingerprint behind
  * `gear = true` (default md5 path stays the oracle surface — x104/x105
  * untouched by construction). */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  private def binFrame(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "content")
      .withColumn("meta", struct(length(col("content")).cast("long").as("n_bytes")))

  private def gearCuts(bytes: Array[Byte], window: Int, mask: Int): Seq[Long] = {
    val df = binFrame(Seq((1L, bytes)))
    df.select(graft.GraftFunctions.cdcCuts(df, col("content"), window, mask,
        gear = true).as("c"))
      .collect().head.getSeq[Long](0)
  }

  test("gear cuts match an independent model of the rolling hash, and differ from the md5 grid") {
    val rnd = new scala.util.Random(7L)
    val bytes = Array.fill(4096)(rnd.nextInt(256).toByte)
    // independent reference loop over the SAME published table — pins the
    // (h << 1) + G[b] recurrence, the unsigned modulus, the [window, nb)
    // offset contract, and the leading 0 sentinel
    val expected = {
      val out = scala.collection.mutable.ArrayBuffer(0L)
      var h = 0L
      for (i <- bytes.indices) {
        h = (h << 1) + graft.functions.expr.CdcCuts.gearTable(bytes(i) & 0xff)
        val pos = i + 1
        if (pos >= 8 && pos < bytes.length &&
            java.lang.Long.remainderUnsigned(h, 64) == 0L) out += pos.toLong
      }
      out.toSeq
    }
    val got = gearCuts(bytes, 8, 64)
    assert(got == expected)
    assert(got.size > 10, s"implausibly few cuts (${got.size}) for 4 KiB at mask 64")
    // and the default fingerprint is a DIFFERENT grid (same contract)
    val df = binFrame(Seq((1L, bytes)))
    val md5Cuts = df.select(graft.GraftFunctions.cdcCuts(df, col("content"), 8, 64)
        .as("c")).collect().head.getSeq[Long](0)
    assert(md5Cuts != got)
  }

  test("gear resync fuzz: a front insertion stops perturbing cuts 64 bytes downstream") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 5) {
      val n = 1500 + rnd.nextInt(1500)
      val orig = Array.fill(n)(rnd.nextInt(256).toByte)
      val k = 1 + rnd.nextInt(40)
      val ins = Array.fill(k)(rnd.nextInt(256).toByte)
      val mod = ins ++ orig
      val cutsOrig = gearCuts(orig, 8, 64)
      val cutsMod = gearCuts(mod, 8, 64)
      // h at pos depends only on the last 64 bytes (the << 1 shifts older
      // contributions out of the long), so past insertion + 64 the cut
      // sets coincide EXACTLY, shifted by k — the resync property CDC
      // exists for, as a deterministic equality, not a similarity score
      val tailOrig = cutsOrig.filter(_ >= 64L).map(_ + k)
      val tailMod = cutsMod.filter(_ >= k + 64L)
      assert(tailMod == tailOrig,
        s"trial $trial (n=$n, k=$k): tail cuts diverged after resync point")
    }
  }

  test("gear cdcChunks: chunks tile the payload exactly; cut rate tracks n/mask") {
    val rnd = new scala.util.Random(11L)
    val bytes = Array.fill(20000)(rnd.nextInt(256).toByte)
    val chunks = Multimodal.cdcChunks(binFrame(Seq((1L, bytes))),
        window = 8, mask = 64, maxChunk = 256, gear = true)
      .orderBy("off_bytes").collect()
    // contiguous tiling: offsets start at 0, each chunk ends where the
    // next begins, total bytes = payload bytes
    assert(chunks.head.getLong(1) == 0L)
    chunks.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) + a.getLong(2) == b.getLong(1), "gap in chunk tiling")
      case _ =>
    }
    assert(chunks.map(_.getLong(2)).sum == bytes.length.toLong)
    // expected cuts ~ n/mask = 312; allow a wide Poisson envelope, plus
    // maxChunk splits only ADD chunks
    assert(chunks.length >= 150 && chunks.length <= 700,
      s"cut rate implausible: ${chunks.length} chunks for 20 kB at mask 64")
  }

  test("gear default off: cdcChunks without the flag is byte-identical to the oracle md5 path") {
    val rnd = new scala.util.Random(3L)
    val bytes = Array.fill(2048)(rnd.nextInt(256).toByte)
    val bin = binFrame(Seq((1L, bytes)))
    val a = Multimodal.cdcChunks(bin).orderBy("off_bytes").collect().toSeq
    val b = Multimodal.cdcChunks(bin, gear = false).orderBy("off_bytes").collect().toSeq
    assert(a == b)
  }
}
