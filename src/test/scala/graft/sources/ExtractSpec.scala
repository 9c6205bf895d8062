package graft.sources

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import graft.SparkSpec

class ExtractSpec extends SparkSpec {

  private def order(id: String) = s"""{"delivery_order_id":"$id","code":"C-$id"}"""

  // Stub API: 250 orders on day 1 (3 pages), 10 on day 2, day 3 always 500s.
  private val d1 = LocalDate.parse("2024-02-01")
  private val d2 = LocalDate.parse("2024-02-02")
  private val d3 = LocalDate.parse("2024-02-03")
  private val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private val stub: Extract.FetchPage = (day, page) => {
    attempts.merge(s"$day#$page", 1, (a, b) => a + b)
    day match {
      case `d1` =>
        val n = Seq(100, 100, 50)(page - 1)
        Extract.PageResult((1 to n).map(i => order(s"$day-p$page-$i")), 250)
      case `d2` => Extract.PageResult((1 to 10).map(i => order(s"$day-$i")), 10)
      case _ => throw new RuntimeException("HTTP 500")
    }
  }

  test("S1: pagination loops until total; failures retry 3x then record") {
    val out = Files.createTempDirectory("graft_extract").toString
    val results = Extract.run(stub, d1, d3, out).sortBy(_.day.toString)
    assert(results.map(r => (r.orders, r.failed)) ==
      Seq((250, false), (10, false), (0, true)))
    // day-3 page-1 was attempted exactly maxRetries times
    assert(attempts.get(s"$d3#1") == Extract.maxRetries)

    // S2: one JSON array file per day + metadata sidecar (app.py:122-171)
    val day1 = Paths.get(out, d1.toString, s"$d1.json")
    assert(Files.readString(day1).startsWith("[{"))
    val meta = Files.readString(Paths.get(out, d3.toString, s"$d3.metadata.json"))
    assert(meta.contains("\"fallos\":1"))

    // Integration: the landed layout is readable by RawReader — metadata
    // sidecars excluded, all 260 good orders parsed
    val (good, bad) = RawReader.quarantine(RawReader.readOrders(spark, out))
    assert(good.count() == 260)
    assert(bad.count() == 0) // day-3's empty array file parses to zero rows
  }
}
