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

  test("S1: httpFetchPage drives the full extract against a real local socket") {
    import com.sun.net.httpserver.HttpServer
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/orders", ex => {
      val n = requests.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes, java.nio.charset.StandardCharsets.UTF_8)
      // first hit fails with a 500 so the adapter must surface an error the
      // 3-retry policy absorbs; the reference request body must round-trip
      val resp =
        if (n == 1) """{"error":"boom"}"""
        else if (body.contains(""""page_number":1"""))
          """{"items":[{"delivery_order_id":"H-1"},{"delivery_order_id":"H-2"}],"total":3}"""
        else """{"items":[{"delivery_order_id":"H-3"}],"total":3}"""
      val code = if (n == 1) 500 else 200
      assert(body.contains(""""page_size":100""") && body.contains(""""date_type":9"""))
      val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val uri = java.net.URI.create(
        s"http://127.0.0.1:${server.getAddress.getPort}/orders")
      val fetch = Extract.httpFetchPage(uri, headers = Map("X-Auth" -> "t"))
      val out = Files.createTempDirectory("graft_http").toString
      val day = LocalDate.parse("2024-03-01")
      val res = Extract.run(fetch, day, day, out)
      assert(res.map(r => (r.orders, r.failed)) == Seq((3, false)))
      val landed = Files.readString(Paths.get(out, day.toString, s"$day.json"))
      assert(landed.contains("H-1") && landed.contains("H-3"))
      assert(requests.get() == 3) // 1 failed + 2 pages
    } finally server.stop(0)
  }

  test("O2: authenticatedTrigger sends a per-attempt Bearer token and retries through failures") {
    import com.sun.net.httpserver.HttpServer
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val tokens = new java.util.concurrent.atomic.AtomicInteger(0)
    val seenAuth = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/extract", ex => {
      val n = hits.incrementAndGet()
      seenAuth.add(ex.getRequestHeaders.getFirst("Authorization"))
      val resp = if (n == 1) """{"err":"cold start"}""" else """{"ok":true}"""
      val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(if (n == 1) 503 else 200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val uri = java.net.URI.create(
        s"http://127.0.0.1:${server.getAddress.getPort}/extract")
      // provider mints a FRESH token per attempt (identity tokens expire)
      val provider: Extract.TokenProvider =
        aud => s"tok-$aud-${tokens.incrementAndGet()}"
      val body = Extract.authenticatedTrigger(uri, "https://extract.svc",
        provider, retries = 3)
      assert(body == """{"ok":true}""")
      assert(hits.get() == 2) // 503 then success — retried, then stopped
      assert(tokens.get() == 2, "token must be minted per attempt, not cached")
      assert(seenAuth.toArray.toSeq == Seq(
        "Bearer tok-https://extract.svc-1", "Bearer tok-https://extract.svc-2"))
      // exhausted retries rethrow (the DAG's task-failed semantics)
      val down = java.net.URI.create(
        s"http://127.0.0.1:${server.getAddress.getPort}/nope")
      intercept[Exception] {
        Extract.authenticatedTrigger(down, "a", _ => "t", retries = 2)
      }
    } finally server.stop(0)
  }
}
