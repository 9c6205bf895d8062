package graft.flatten

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** T3 online fallback (SURVEY §7.4): the broadcast lookup stays the plan;
  * the rate-limited resolver fires ONLY for distinct missing keys. */
object FallbackCounters {
  // static per-JVM: local[n] executors share the test JVM, so a plain
  // AtomicInteger observes executor-side resolver calls
  val calls = new AtomicInteger(0)
  val failing = new AtomicInteger(0)
}

class OrderFlattenFallbackSpec extends SparkSpec {
  import spark.implicits._

  private def flatFixture = Seq(
    // (order, structure_id, polygon): 13123/7 is IN the lookup (hit);
    // 13120/3 appears TWICE and misses (one resolver call expected);
    // 13101/9 misses and the service has no answer; 99999/7 is not an
    // enriched structure (never resolved); null polygon never resolved
    ("o1", 13123L, Some(7L)),
    ("o2", 13120L, Some(3L)),
    ("o3", 13120L, Some(3L)),
    ("o4", 13101L, Some(9L)),
    ("o5", 99999L, Some(7L)),
    ("o6", 13123L, None)
  ).toDF("delivery_order_id", "destination_structure_id", "destination_polygon")

  private def lookup = Seq((13123L, 7L, "URBAN-A"))
    .toDF("structure_id", "polygon", "segmentation")

  test("fallback resolves distinct missing keys only; hits and non-enriched rows untouched") {
    FallbackCounters.calls.set(0)
    val resolve: OrderFlatten.ResolveSegmentation = { case (sid, poly) =>
      FallbackCounters.calls.incrementAndGet()
      if (sid == 13120L && poly == "3") Some("URBAN-FB") else None
    }
    val out = OrderFlatten.enrichPolygonLabWithFallback(flatFixture, lookup, resolve)
      .select("delivery_order_id", "destination_polygon_lab")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map(
      "o1" -> Some("URBAN-A"),   // broadcast hit — resolver never consulted
      "o2" -> Some("URBAN-FB"),  // fallback hit, both duplicate rows enriched
      "o3" -> Some("URBAN-FB"),
      "o4" -> None,              // service had no answer — stays unenriched
      "o5" -> None,              // not an enriched structure — never resolved
      "o6" -> None))             // null polygon — never resolved
    // ONE call per distinct missing key (13120/3 deduped, o5/o6 excluded)
    assert(FallbackCounters.calls.get() == 2,
      s"expected 2 resolver calls, saw ${FallbackCounters.calls.get()}")
  }

  test("transient resolver failures retry; persistent failures give up and record null") {
    FallbackCounters.failing.set(0)
    spark.conf.set("spark.graft.polygon.fallback.retries", "3")
    try {
      val resolve: OrderFlatten.ResolveSegmentation = { case (sid, _) =>
        if (sid == 13120L) {
          // fails twice, succeeds on the 3rd attempt
          if (FallbackCounters.failing.incrementAndGet() < 3)
            throw new RuntimeException("transient")
          Some("URBAN-FB")
        } else throw new RuntimeException("always down") // 13101 never resolves
      }
      val out = OrderFlatten.enrichPolygonLabWithFallback(flatFixture, lookup, resolve)
        .select("delivery_order_id", "destination_polygon_lab")
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(out("o2") == Some("URBAN-FB") && out("o3") == Some("URBAN-FB"))
      assert(out("o4") == None) // gave up after 3 attempts, row kept, lab null
    } finally spark.conf.unset("spark.graft.polygon.fallback.retries")
  }

  test("fallback output equals plain enrichment when the lookup covers everything") {
    val full = Seq((13123L, 7L, "URBAN-A"), (13120L, 3L, "URBAN-B"), (13101L, 9L, "URBAN-C"))
      .toDF("structure_id", "polygon", "segmentation")
    val never: OrderFlatten.ResolveSegmentation =
      _ => throw new IllegalStateException("resolver must not be consulted")
    val withFb = OrderFlatten.enrichPolygonLabWithFallback(flatFixture, full, never)
      .orderBy("delivery_order_id").collect().toSeq
    val plain = OrderFlatten.enrichPolygonLab(flatFixture, full)
      .orderBy("delivery_order_id").collect().toSeq
    assert(withFb == plain)
  }

  test("HttpSegmentationResolver honours the reference's contained gate (app.py:63-65)") {
    import com.sun.net.httpserver.HttpServer
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/seg", ex => {
      val body = new String(ex.getRequestBody.readAllBytes,
        java.nio.charset.StandardCharsets.UTF_8)
      val resp =
        if (body.contains("\"structure_id\":1")) // contained => enrich
          """{"contained":true,"segmentation":"URBAN-A"}"""
        else if (body.contains("\"structure_id\":2")) // NOT contained => None
          """{"contained":false,"segmentation":"URBAN-B"}"""
        else if (body.contains("\"structure_id\":3")) // flag missing => None
          """{"segmentation":"URBAN-C"}"""
        else """{"contained":true}""" // contained but no segmentation => None
      val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val resolver = OrderFlatten.HttpSegmentationResolver(
        s"http://127.0.0.1:${server.getAddress.getPort}/seg")
      assert(resolver((1L, "p")) == Some("URBAN-A"))
      assert(resolver((2L, "p")) == None) // uncontained answer never enriches
      assert(resolver((3L, "p")) == None)
      assert(resolver((4L, "p")) == None)
    } finally server.stop(0)
  }

  test("resolved dimension is pinned: downstream multi-action consumers re-use one resolution pass") {
    FallbackCounters.calls.set(0)
    val resolve: OrderFlatten.ResolveSegmentation = { case (sid, poly) =>
      FallbackCounters.calls.incrementAndGet()
      Some(s"SEG-$sid-$poly")
    }
    val out = OrderFlatten.enrichPolygonLabWithFallback(flatFixture, lookup, resolve)
    out.count() // action 1
    out.filter(col("destination_polygon_lab").isNotNull).count() // action 2
    // 2 distinct missing keys, resolved ONCE despite two actions — the
    // Persist.cut pin; without it this would be 4
    assert(FallbackCounters.calls.get() == 2,
      s"expected 2 resolver calls across two actions, saw ${FallbackCounters.calls.get()}")
  }

  test("rate limiter spaces calls at the configured rps") {
    spark.conf.set("spark.graft.polygon.fallback.rps", "20") // 50ms spacing
    try {
      val resolve: OrderFlatten.ResolveSegmentation = _ => Some("X")
      // 3 distinct missing keys on one partition => >= 2 waits of 50ms
      val df = Seq(("a", 13120L, Some(1L)), ("b", 13120L, Some(2L)), ("c", 13120L, Some(3L)))
        .toDF("delivery_order_id", "destination_structure_id", "destination_polygon")
      val t0 = System.nanoTime()
      OrderFlatten.enrichPolygonLabWithFallback(df, lookup, resolve).count()
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(elapsedMs >= 100.0, s"3 calls at 20 rps took ${elapsedMs}ms (< 2 x 50ms)")
    } finally spark.conf.unset("spark.graft.polygon.fallback.rps")
  }
}
