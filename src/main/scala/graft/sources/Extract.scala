package graft.sources

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import scala.util.{Failure, Success, Try}

/** S1-S3: the paged-REST extract stage
  * (extract-ceo-app-repository/extract-app/app.py:100-171) as a driver-side
  * connector. Deliberately NOT a DataSourceV2: the upstream API is
  * inherently sequential-paged per day (page_number cursor, app.py:107), so
  * there is no partition parallelism to expose to Spark — the engine-side
  * contract is simply `spark.read` over what this lands (SURVEY §2.0 S1).
  *
  * Differences from the reference, by design:
  *  - days fetch concurrently (a local thread pool): the reference walks
  *    ~150 days serially in one Flask request (app.py:142-161, DOC:61);
  *  - HTTP is injected as a function, so tests (and this container, which
  *    has no egress) run against a stub while production swaps in a real
  *    client. Retry policy preserved: 3 attempts, then record-and-skip
  *    (app.py:100-120).
  */
object Extract {

  /** One page request: (day, pageNumber) => JSON array string of orders.
    * Mirrors the POST body {date_type:9, date_from, date_to, page_number,
    * page_size:100} (app.py:102-108). */
  type FetchPage = (LocalDate, Int) => PageResult
  final case class PageResult(ordersJson: Seq[String], total: Int)

  final case class DayResult(day: LocalDate, orders: Int, failed: Boolean)

  val pageSize = 100   // app.py:107
  val maxRetries = 3   // app.py:100-120

  /** Production [[FetchPage]] over `java.net.http`: POSTs the reference's
    * page request body (app.py:102-108) to `endpoint` and parses the
    * `{"items": [...], "total": N}` response (app.py:153-156) with the
    * Jackson shipped on Spark's classpath. Throws on non-2xx / malformed
    * JSON so [[fetchWithRetry]]'s 3-attempt record-and-skip policy applies
    * unchanged — the adapter adds transport only, no new failure policy. */
  def httpFetchPage(endpoint: java.net.URI,
                    headers: Map[String, String] = Map.empty,
                    client: java.net.http.HttpClient =
                      // connect timeout: a black-holed endpoint must FAIL so
                      // the retry/record-and-skip policy can engage, never
                      // hang the day's Future forever
                      java.net.http.HttpClient.newBuilder()
                        .connectTimeout(java.time.Duration.ofSeconds(30)).build(),
                    requestTimeout: java.time.Duration =
                      java.time.Duration.ofSeconds(120)): FetchPage = {
    import java.net.http.{HttpRequest, HttpResponse}
    // one mapper per connector, not per page: construction is expensive
    // and the instance is thread-safe for reads across the day futures
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    (day: LocalDate, page: Int) => {
      val body =
        s"""{"date_type":9,"date_from":"$day","date_to":"$day",""" +
          s""""page_number":$page,"page_size":$pageSize,"postgresql":false}"""
      val b = HttpRequest.newBuilder(endpoint)
        .timeout(requestTimeout)
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body))
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} for $day page $page")
      val root = mapper.readTree(resp.body())
      val items = root.path("items")
      require(items.isArray, s"response for $day page $page has no items array")
      // a missing/non-numeric total would read as 0 and silently truncate
      // the day after page 1 — fail loud so the retry policy records it
      require(root.path("total").isNumber, s"response for $day page $page has no numeric total")
      PageResult((0 until items.size).map(i => items.get(i).toString),
        root.path("total").asInt())
    }
  }

  private def fetchWithRetry(fetch: FetchPage, day: LocalDate, page: Int): Try[PageResult] = {
    var last: Try[PageResult] = Failure(new IllegalStateException("unattempted"))
    var attempt = 0
    while (attempt < maxRetries && last.isFailure) {
      last = Try(fetch(day, page))
      attempt += 1
    }
    last
  }

  /** Fetch every page of one day (loop until collected >= total,
    * app.py:147-161); give-up-and-record on persistent failure. */
  def fetchDay(fetch: FetchPage, day: LocalDate): (Seq[String], Boolean) = {
    val collected = Seq.newBuilder[String]
    var n = 0
    var page = 1
    var total = Int.MaxValue
    while (n < total) {
      fetchWithRetry(fetch, day, page) match {
        case Success(r) =>
          collected ++= r.ordersJson
          n += r.ordersJson.size
          total = r.total
          if (r.ordersJson.isEmpty) total = n // defensive: empty page ends the loop
          page += 1
        case Failure(_) => return (collected.result(), true)
      }
    }
    (collected.result(), false)
  }

  /** Fetch a day range into `outDir/yyyy-MM-dd/yyyy-MM-dd.json` (one JSON
    * array file per day, app.py:122-133) + a metadata sidecar per day
    * (app.py:166-171). Days run concurrently. */
  def run(fetch: FetchPage, from: LocalDate, to: LocalDate, outDir: String,
          parallelism: Int = 8,
          timeout: scala.concurrent.duration.Duration =
            scala.concurrent.duration.Duration.Inf): Seq[DayResult] = {
    val days = Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to)).toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futures = days.map { day =>
        scala.concurrent.Future {
          val (orders, failed) = fetchDay(fetch, day)
          val dir = Paths.get(outDir, day.toString)
          Files.createDirectories(dir)
          Files.writeString(dir.resolve(s"$day.json"),
            orders.mkString("[", ",", "]"))
          Files.writeString(dir.resolve(s"$day.metadata.json"),
            s"""{"fecha":"$day","total_ordenes":${orders.size},"fallos":${if (failed) 1 else 0}}""")
          DayResult(day, orders.size, failed)
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures), timeout)
      // shutdownNow (not shutdown): if the Await above threw, in-flight
      // fetches must not keep writing files / holding the JVM open
    } finally pool.shutdownNow()
  }

  /** O2: the orchestrator's AUTHENTICATED extract trigger
    * (Composer/DAG_cloudrun_dataflow_sp.py:25-32) — fetch an identity
    * token for the service's audience, GET the endpoint with
    * `Authorization: Bearer <token>`, return the response body; the
    * orchestrator-level retry (DAG default_args: retries with a delay)
    * wraps the whole call.
    *
    * The token fetch is INJECTED ([[TokenProvider]]): in the reference it
    * is the platform's OIDC metadata flow — environment glue, not engine
    * capability, exactly like [[FetchPage]] injecting HTTP transport. The
    * provider is consulted PER ATTEMPT (identity tokens expire; a retry
    * minutes later must not replay a stale one). Non-2xx throws so the
    * retry loop engages; exhausted retries rethrow the last failure —
    * the DAG marks the task failed and nothing downstream runs. */
  type TokenProvider = String => String // audience => bearer token

  def authenticatedTrigger(endpoint: java.net.URI, audience: String,
                           tokenFor: TokenProvider,
                           retries: Int = 2, retryDelayMs: Long = 0L,
                           client: java.net.http.HttpClient =
                             java.net.http.HttpClient.newBuilder()
                               .connectTimeout(java.time.Duration.ofSeconds(30)).build(),
                           requestTimeout: java.time.Duration =
                             java.time.Duration.ofSeconds(300)): String = {
    require(retries >= 1, "at least one attempt")
    import java.net.http.{HttpRequest, HttpResponse}
    var last: Try[String] = Failure(new IllegalStateException("unattempted"))
    var attempt = 0
    while (attempt < retries && last.isFailure) {
      if (attempt > 0 && retryDelayMs > 0) Thread.sleep(retryDelayMs)
      attempt += 1
      last = Try {
        val req = HttpRequest.newBuilder(endpoint)
          .timeout(requestTimeout)
          .header("Authorization", s"Bearer ${tokenFor(audience)}")
          .GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() / 100 == 2,
          s"trigger HTTP ${resp.statusCode()} from $endpoint")
        resp.body()
      }
    }
    last.get
  }
}
