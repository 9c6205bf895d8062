package graft

import java.nio.file.{Files, Path}

/** Deterministic reference-shaped ingest fixture for the PIPELINE bench:
  * day-directories of multiLine JSON order arrays (the S2 landing layout,
  * FIXTURES.md §A.1) sized to the reference's published daily volume
  * (~6k orders typical, ~20k peak — BASELINE.md DOC:6), so
  * `Main.run` can be timed against the reference's ~2 h end-to-end run
  * (DOC:138) on the same unit of work.
  *
  * Seeded [[scala.util.Random]] only — same (orders, days, seed) → byte-
  * identical files, so bench runs are comparable across rounds. Field
  * variety matters more than realism: ids unique, structures cycle
  * through the enriched + non-enriched sets, event/package array lengths
  * vary 0-4, and timestamps sweep fractional-digit widths (the T7 strict
  * parse surface). Volume is driver-side (a typical day is ~15 MB of
  * JSON) — this writes FIXTURES, it is not itself the thing measured.
  */
object PipelineFixture {

  def write(root: Path, orders: Int, days: Int = 1, seed: Long = 42L,
            idBase: Int = 0,
            startDay: java.time.LocalDate = java.time.LocalDate.of(2024, 1, 15)): Unit = {
    require(orders > 0 && days > 0, "orders and days must be positive")
    val rnd = new scala.util.Random(seed)
    val perDay = (orders + days - 1) / days
    // `idBase` offsets the order-id range (defaults keep every existing
    // fixture byte-identical): the backfill harness gives consecutive
    // days OVERLAPPING ranges so Q2's upsert exercises both branches —
    // re-delivered ids update, unmatched history survives
    var id = idBase
    for (d <- 0 until days) {
      val day = startDay.plusDays(d.toLong)
      val sb = new StringBuilder("[")
      val n = math.min(perDay, orders - d * perDay)
      for (i <- 0 until n) {
        id += 1
        if (i > 0) sb.append(',')
        sb.append(record(id, day, rnd))
      }
      sb.append(']')
      val dir = root.resolve(day.toString)
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(s"$day.json"), sb.toString)
    }
  }

  /** The same deterministic order records as [[write]], returned as raw
    * JSON strings instead of landed day-files — the shape a [[graft
    * .sources.Extract.FetchPage]] stub pages out, so the ingest e2e
    * (trigger → extract → pipeline) runs on the identical fixture
    * distribution the bench pipeline uses. */
  def orderRecords(orders: Int, day: java.time.LocalDate =
                     java.time.LocalDate.of(2024, 1, 15),
                   seed: Long = 42L, idBase: Int = 0): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (idBase + 1 to idBase + orders).map(id => record(id, day, rnd))
  }

  private val structures =
    graft.flatten.OrderFlatten.enrichedStructureIds ++ Seq(99901L, 99902L)

  private def ts(day: java.time.LocalDate, rnd: scala.util.Random): String = {
    // sweep 1-6 fractional digits (T7's strict-parse width surface)
    val frac = rnd.nextInt(6) + 1
    f"${day}T${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d." +
      ("%0" + frac + "d").format(rnd.nextInt(math.pow(10, frac.toDouble).toInt))
  }

  private def record(id: Int, day: java.time.LocalDate,
                     rnd: scala.util.Random): String = {
    val sid = structures(rnd.nextInt(structures.length))
    val poly = rnd.nextInt(9) + 1
    val events = (0 until rnd.nextInt(5)).map { _ =>
      s"""{"status":${rnd.nextInt(7) + 1},"lob":${if (rnd.nextBoolean()) rnd.nextInt(4) + 1 else "null"},""" +
        s""""timestamp":"${ts(day, rnd)}","info":{"user_name":"u${rnd.nextInt(50)}"}}"""
    }.mkString("[", ",", "]")
    val schedules = (0 until rnd.nextInt(3)).map { _ =>
      s"""{"timestamp":"${ts(day, rnd)}","info":{"user_name":"s${rnd.nextInt(20)}"}}"""
    }.mkString("[", ",", "]")
    val reschedules = (0 until rnd.nextInt(3)).map { _ =>
      s"""{"status":${rnd.nextInt(4) + 1},"timestamp":"${ts(day, rnd)}","info":{""" +
        s""""user_name":"r${rnd.nextInt(20)}","old_packaging_expected":"${day}T00:00:00.000000",""" +
        s""""new_packaging_expected":"${day.plusDays(2)}T00:00:00.000000",""" +
        s""""old_b2c_delivery_expected":null,"new_b2c_delivery_expected":null,""" +
        s""""old_b2b_delivery_expected":null,"new_b2b_delivery_expected":null,""" +
        s""""rescheduled_comments":"c${rnd.nextInt(10)}"}}"""
    }.mkString("[", ",", "]")
    val packages = (0 until rnd.nextInt(4)).map { k =>
      s"""{"code":"PKG$id-$k","status":${rnd.nextInt(6) + 1},""" +
        s""""distribution_center_bulk":${rnd.nextBoolean()},"ser_bulk":${rnd.nextBoolean()}}"""
    }.mkString("[", ",", "]")
    s"""{"delivery_order_id":"ORD-$id","code":"C-$id",""" +
      s""""recycling":${rnd.nextBoolean()},"assigned_courier":"${if (rnd.nextBoolean()) s"courier ${rnd.nextInt(9)}" else ""}",""" +
      s""""size_box":"M${rnd.nextInt(4) + 1}","cross_docking_location_code":${if (rnd.nextBoolean()) s""""XD-${rnd.nextInt(20)}"""" else "null"},""" +
      s""""delivery_attemps":${rnd.nextInt(4)},"promised_date":"${day.plusDays(5)}",""" +
      s""""created_date":"${day}T0${rnd.nextInt(9)}:00:00.000000",""" +
      s""""destination":{"geo_coding":"ROOFTOP","geo_location":{"lon":${-70.0 - rnd.nextDouble()},"lat":${-33.0 - rnd.nextDouble()}},""" +
      s""""local":"${rnd.nextInt(99)}B","not_located":${rnd.nextBoolean()},"number":"${rnd.nextInt(9999)}",""" +
      s""""street":"Calle ${rnd.nextInt(200)}","structure_id":$sid,"polygon":$poly},""" +
      s""""events_info_json":$events,"schedule_events_info_json":$schedules,""" +
      s""""reschedule_events_info_json":$reschedules,"packages_json":$packages,""" +
      s""""changes_info_json":null,"items_json":[{"sku":"SKU${rnd.nextInt(500)}","qty":${rnd.nextInt(5) + 1}}],""" +
      s""""extended_info_documents":null,"statuses":[${(0 until rnd.nextInt(3) + 1).map(_ => rnd.nextInt(7) + 1).mkString(",")}]}"""
  }
}
