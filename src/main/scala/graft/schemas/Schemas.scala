package graft.schemas

import org.apache.spark.sql.types._

/** Explicit StructType constants for the order-ETL surface — schema-on-write
  * everywhere, never inferSchema (SURVEY §1.3).
  *
  * Field inventory traces to the reference's declared BigQuery schema
  * strings and its flatten function:
  *  - raw order shape: extract-ceo-app-repository/extract-app/app.py:37-96
  *  - master table: alas_dataflow_1_repository/alas_dataflow_1/src/
  *    1_run_main_table_pipeline.py:95-116 (open-ended: "#continuan otros
  *    campos", line 115)
  *  - events temp: 2_run_events_info_temp_pipeline.py:137-161
  *  - schedule temp: 3_run_schedule_events_info_temp_pipeline.py:124-128
  *  - reschedule temp: 4_run_reschedule_events_info_temp_pipeline.py:131-143
  *  - packages temp: 5_run_packages_temp_pipeline.py:112-123
  */
object Schemas {

  private def s(n: String, t: DataType = StringType) = StructField(n, t, nullable = true)

  /** Nested event info carried inside events_info_json (P2:88-108). */
  val eventInfo: StructType = StructType(Seq(
    s("user_name"),
    s("delivery_expected"), s("schedule_expected"),
    s("schedule_rejected_1"), s("schedule_rejected_1_reason", LongType), s("schedule_rejected_1_comments"),
    s("schedule_rejected_2"), s("schedule_rejected_2_reason", LongType), s("schedule_rejected_2_comments"),
    s("schedule_rejected_3"), s("schedule_rejected_3_reason", LongType), s("schedule_rejected_3_comments"),
    s("schedule_confirmed_1_comments"), s("schedule_confirmed_2_comments"), s("schedule_confirmed_3_comments"),
    s("schedule_not_confirmed_1_comments"), s("schedule_not_confirmed_2_comments"), s("schedule_not_confirmed_3_comments"),
    s("delivery_rejected_1")))

  val event: StructType = StructType(Seq(
    s("status", LongType), s("lob", LongType), s("timestamp"),
    s("info", eventInfo)))

  val scheduleEvent: StructType = StructType(Seq(
    s("timestamp"), s("info", StructType(Seq(s("user_name"))))))

  val rescheduleInfo: StructType = StructType(Seq(
    s("user_name"),
    s("old_packaging_expected"), s("new_packaging_expected"),
    s("old_b2c_delivery_expected"), s("new_b2c_delivery_expected"),
    s("old_b2b_delivery_expected"), s("new_b2b_delivery_expected"),
    s("rescheduled_comments")))

  val rescheduleEvent: StructType = StructType(Seq(
    s("status", LongType), s("timestamp"), s("info", rescheduleInfo)))

  val pkg: StructType = StructType(Seq(
    s("code"), s("status", LongType),
    s("distribution_center_bulk", BooleanType), s("ser_bulk", BooleanType)))

  val destination: StructType = StructType(Seq(
    s("geo_coding"),
    s("geo_location", StructType(Seq(s("lon", DoubleType), s("lat", DoubleType)))),
    s("local"), s("not_located", BooleanType), s("number"), s("street"),
    s("structure_id", LongType), s("polygon", LongType)))

  /** Raw order as landed by the extract stage (app.py:37-96 + FIXTURES A.1).
    * The four pass-through JSON array fields keep loose element types. */
  val rawOrder: StructType = StructType(Seq(
    s("delivery_order_id"), s("code"), s("recycling", BooleanType),
    s("assigned_courier"), s("size_box"), s("cross_docking_location_code"),
    s("delivery_attemps", LongType),
    s("promised_date"), s("created_date"),
    s("destination", destination),
    s("events_info_json", ArrayType(event)),
    s("schedule_events_info_json", ArrayType(scheduleEvent)),
    s("reschedule_events_info_json", ArrayType(rescheduleEvent)),
    s("packages_json", ArrayType(pkg)),
    s("changes_info_json", ArrayType(StringType)),
    s("items_json", ArrayType(StructType(Seq(s("sku"), s("qty", LongType))))),
    s("extended_info_documents", ArrayType(StringType)),
    s("statuses", ArrayType(LongType))))

  /** rawOrder + the PERMISSIVE corrupt-record column (P1:67-68 quarantine). */
  val rawOrderWithCorrupt: StructType =
    StructType(rawOrder.fields :+ s("_corrupt_record"))

  /** The 8 nested-array fields re-serialized to JSON strings at the master
    * sink (P1:59-66, DOC:119). */
  val jsonStringFields: Seq[String] = Seq(
    "events_info_json", "schedule_events_info_json", "reschedule_events_info_json",
    "changes_info_json", "packages_json", "items_json",
    "extended_info_documents", "statuses")
}
