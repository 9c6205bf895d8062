package graft.explode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E1-E5 + T7: the four child-table explodes
  * (alas_dataflow_1_repository/alas_dataflow_1/src/
  *  2_run_events_info_temp_pipeline.py:73-110,
  *  3_run_schedule_events_info_temp_pipeline.py:74-97,
  *  4_run_reschedule_events_info_temp_pipeline.py:71-104,
  *  5_run_packages_temp_pipeline.py:70-85).
  *
  * Input is the FLATTENED master-staging frame with native
  * ArrayType(StructType) event columns — read once, derive four outputs
  * (the reference re-reads and re-parses the same raw JSON five times;
  * SURVEY §4.2 #3 blames that for its 2 h wall-clock). Every derivation is
  * scan→generate→project: narrow, shuffle-free, one codegen span.
  *
  * E5 null-guard (P2:85-86 etc.): `explode` on a null/empty array emits no
  * rows natively — exactly the reference's "skip record" behavior.
  */
object ChildTables {

  /** T7 (P2:76-83): strict `%Y-%m-%dT%H:%M:%S.%f` parse, invalid → null.
    * Python's %f accepts 1-6 fraction digits but REQUIRES the fraction (a
    * string with no ".ffffff" raises ValueError → None). The rlike gate
    * reproduces the all-or-null contract and the fraction is zero-padded
    * to 6 so one strict Spark format covers Python's laxness (SURVEY §7.4). */
  def strictTs(c: Column): Column = {
    val shape = "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{1,6}$"
    val normalized = concat(
      substring_index(c, ".", 1), lit("."),
      rpad(regexp_extract(c, "\\.(\\d{1,6})$", 1), 6, "0"))
    try_to_timestamp(
      when(c.rlike(shape), normalized),
      lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
  }

  /** E1 (P2:73-110): one row per entry of events_info_json. */
  def eventsInfo(flat: DataFrame): DataFrame =
    flat
      .select(col("delivery_order_id"), explode(col("events_info_json")).as("e"))
      .select(
        col("delivery_order_id"),
        col("e.status").as("status"),
        col("e.lob").as("lob"),
        strictTs(col("e.timestamp")).as("timestamp"),
        col("e.info.user_name").as("info_user_name"),
        strictTs(col("e.info.delivery_expected")).as("info_delivery_expected"),
        strictTs(col("e.info.schedule_expected")).as("info_schedule_expected"),
        strictTs(col("e.info.schedule_rejected_1")).as("info_schedule_rejected_1"),
        col("e.info.schedule_rejected_1_reason").as("info_schedule_rejected_1_reason"),
        col("e.info.schedule_rejected_1_comments").as("info_schedule_rejected_1_comments"),
        strictTs(col("e.info.schedule_rejected_2")).as("info_schedule_rejected_2"),
        col("e.info.schedule_rejected_2_reason").as("info_schedule_rejected_2_reason"),
        col("e.info.schedule_rejected_2_comments").as("info_schedule_rejected_2_comments"),
        strictTs(col("e.info.schedule_rejected_3")).as("info_schedule_rejected_3"),
        col("e.info.schedule_rejected_3_reason").as("info_schedule_rejected_3_reason"),
        col("e.info.schedule_rejected_3_comments").as("info_schedule_rejected_3_comments"),
        col("e.info.schedule_confirmed_1_comments").as("info_schedule_confirmed_1_comments"),
        col("e.info.schedule_confirmed_2_comments").as("info_schedule_confirmed_2_comments"),
        col("e.info.schedule_confirmed_3_comments").as("info_schedule_confirmed_3_comments"),
        col("e.info.schedule_not_confirmed_1_comments").as("info_schedule_not_confirmed_1_comments"),
        col("e.info.schedule_not_confirmed_2_comments").as("info_schedule_not_confirmed_2_comments"),
        col("e.info.schedule_not_confirmed_3_comments").as("info_schedule_not_confirmed_3_comments"),
        strictTs(col("e.info.delivery_rejected_1")).as("info_delivery_rejected_1"))

  /** E2 (P3:74-97): schedule events — 3 output columns. */
  def scheduleEvents(flat: DataFrame): DataFrame =
    flat
      .select(col("delivery_order_id"), explode(col("schedule_events_info_json")).as("e"))
      .select(
        strictTs(col("e.timestamp")).as("timestamp"),
        col("e.info.user_name").as("info_user_name"),
        col("delivery_order_id"))

  /** E3 (P4:71-104): reschedule events. The reference parses only 2 of the
    * 6 expected-date fields (P4:95,98) though its schema declares all six
    * TIMESTAMP (P4:135-143) — a reference bug; here ALL are parsed (schema
    * wins, documented deviation per SURVEY §7.4). */
  def rescheduleEvents(flat: DataFrame): DataFrame =
    flat
      .select(col("delivery_order_id"), explode(col("reschedule_events_info_json")).as("e"))
      .select(
        col("e.status").as("status"),
        strictTs(col("e.timestamp")).as("timestamp"),
        col("e.info.user_name").as("info_user_name"),
        strictTs(col("e.info.old_packaging_expected")).as("info_old_packaging_expected"),
        strictTs(col("e.info.new_packaging_expected")).as("info_new_packaging_expected"),
        strictTs(col("e.info.old_b2c_delivery_expected")).as("info_old_b2c_delivery_expected"),
        strictTs(col("e.info.new_b2c_delivery_expected")).as("info_new_b2c_delivery_expected"),
        strictTs(col("e.info.old_b2b_delivery_expected")).as("info_old_b2b_delivery_expected"),
        strictTs(col("e.info.new_b2b_delivery_expected")).as("info_new_b2b_delivery_expected"),
        col("e.info.rescheduled_comments").as("info_rescheduled_comments"),
        col("delivery_order_id"))

  /** E4 (P5:70-85): one row per package. */
  def packages(flat: DataFrame): DataFrame =
    flat
      .select(col("delivery_order_id"), explode(col("packages_json")).as("p"))
      .select(
        col("p.code").as("code"),
        col("p.status").as("status"),
        col("p.distribution_center_bulk").as("distribution_center_bulk"),
        col("p.ser_bulk").as("ser_bulk"),
        col("delivery_order_id"))
}
