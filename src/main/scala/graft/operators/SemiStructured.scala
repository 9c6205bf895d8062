package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.NumericFunctions.detRound

/** Semi-structured (JSON-string) column profiling — the operator family a
  * pipeline needs the moment an upstream system lands a "properties" /
  * "metadata" column as free-form JSON text (reference analogue: the
  * flatten layer's JSON handling, `alas_dataflow_1/utils/transformations
  * .py` flatten + array→JSON-string at the master sink; OQ16 is the
  * scalar-extraction cousin). At 100 TB a JSON column is the least
  * governed part of the schema: keys appear and vanish per producer
  * release, and nothing crashes until a consumer's extraction silently
  * goes 100% null. These three reports are the presence/shape monitors
  * that catch it — the [[Relational.nullProfile]] discipline applied
  * INSIDE the JSON payload.
  *
  * Scale notes:
  *  - Parsing is per-row expression work (`from_json` to a
  *    map<string,string> view — codegen'd, no UDF); malformed or null
  *    payloads parse to null and are counted, never thrown.
  *  - [[jsonKeyProfile]]/[[jsonKeyDrift]] explode the KEY SET (a few
  *    entries per row — the schema, not the data), then aggregate to
  *    |keys| or |keys × buckets| rows: bounded-group shuffles, the
  *    x163/x146 report shape. Totals attach by 1-row broadcast.
  *  - Value distinctness in [[jsonKeyProfile]] is per-key
  *    COUNT(DISTINCT value) over md5-bounded strings; for genuinely
  *    high-cardinality keys at corpus scale the [[Dedup.kmvSketch]]
  *    estimate is the sampling lever (the x142 report licenses it).
  */
object SemiStructured {

  /** The map<string,string> view of a JSON object column: scalar values
    * surface as their JSON text ("69", "true"), nested objects/arrays as
    * their raw JSON substring, malformed/null payloads as null. */
  private def asMap(json: Column): Column =
    from_json(json, org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType))

  /** JSON KEY PROFILE — one row per key appearing anywhere in `json`:
    * how many rows carry it, its presence share, and how many distinct
    * (string-form) values it takes. The schema-inventory read: a key at
    * share 1.0 is a de-facto column (promote it); one at 0.003 is a
    * producer experiment; n_distinct_values = 1 is a constant worth
    * dropping at ingest. `n_malformed` on the companion
    * [[jsonHealth]] row — not here — counts unparseable payloads.
    * Output: key, n_present, presence_share (detRound 6: rational
    * quotient of exact counts), n_distinct_values. */
  def jsonKeyProfile(df: DataFrame, json: Column): DataFrame = {
    val total = df.agg(count(lit(1)).as("__n"))
    df.select(explode(asMap(json)).as(Seq("key", "__v")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_present"),
        count_distinct(col("__v")).as("n_distinct_values"))
      .crossJoin(broadcast(total))
      .select(col("key"), col("n_present"),
        detRound(col("n_present").cast("double") / col("__n"), 6)
          .as("presence_share"),
        col("n_distinct_values"))
  }

  /** JSON HEALTH — the one-row parse gate in front of the key reports:
    * total rows, null payloads, malformed payloads (non-null text that
    * does not parse as a JSON object), and the malformed rate. A
    * malformed count moving off zero is an upstream serializer bug
    * caught before every extraction downstream goes quietly null.
    * Output: n_rows, n_null, n_malformed, malformed_rate (detRound 6). */
  def jsonHealth(df: DataFrame, json: Column): DataFrame =
    df.select(json.as("__j"), asMap(json).as("__m"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__j").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(col("__j").isNotNull && col("__m").isNull, 1L).otherwise(0L))
          .as("n_malformed"))
      .select(col("n_rows"), col("n_null"), col("n_malformed"),
        detRound(col("n_malformed").cast("double") / col("n_rows"), 6)
          .as("malformed_rate"))

  /** JSON KEY DRIFT — [[jsonKeyProfile]]'s presence share per calendar
    * bucket: the report that shows WHEN a key appeared or vanished (a
    * producer release mid-stream), which the corpus-level share only
    * averages away. Buckets ride [[Relational.resampleCounts]]'
    * date_trunc convention. Output: bucket, key, n_present,
    * bucket_share (share of the bucket's rows carrying the key,
    * detRound 6). */
  def jsonKeyDrift(df: DataFrame, json: Column, ts: Column,
                   unit: String = "day"): DataFrame = {
    require(Seq("hour", "day", "week").contains(unit),
      s"unit must be hour|day|week, got $unit")
    val b = date_trunc(unit, ts).as("bucket")
    val totals = df.groupBy(date_trunc(unit, ts).as("bucket"))
      .agg(count(lit(1)).as("__n"))
    df.select(b, explode(map_keys(asMap(json))).as("key"))
      .groupBy(col("bucket"), col("key"))
      .agg(count(lit(1)).as("n_present"))
      .join(totals, "bucket")
      .select(col("bucket"), col("key"), col("n_present"),
        detRound(col("n_present").cast("double") / col("__n"), 6)
          .as("bucket_share"))
  }

  /** JSON FIELD STATS — per-group numeric summary of one extracted
    * field: the "is this extraction still live" monitor a consumer runs
    * on the exact path it reads (OQ16's extraction, aggregated). A
    * field whose n_with_field falls away from n is the silent-null
    * failure; min/max drifting is the unit-change failure. `path` is a
    * JsonPath literal (`$.k`). Output: <group>, n, n_with_field, min_v,
    * max_v, mean_v (detRound 4: exact long sum over exact count). */
  def jsonFieldStats(df: DataFrame, json: Column, path: String,
                     group: Column): DataFrame = {
    val v = get_json_object(json, path).cast("long")
    df.select(group.as("grp"), v.as("__v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        count(col("__v")).as("n_with_field"),
        min(col("__v")).as("min_v"), max(col("__v")).as("max_v"),
        sum(col("__v")).as("__s"))
      .select(col("grp"), col("n"), col("n_with_field"),
        col("min_v"), col("max_v"),
        when(col("n_with_field") > 0L,
          detRound(col("__s").cast("double") / col("n_with_field"), 4))
          .as("mean_v"))
  }
}
