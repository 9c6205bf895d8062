package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.types._

/** Contract-wide output-schema lint: every query's result schema must use
  * only hash-safe types.
  *
  * Why: the driver's correctness gate hashes both engines' serialized
  * values after sorting columns by name. Types whose EQUAL values
  * serialize differently per engine — DecimalType is the proven case
  * (r06: x61/x83 had rows_match+schema_match true, hash_match false on
  * `Decimal('13.9000')` vs `13.9`) — fail the hash with values identical.
  * DECIMAL stays a legitimate INTERNAL compute discipline (exact,
  * order-independent sums); it just must be cast away before the final
  * select. This spec makes the whole failure class unreintroducible:
  * any new query emitting a fragile output type fails here, at `sbt
  * test` time, not in the next round's CORRECTNESS artifact.
  *
  * Analysis-only (`df.schema` — no job runs), so sweeping all ~112
  * queries costs seconds. sf0.001 supplies the input schemas.
  */
class ContractSchemaSpec extends SparkSpec {

  private val safeAtomic: Set[DataType] = Set(
    StringType, LongType, IntegerType, ShortType, ByteType,
    DoubleType, FloatType, BooleanType, TimestampType, DateType,
    BinaryType)

  private def hashSafe(dt: DataType): Boolean = dt match {
    case a: ArrayType  => hashSafe(a.elementType)
    case s: StructType => s.fields.forall(f => hashSafe(f.dataType))
    case other         => safeAtomic.contains(other)
  }

  test("every contract query's output schema uses only hash-safe types") {
    val dir = sf()
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, dir).schema.fields.collect {
        case f if !hashSafe(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(bad.isEmpty,
      s"hash-fragile output columns (cast to DOUBLE/BIGINT/STRING before the final select):\n  ${bad.mkString("\n  ")}")
  }

  test("every contract query has an oracle SQL entry (no silent rows-only checks)") {
    // the driver downgrades oracle-less queries to a weaker rows>0 check;
    // the contract policy is every query oracle-pinned, so a queries/sql
    // key drift is a bug at test time, not a silent grade downgrade
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(noOracle.isEmpty, s"queries missing oracle SQL: ${noOracle.toSeq.sorted}")
    assert(orphaned.isEmpty, s"oracle SQL without a query: ${orphaned.toSeq.sorted}")
  }

  test("the lint itself catches a DECIMAL output column") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a")).toDF("k", "v")
      .select(col("k"), col("v"), lit(1.5).cast("decimal(18,4)").as("d"))
    assert(!df.schema.fields.forall(f => hashSafe(f.dataType)))
  }
}
