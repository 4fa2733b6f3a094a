package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One driver-verifiable query: a Spark implementation plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB
  * over the same parquet tables. Column names/types and row order must
  * match between the two (the driver hash-compares values after sorting
  * columns by name), so every query here ends in a total ORDER BY and
  * aliases every computed column identically on both sides.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  /** Read one of the driver-generated tables (TESTDATA.md). The events
    * table's `ts` physical encoding has varied across testdata
    * generations — TIMESTAMP(NANOS) (which Spark can only read as a raw
    * long under the legacy flag) and plain timestamp[us] (which resolves
    * as TIMESTAMP_NTZ) have both been observed — so the loader adapts to
    * the RESOLVED type instead of assuming one encoding:
    *   - LongType (legacy nanos): floor-divide to micros; DuckDB's
    *     `CAST(ts AS TIMESTAMP)` truncates identically.
    *   - TIMESTAMP_NTZ (micros, not UTC-adjusted): cast to the session
    *     TimestampType — identity on the stored micros under the UTC
    *     session timezone every entry point sets.
    *   - TimestampType: already what every query expects; pass through.
    * The nanosAsLong flag is harmless for non-nanos files (it only
    * changes how TIMESTAMP(NANOS) columns resolve), so it is set
    * unconditionally before the read rather than probing the footer.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Exact-decimal view of a 2-decimal money/measure double. Summing
    * doubles is order-dependent and would break DuckDB hash-parity at
    * shuffle scale; summing DECIMAL(18,2) is exact in both engines.
    * Cast the final aggregate back to double on both sides.
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Engine-exact decimal rounding of an FP-computed double:
    * floor(x*10^d + 0.5)/10^d is pure IEEE arithmetic, so both engines
    * round the identical binary double identically. Spark's round()
    * (BigDecimal HALF_UP on the shortest decimal representation) and
    * DuckDB's round() (binary-value rounding) disagree on doubles one
    * ulp below a half boundary — observed on a real quality score of
    * 0.53374999…: Spark said 0.5338, DuckDB 0.5337. Use for any rounded
    * value DERIVED FROM FP MATH on both sides; inputs must be non-NaN
    * and |x| < 2^53/10^d. (Halves of negative inputs round toward +inf,
    * not away from zero — consistently in both engines.)
    */
  def rx(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits.toDouble)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** DuckDB spelling of [[rx]]. */
  def rxSql(e: String, digits: Int): String =
    s"floor(($e) * 1e$digits + 0.5) / 1e$digits"

  /** Scratch space for queries that must materialize an intermediate
    * (JSON round-trips, partitioned sinks, streaming checkpoints).
    * Kept inside the repo target dir per the environment contract.
    */
  def scratch(sub: String): String = {
    val p = s"/root/repo/target/scratch/$sub"
    new java.io.File(p).getParentFile.mkdirs()
    p
  }
}
