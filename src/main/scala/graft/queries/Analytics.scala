package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Warehouse-analytics operators over the relational tables: funnel
  * (staged-conversion) analysis, dataset profiling, SCD2 dimension
  * history, Z-order layout keys, MERGE-shaped upsert, iterative
  * PageRank, feature bucketization, and decimal-exact correlation.
  * Each is one shuffle (or none) per logical step: funnel and SCD2
  * partition once per entity key and reuse that partitioning across
  * their window passes; profiling and correlation are single global
  * aggregates; the Z-value is pure row arithmetic feeding a range
  * partitioner; PageRank shuffles once per round on the edge key.
  */
object Analytics {
  import QDef._

  /** SQL text of the `bits`-bit two-dimensional Morton (Z-order)
    * interleave of nonnegative integer expressions `x` and `y` — x on
    * even bit positions, y on odd. `intDiv` is the engine's integer
    * division operator: "div" in Spark SQL, "//" in DuckDB.
    */
  def zOrderSql(x: String, y: String, bits: Int, intDiv: String): String =
    (0 until bits).map { i =>
      s"((($x) $intDiv ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + ((($y) $intDiv ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  val all: Seq[QDef] = Seq(

    QDef("win_funnel",
      // Per-user conversion funnel view -> click -> purchase: first
      // view, first click AFTER that view, first purchase after that
      // click — three chained conditional window minima over ONE
      // hash partitioning on user_id (no orderBy in the frame, so no
      // per-pass sort is required), then the reached stage. Null
      // comparisons propagate to false identically in both engines.
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("t_view",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t_click",
            min(when(col("event_type") === "click" && col("ts") > col("t_view"),
              col("ts"))).over(w))
          .withColumn("t_purchase",
            min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
              col("ts"))).over(w))
          .select(col("user_id"), col("t_view"), col("t_click"),
            col("t_purchase"),
            when(col("t_purchase").isNotNull, 3L)
              .when(col("t_click").isNotNull, 2L)
              .when(col("t_view").isNotNull, 1L)
              .otherwise(0L).as("stage"))
          .distinct()
          .orderBy("user_id")
      },
      Some("""WITH e AS (
          SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        w1 AS (
          SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                      OVER (PARTITION BY user_id) AS t_view FROM e),
        w2 AS (
          SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
                      OVER (PARTITION BY user_id) AS t_click FROM w1),
        w3 AS (
          SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
                      OVER (PARTITION BY user_id) AS t_purchase FROM w2)
        SELECT DISTINCT user_id, t_view, t_click, t_purchase,
          CASE WHEN t_purchase IS NOT NULL THEN 3
               WHEN t_click IS NOT NULL THEN 2
               WHEN t_view IS NOT NULL THEN 1
               ELSE 0 END AS stage
        FROM w3 ORDER BY user_id""")),

    QDef("profile_column_stats",
      // Dataset profiling in ONE scan + ONE global aggregate: per
      // column null count, distinct count, and numeric min/max
      // (strings profile nulls/cardinality only), unpivoted to a row
      // per column with stack. The profile a pipeline runs before
      // committing a 100 TB ingest — cost is one pass regardless of
      // column count.
      (s, dir) => {
        val numeric =
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        val strings = Seq("l_returnflag", "l_linestatus")
        val aggs =
          (numeric ++ strings).flatMap { c =>
            Seq(count(col(c)).as(s"cnt_$c"),
              count_distinct(col(c)).as(s"nd_$c")) ++
              (if (numeric.contains(c))
                Seq(min(col(c)).cast("double").as(s"min_$c"),
                  max(col(c)).cast("double").as(s"max_$c"))
              else Nil)
          }
        val stackArgs = (numeric ++ strings).map { c =>
          val mm = if (numeric.contains(c)) s"min_$c, max_$c"
            else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
          s"'$c', n_rows - cnt_$c, nd_$c, $mm"
        }.mkString(", ")
        t(s, dir, "lineitem")
          .agg(count(lit(1)).as("n_rows"), aggs: _*)
          .selectExpr(s"stack(${numeric.size + strings.size}, $stackArgs)" +
            " AS (col_name, n_nulls, n_distinct, min_v, max_v)")
          .orderBy("col_name")
      }, {
        val numeric =
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        val strings = Seq("l_returnflag", "l_linestatus")
        val selects = (numeric ++ strings).map { c =>
          val mm = if (numeric.contains(c))
            s"CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v"
          else "CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v"
          s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_nulls,
              count(DISTINCT $c) AS n_distinct, $mm FROM lineitem"""
        }
        Some(selects.mkString("", " UNION ALL ", " ORDER BY col_name"))
      }),

    QDef("pipeline_scd2_history",
      // Slowly-changing-dimension (type 2) history: each customer's
      // order states become versioned rows with half-open validity
      // [valid_from, valid_to) — valid_to = next version's start,
      // NULL on the current row. One window partitioning on the
      // entity key; version and validity derive from the same sort,
      // totalized by o_orderkey against duplicate order dates.
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("valid_from"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate").as("valid_from"))
          .withColumn("version", row_number().over(w).cast("long"))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy("o_custkey", "version")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
          o_orderdate AS valid_from,
          row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) AS version,
          lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS valid_to,
          (lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) IS NULL)
            AS is_current
        FROM orders ORDER BY o_custkey, version""")),

    QDef("layout_zorder",
      // Z-order (Morton) layout key over two dimensions — the data
      // CLUSTERING primitive: range-partitioning and sorting the write
      // by z interleaves both dimensions' locality, so a later scan
      // filtering on EITHER p_size or the partkey bucket prunes most
      // files (one-dimensional sort only prunes its own column). The
      // interleave is pure integer arithmetic, identical in any
      // engine; 8 bits per dimension here.
      (s, dir) => t(s, dir, "part")
        .selectExpr("p_partkey", "p_size",
          s"CAST(${zOrderSql("p_size", "p_partkey % 256", 8, "div")} AS BIGINT) AS z")
        .orderBy("z", "p_partkey"),
      Some(s"""SELECT p_partkey, p_size,
          CAST(${zOrderSql("p_size", "p_partkey % 256", 8, "//")} AS BIGINT) AS z
        FROM part ORDER BY z, p_partkey"""))
  )
}
