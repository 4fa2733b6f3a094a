package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-language surface the DataFrame rows don't exercise: null-aware
  * NOT IN anti joins, correlated subquery decorrelation, and recursive
  * CTE iteration. Each runs as `spark.sql` text against temp views of
  * the driver tables so the construct reaches the ANALYZER the way a
  * SQL user writes it (the DataFrame API cannot spell NOT IN over a
  * subquery or WITH RECURSIVE at all), and the DuckDB oracle runs the
  * semantically identical statement.
  */
object SqlSurface {
  import QDef._

  /** Register `table` under a per-dir view name and return that name —
    * per-dir so a session that touches two scale dirs never aliases one
    * over the other.
    */
  private def v(s: SparkSession, dir: String, table: String): String = {
    val name = s"sqls_${table}_" +
      Integer.toHexString(dir.hashCode).replace('-', 'n')
    t(s, dir, table).createOrReplaceTempView(name)
    name
  }

  val all: Seq[QDef] = Seq(

    QDef("join_null_aware_anti",
      // NOT IN (subquery) with a NULLABLE probe key — three-valued
      // logic the plain left_anti join does not implement: a NULL probe
      // compares UNKNOWN against every subquery row, so it never
      // qualifies. Catalyst plans this as a null-aware anti join
      // (single-key NAAJ broadcasts the build side and short-circuits
      // on any build-side null) instead of the naive
      // BroadcastNestedLoopJoin; PlanShapeSpec pins that. At 100 TB the
      // pattern holds whenever the exclusion set is dimension-sized.
      (s, dir) => {
        val o = v(s, dir, "orders")
        val c = v(s, dir, "customer")
        s.sql(s"""
          SELECT o_orderstatus,
                 count(*) AS n,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price
          FROM (SELECT *,
                  CASE WHEN o_custkey % 97 = 0 THEN NULL
                       ELSE o_custkey END AS k
                FROM $o)
          WHERE k NOT IN (SELECT c_custkey FROM $c WHERE c_acctbal < 0)
          GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus,
            count(*) AS n,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              AS sum_price
        FROM (SELECT *,
                CASE WHEN o_custkey % 97 = 0 THEN NULL
                     ELSE o_custkey END AS k
              FROM orders)
        WHERE k NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    QDef("sql_correlated_subquery",
      // Correlated scalar subqueries + correlated EXISTS, decorrelated
      // by the optimizer into aggregate-plus-join plans (the reference
      // hand-rolls this shape with Python dict lookups; a SQL user
      // writes the subquery). "Above the nation's average balance" is
      // spelled multiplicatively (bal * n > sum) so the comparison
      // stays in exact DECIMAL arithmetic — a correlated avg() would
      // put engine-specific double division inside the threshold.
      (s, dir) => {
        val c = v(s, dir, "customer")
        val o = v(s, dir, "orders")
        s.sql(s"""
          SELECT c_custkey, c_acctbal
          FROM $c c
          WHERE CAST(c_acctbal AS DECIMAL(18,2))
                  * (SELECT count(*) FROM $c c2
                     WHERE c2.c_nationkey = c.c_nationkey)
                > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                   FROM $c c2 WHERE c2.c_nationkey = c.c_nationkey)
            AND EXISTS (SELECT 1 FROM $o o
                        WHERE o.o_custkey = c.c_custkey)
          ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE CAST(c_acctbal AS DECIMAL(18,2))
                * (SELECT count(*) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
              > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                 FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey""")),

    QDef("sql_recursive_cte",
      // WITH RECURSIVE (Spark 4 UnionLoop): a month spine densifying
      // the order calendar — the anchor carries the [lo, hi] bounds as
      // columns so the recursive step needs no correlated subquery,
      // and each iteration emits exactly one row until hi. Joined back
      // to per-month order counts with zero-fill: the missing-period
      // densification every reporting pipeline needs, expressed as
      // engine-level recursion rather than a driver loop.
      (s, dir) => {
        val o = v(s, dir, "orders")
        s.sql(s"""
          WITH RECURSIVE months AS (
            SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS m,
                   CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
            FROM $o
            UNION ALL
            SELECT CAST(m + INTERVAL '1' MONTH AS DATE), hi
            FROM months WHERE m < hi)
          SELECT months.m, coalesce(c.n, CAST(0 AS BIGINT)) AS n_orders
          FROM months
          LEFT JOIN (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS cm,
                            count(*) AS n
                     FROM $o GROUP BY 1) c
            ON c.cm = months.m
          ORDER BY months.m""")
      },
      Some("""WITH RECURSIVE months AS (
          SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS m,
                 CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
          FROM orders
          UNION ALL
          SELECT CAST(m + INTERVAL '1 month' AS DATE), hi
          FROM months WHERE m < hi)
        SELECT months.m, coalesce(c.n, CAST(0 AS BIGINT)) AS n_orders
        FROM months
        LEFT JOIN (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS cm,
                          count(*) AS n
                   FROM orders GROUP BY 1) c
          ON c.cm = months.m
        ORDER BY months.m""")),

    QDef("sql_lateral_join",
      // LATERAL correlated subquery in FROM — top-2 customers by
      // account balance per nation, the per-row-subquery shape SQL
      // users reach for before they learn window functions. Catalyst
      // decorrelates the correlated ORDER BY/LIMIT subquery into a
      // window-rank plan (DecorrelateInnerQuery), so execution is the
      // same rank-filter it would plan for row_number() — one shuffle
      // on the correlation key, no per-row re-execution, which is why
      // the construct survives a 100 TB probe side. Balance ties break
      // on c_custkey so the top-2 set is deterministic in both engines.
      (s, dir) => {
        val n = v(s, dir, "nation")
        val c = v(s, dir, "customer")
        s.sql(s"""
          SELECT n.n_name, t.c_custkey, t.c_acctbal
          FROM $n n,
          LATERAL (SELECT c_custkey, c_acctbal FROM $c c
                   WHERE c.c_nationkey = n.n_nationkey
                   ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
          ORDER BY n_name, c_custkey""")
      },
      Some("""SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        ORDER BY n_name, c_custkey"""))
  )
}
