package graft.queries

import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.functions._

import graft.functions.{TermTripleExplode, Text, TopKTerms, UriHashExpr}

/** Custom Catalyst / typed-API surface (SURVEY.md §2.2 UDF/UDAF/UDTF
  * rows): a native codegen'd `Expression`, the same `Aggregator` through
  * both the untyped `functions.udaf` and typed `KeyValueGroupedDataset`
  * routes, and a custom `Generator`. Each result is deterministically
  * ordered so the DuckDB oracle reproduces it exactly.
  */
object Custom {
  import QDef._

  /** Typed-route input row: one token of one document. */
  final case class DocTok(source: String, tok: String)

  val all: Seq[QDef] = Seq(

    QDef("join_typed_cogroup",
      // Typed KeyValueGroupedDataset.cogroup: both sides' groups for a
      // key delivered to ONE function invocation — the imperative
      // "merge two sorted feeds per key" escape hatch (sessionized
      // reconciliation, custom conflation) that a join + agg cannot
      // always express. One co-partitioning shuffle on the key, like a
      // sort-merge join. Money folds in integer cents so group
      // iteration order cannot perturb the sum; the oracle is the
      // equivalent aggregate-join.
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal")).as[(Long, Double)]
        val o = t(s, dir, "orders")
          .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
        c.groupByKey(_._1).cogroup(o.groupByKey(_._1)) { (k, cs, os) =>
          val nCust = cs.size
          if (nCust == 0) Iterator.empty // order without customer: none
          else {
            var n = 0L; var cents = 0L
            os.foreach { x =>
              n += 1; cents += math.floor(x._2 * 100 + 0.5).toLong
            }
            Iterator((k, nCust.toLong, n, cents))
          }
        }.toDF("custkey", "n_cust", "n_orders", "order_cents")
          .orderBy("custkey")
      },
      Some("""WITH oc AS (
          SELECT o_custkey, count(*) AS n_orders,
                 sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
          FROM orders GROUP BY 1)
        SELECT c.c_custkey AS custkey, count(*) AS n_cust,
               coalesce(any_value(oc.n_orders), 0) AS n_orders,
               CAST(coalesce(any_value(oc.cents), 0) AS BIGINT) AS order_cents
        FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
        ORDER BY custkey""")),

    QDef("scan_observed",
      // The observe() metrics API: named aggregates piggyback on the
      // query's own pass (CollectMetrics) — dataset-level audit counts
      // at zero extra scans, the 100 TB alternative to a second
      // count()/sum() job over the same input. The metrics do not
      // perturb the result (oracle checks that); CustomSurfaceSpec
      // reads them back from observedMetrics.
      (s, dir) => t(s, dir, "documents")
        .observe("doc_metrics", count(lit(1)).as("n_rows"),
          sum(col("n_chars")).as("total_chars"))
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .orderBy("lang"),
      Some("SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang")),

    QDef("expr_catalyst",
      // O23 URI minting as a native Catalyst Expression with doGenCode
      // (graft.functions.UriHashExpr), cross-checked in the same plan
      // against the pure built-in sha2/conv/pmod chain.
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey"),
          UriHashExpr.uriHashNative(col("c_name")).as("uri"),
          (UriHashExpr.uriHashNative(col("c_name")) === Text.uriHash(col("c_name")))
            .as("match_builtin"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
          'r' || CAST(CAST(('0x' || substr(sha256(regexp_replace(lower(c_name), '[ ,]', '', 'g')), 1, 8)) AS BIGINT) % 100000000 AS VARCHAR) AS uri,
          true AS match_builtin
        FROM customer ORDER BY c_custkey""")),

    QDef("udaf_aggregator",
      // TopKTerms via functions.udaf: top-5 tokens per language across
      // the documents table. Map-side partial maps merge at the shuffle
      // like a built-in hash aggregate.
      (s, dir) => {
        val topk = F.udaf(new TopKTerms[String](5, identity), Encoders.STRING)
        t(s, dir, "documents")
          .select(col("lang"),
            explode(Text.tokens(Text.normTerm(col("text")))).as("tok"))
          .groupBy("lang").agg(topk(col("tok")).as("tks"))
          .select(col("lang"), posexplode(col("tks")))
          .select(col("lang"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.term").as("term"), col("col.cnt").as("cnt"))
          .orderBy("lang", "rank")
      },
      Some("""WITH toks AS (
          SELECT lang,
                 unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
          FROM documents),
        cnts AS (SELECT lang, tok AS term, count(*) AS cnt FROM toks GROUP BY 1, 2),
        rk AS (SELECT lang, term, cnt,
                      row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rank
               FROM cnts)
        SELECT lang, rank, term, cnt FROM rk WHERE rank <= 5 ORDER BY lang, rank""")),

    QDef("agg_custom_typed",
      // The same Aggregator through the typed Dataset API:
      // groupByKey(_.source).agg(topk.toColumn) — top-3 tokens per
      // source feed.
      (s, dir) => {
        import s.implicits._
        val ds = t(s, dir, "documents")
          .select(col("source"),
            explode(Text.tokens(Text.normTerm(col("text")))).as("tok"))
          .as[DocTok]
        ds.groupByKey(_.source)
          .agg(new TopKTerms[DocTok](3, _.tok).toColumn.name("tks"))
          .toDF("source", "tks")
          .select(col("source"), posexplode(col("tks")))
          .select(col("source"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.term").as("term"), col("col.cnt").as("cnt"))
          .orderBy("source", "rank")
      },
      Some("""WITH toks AS (
          SELECT source,
                 unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
          FROM documents),
        cnts AS (SELECT source, tok AS term, count(*) AS cnt FROM toks GROUP BY 1, 2),
        rk AS (SELECT source, term, cnt,
                      row_number() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS rank
               FROM cnts)
        SELECT source, rank, term, cnt FROM rk WHERE rank <= 3 ORDER BY source, rank""")),

    QDef("ext_sql_functions",
      // The SparkSessionExtensions surface: both custom expressions
      // resolved from SQL text (scalar call + LATERAL VIEW generator).
      // ensureRegistered makes the entry independent of how the session
      // was built; sessions created with
      // spark.sql.extensions=graft.GraftExtensions get this for free.
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        t(s, dir, "part").createOrReplaceTempView("ext_part")
        s.sql("""SELECT p_partkey, tv.level, tv.term, uri_hash(tv.term) AS uri
                 FROM ext_part
                 LATERAL VIEW term_triple_explode(
                   p_name, p_brand,
                   CASE WHEN p_size > 25 THEN p_type ELSE '' END) tv AS level, term
                 ORDER BY p_partkey, level, term""")
      },
      Some("""WITH tv AS (
          SELECT p_partkey, 'main' AS level, p_name AS term FROM part
          UNION ALL SELECT p_partkey, 'midsub', p_brand FROM part
          UNION ALL SELECT p_partkey, 'sub', p_type FROM part WHERE p_size > 25)
        SELECT p_partkey, level, term,
          'r' || CAST(CAST(('0x' || substr(sha256(regexp_replace(lower(term), '[ ,]', '', 'g')), 1, 8)) AS BIGINT) % 100000000 AS VARCHAR) AS uri
        FROM tv ORDER BY p_partkey, level, term""")),

    QDef("rule_classify_lower",
      // The custom optimizer rule surface: classify_term(norm) is an
      // Unevaluable marker the LowerClassifyTerm Rule[LogicalPlan]
      // rewrites into the rule-classifier expression during
      // optimization — executing at all proves the rule ran.
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        t(s, dir, "part")
          .select(col("p_partkey"), Text.normTerm(col("p_name")).as("norm"))
          .createOrReplaceTempView("rule_part")
        s.sql("""SELECT classify_term(norm) AS type, count(*) AS n
                 FROM rule_part GROUP BY 1 ORDER BY 1""")
      },
      Some(s"""SELECT ${graft.pipeline.Classify.RuleClassifier.labelSql} AS type,
            count(*) AS n
          FROM (SELECT lower(trim(regexp_replace(p_name, '\\s+', ' ', 'g'))) AS norm
                FROM part)
          GROUP BY 1 ORDER BY 1""")),

    QDef("udtf_generator",
      // Custom Generator unpivoting a (main, midsub, sub) triple into
      // (level, term) rows, skipping nulls and empties exactly like the
      // reference's nested loops (json_classification.py:322-335).
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          TermTripleExplode.termTriples(
            col("p_name"),
            when(col("p_size") % 7 === 0, lit(null).cast("string"))
              .otherwise(col("p_brand")),
            when(col("p_size") > 25, col("p_type")).otherwise(lit(""))))
        .orderBy("p_partkey", "level", "term"),
      Some("""SELECT p_partkey, 'main' AS level, p_name AS term FROM part
        UNION ALL
        SELECT p_partkey, 'midsub', p_brand FROM part WHERE p_size % 7 <> 0
        UNION ALL
        SELECT p_partkey, 'sub', p_type FROM part WHERE p_size > 25
        ORDER BY p_partkey, level, term""")),

    QDef("topk_per_group_native",
      // The full custom-operator stack (§4.3 rung c): TopKPerGroupPlan
      // (logical) -> TopKPerGroupStrategy (planner) -> partial/final
      // bounded-heap SparkPlans with an exchange only between them —
      // top-3 parts per brand WITHOUT sorting anything: each input
      // partition prunes to <= 3 rows per brand before the shuffle,
      // where the window row_number spelling (topk_per_group) shuffles
      // and sorts every row. Same total order (price DESC, partkey
      // ASC), same oracle; the window over the pruned survivors only
      // re-derives the rank column for output parity.
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        val base = t(s, dir, "part")
          .select("p_brand", "p_partkey", "p_retailprice")
        val top = graft.plans.TopKPerGroup(
          base, Seq("p_brand"), "p_retailprice", "p_partkey", 3)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        top.withColumn("rk", row_number().over(w).cast("long"))
          .select("p_brand", "rk", "p_partkey", "p_retailprice")
          .orderBy("p_brand", "rk")
      },
      Some("""SELECT p_brand, rk, p_partkey, p_retailprice FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 CAST(row_number() OVER (PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rk
          FROM part) WHERE rk <= 3 ORDER BY p_brand, rk"""))
  )
}
