package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{ConvertName, Text}

/** Scalar-function surface: string / date / math / array / map / json
  * rows of SURVEY.md §2.2, plus the UDF-surface demonstrators.
  * All built-ins (codegen'd) except convert_name, which is inherently
  * branchy (O12) and ships as a Scala UDF with golden-tested semantics.
  */
object Scalars {
  import QDef._

  val all: Seq[QDef] = Seq(

    QDef("str_normalize",
      // O6 normalize_term chain on deliberately messy input.
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          Text.normTerm(concat(lit("  "), upper(col("text")), lit("   X  ")))
            .as("norm"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
          lower(trim(regexp_replace('  ' || upper(text) || '   X  ', '\s+', ' ', 'g'))) AS norm
        FROM documents ORDER BY doc_id""")),

    QDef("str_paren_strip",
      // O5: non-greedy parenthetical removal, multiple groups per value.
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          Text.stripParens(
            concat(col("p_name"), lit(" ("), col("p_brand"), lit(") tail (x)")))
            .as("stripped"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
          trim(regexp_replace(p_name || ' (' || p_brand || ') tail (x)',
                              '\(.*?\)', '', 'g')) AS stripped
        FROM part ORDER BY p_partkey""")),

    QDef("str_name_convert",
      // O12 convert_name incl. the title + " de " quirk (SURVEY §2.3-1).
      // On 'Last, Dr. First' input the quirk output is fully predictable,
      // so the oracle can assert it in plain SQL; the 16-keyword edge
      // cases are golden-tested in ConvertNameSpec.
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey"),
          ConvertName.asUdf(concat(col("c_name"), lit(", Dr. John"))).as("titled"),
          ConvertName.asUdf(col("c_name")).as("plain"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
          'Dr. John de ' || c_name AS titled,
          c_name AS plain
        FROM customer ORDER BY c_custkey""")),

    QDef("udf_scala",
      // UDF registered in the session catalog and invoked from SQL text.
      (s, dir) => {
        s.udf.register("convert_name", (n: String) => ConvertName(n))
        t(s, dir, "customer").createOrReplaceTempView("udf_scala_customer")
        s.sql("""SELECT c_custkey,
                   convert_name(c_name || ', Baron von Friedrich') AS titled
                 FROM udf_scala_customer ORDER BY c_custkey""")
      },
      // "Baron" then "von" both match; each is removed from the remainder.
      Some("""SELECT c_custkey, 'Baron von Friedrich de ' || c_name AS titled
        FROM customer ORDER BY c_custkey""")),

    QDef("str_uri_hash",
      // O23 URI minting as a pure built-in chain (sha2/conv/pmod).
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey"), Text.uriHash(col("c_name")).as("uri"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
          'r' || CAST(CAST(('0x' || substr(sha256(regexp_replace(lower(c_name), '[ ,]', '', 'g')), 1, 8)) AS BIGINT) % 100000000 AS VARCHAR) AS uri
        FROM customer ORDER BY c_custkey""")),

    QDef("date_funcs",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("od"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(to_date(col("o_orderdate")), lit(java.sql.Date.valueOf("1995-01-01")))
            .cast("long").as("days_since"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
          CAST(o_orderdate AS DATE) AS od,
          CAST(year(o_orderdate) AS BIGINT) AS yr,
          CAST(month(o_orderdate) AS BIGINT) AS mon,
          date_trunc('month', o_orderdate) AS month_start,
          datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        FROM orders ORDER BY o_orderkey""")),

    QDef("math_funcs",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"),
          abs(col("l_discount") - lit(0.05)).as("abs_d"),
          sqrt(col("l_quantity")).as("sqrt_q"),
          pow(col("l_quantity"), 2).as("q2"),
          floor(col("l_extendedprice") / 100).as("fl"),
          ceil(col("l_extendedprice") / 100).as("cl"),
          // round() itself is safe here: 2-decimal prices are dyadic at
          // .5, so both engines see exact halves and round away alike.
          round(col("l_extendedprice"), 0).as("r0"),
          // An FP-derived quotient is NOT safe under round() (Spark
          // rounds the shortest decimal repr, DuckDB the binary value):
          // use the engine-exact floor form.
          rx(col("l_extendedprice") / 7, 3).as("r3"))
        // (l_orderkey, l_linenumber) is not unique: total order over all
        // output columns so the row-order compare is deterministic.
        .orderBy("l_orderkey", "l_linenumber", "disc_price", "abs_d",
          "sqrt_q", "q2", "fl", "cl", "r0", "r3"),
      Some(s"""SELECT l_orderkey, l_linenumber,
          l_extendedprice * (1.0 - l_discount) AS disc_price,
          abs(l_discount - 0.05) AS abs_d,
          sqrt(l_quantity) AS sqrt_q,
          power(l_quantity, 2) AS q2,
          CAST(floor(l_extendedprice / 100) AS BIGINT) AS fl,
          CAST(ceil(l_extendedprice / 100) AS BIGINT) AS cl,
          round(l_extendedprice, 0) AS r0,
          ${rxSql("l_extendedprice / 7", 3)} AS r3
        FROM lineitem ORDER BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10""")),

    QDef("array_funcs",
      (s, dir) => {
        val toks = split(col("p_name"), " ")
        t(s, dir, "part")
          .select(col("p_partkey"),
            size(toks).cast("long").as("n_toks"),
            array_contains(toks, "widget").as("has_widget"),
            array_join(array_sort(array_distinct(toks)), "|").as("sorted_distinct"),
            array_join(transform(toks, x => upper(x)), "|").as("uppered"),
            // DuckDB's array_to_string of an empty list is NULL while
            // Spark's array_join is '' — coalesce on the oracle side.
            array_join(filter(toks, x => length(x) > 4), "|").as("long_toks"),
            array_join(concat(toks, array(col("p_brand"))), "|").as("with_brand"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
          len(string_split(p_name, ' ')) AS n_toks,
          list_contains(string_split(p_name, ' '), 'widget') AS has_widget,
          array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '|') AS sorted_distinct,
          array_to_string(list_transform(string_split(p_name, ' '), x -> upper(x)), '|') AS uppered,
          coalesce(array_to_string(list_filter(string_split(p_name, ' '), x -> length(x) > 4), '|'), '') AS long_toks,
          array_to_string(list_concat(string_split(p_name, ' '), [p_brand]), '|') AS with_brand
        FROM part ORDER BY p_partkey""")),

    QDef("map_funcs",
      (s, dir) => {
        val m = map(
          lit("AUTOMOBILE"), lit(1L), lit("BUILDING"), lit(2L),
          lit("FURNITURE"), lit(3L), lit("HOUSEHOLD"), lit(4L),
          lit("MACHINERY"), lit(5L))
        t(s, dir, "customer")
          .select(col("c_custkey"),
            coalesce(element_at(m, col("c_mktsegment")), lit(-1L)).as("seg_code"),
            array_join(map_keys(m), ",").as("seg_keys"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
          CAST(CASE c_mktsegment
            WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2
            WHEN 'FURNITURE' THEN 3 WHEN 'HOUSEHOLD' THEN 4
            WHEN 'MACHINERY' THEN 5 ELSE -1 END AS BIGINT) AS seg_code,
          'AUTOMOBILE,BUILDING,FURNITURE,HOUSEHOLD,MACHINERY' AS seg_keys
        FROM customer ORDER BY c_custkey""")),

    QDef("json_funcs",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k_typed"),
          concat(lit("{\"k\":"),
            get_json_object(col("props"), "$.k").cast("long"), lit("}")).as("rt"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
          '{"k":' || CAST(json_extract_string(props, '$.k') AS BIGINT) || '}' AS rt
        FROM events ORDER BY event_id""")),

    QDef("json_variant_extract",
      // The Spark 4 VARIANT type: semi-structured JSON parsed ONCE into
      // the binary variant encoding, then typed paths extracted with
      // variant_get — schema-on-read without a declared StructType (the
      // from_json path above needs the DDL up front; variant does not),
      // and O(path) access instead of re-tokenizing the JSON text per
      // field. The JSON here is built in-flight from lineitem columns,
      // so the oracle checks the round-trip against the originals;
      // decimals ride through the variant as exact decimal.
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          parse_json(to_json(struct(
            col("l_orderkey").as("k"),
            struct(money(col("l_quantity")).as("q")).as("m"),
            array(col("l_linestatus"), col("l_returnflag")).as("tags"))))
            .as("v"))
        .select(col("l_returnflag"),
          expr("variant_get(v, '$.k', 'bigint')").as("k"),
          expr("variant_get(v, '$.m.q', 'decimal(18,2)')").as("q"),
          expr("variant_get(v, '$.tags[0]', 'string')").as("tag0"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          min(col("k")).as("min_k"),
          sum(col("q")).cast("double").as("sum_q"),
          countDistinct(col("tag0")).as("n_status"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
          min(l_orderkey) AS min_k,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_q,
          count(DISTINCT l_linestatus) AS n_status
        FROM lineitem GROUP BY 1 ORDER BY 1"""))
  )
}
