package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Text

/** Data-selection, entity-resolution and secondary-index operators:
  * importance-weighted corpus selection (the DSIR shape), grid-binned
  * spatial containment joins, bitmap (bitset-per-segment)
  * co-occurrence indexes, shard-composed Pareto skylines, and
  * multi-pass blocked record linkage.
  *
  * Shared oracle-parity discipline (see Health.scala): every hashed
  * comparison is exact int64 arithmetic or a single IEEE division of
  * exact integers. Importance ratios are floor-quantized to integer
  * micros BEFORE any sum so scores are shuffle-order-exact; distances
  * are squared-integer (no sqrt needed for ranking); bitmaps are
  * 32-bit-per-word longs so no shift ever touches the sign bit.
  */
object Selection {
  import QDef._

  /** Hashed-bigram feature stream: (doc_id, lang, b, tgt) — one row
    * per bigram, bucketed into 128 salted-md5 features, with the
    * target-population flag. Shared by the DSIR scorer and its
    * distribution-shift audit.
    */
  private def dsirGrams(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.pipeline.Staged.disk(s, dir, "dsir_grams") {
      val toks = t(s, dir, "documents")
        .withColumn("tks", Text.tokens(Text.normTerm(col("text"))))
        .filter(size(col("tks")) >= 2)
      toks
        .select(col("doc_id"), col("lang"),
          explode(Text.shingles(col("tks"), 2)).as("g"))
        .withColumn("b",
          pmod(Text.md5Hash32(concat(lit("ds:"), col("g"))), lit(128L)))
        .withColumn("tgt", col("lang") === "de")
        .drop("g")
    }

  /** Per-raw-doc DSIR score + rank + group size + keep decision (top
    * 20% per language); see sample_importance_dsir for the derivation.
    */
  private def dsirRanked(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.pipeline.Staged(s, dir, "dsir_ranked") {
    val grams = dsirGrams(s, dir)
    val bc = grams.groupBy("b").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("tb"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("rb"))
    val tot = bc.agg(sum("tb").as("tt"), sum("rb").as("rt"))
    val ratio = bc.crossJoin(broadcast(tot))
      .withColumn("rm",
        expr("((tb + 1) * (rt + 128) * 1000000) div ((rb + 1) * (tt + 128))"))
      .select("b", "rm")
    val scored = grams.filter(!col("tgt"))
      .join(broadcast(ratio), "b")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_grams"), sum("rm").as("score_micro"))
    val wl = Window.partitionBy("lang")
    scored
      .withColumn("rank", row_number().over(
        wl.orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .withColumn("n_lang", count(lit(1)).over(wl))
      .withColumn("keep", col("rank") <= expr("(n_lang + 4) div 5"))
    }

  /** [[dsirRanked]] projected to the driver-checked schema. */
  private def dsirScored(s: org.apache.spark.sql.SparkSession, dir: String) =
    dsirRanked(s, dir)
      .select(col("doc_id"), col("lang"), col("n_grams"),
        col("score_micro"), col("rank"), col("keep"))

  val all: Seq[QDef] = Seq(

    QDef("sample_importance_dsir",
      // Importance-resampling selection (the DSIR shape, Xie et al.
      // 2023): score every raw document by how target-like its hashed
      // bigram features are, then keep the top 20% per language. The
      // feature space is the hashing trick (128 salted-md5 buckets — no
      // vocabulary pass, the same reason as text_feature_hash), the
      // per-bucket importance ratio is the Laplace-smoothed
      //   (t_b+1)/(T+128) over (r_b+1)/(R+128)
      // cross-multiplied into ONE integer floor-division to micros, and
      // a doc's score is the int64 SUM of its grams' ratio-micros — so
      // ranking is bit-exact under any shuffle order (the log-sum of
      // real DSIR would drag in ln(); the rational ratio keeps the
      // same ordering signal hash-checkable). At 100 TB: one corpus
      // scan builds the 128-row bucket table (map-side combined), the
      // table broadcasts back, the second pass is scan + broadcast join
      // + one window per language over doc-level rows. int64 holds
      // (t_b+1)*(R+128)*1e6 up to ~1e5 target x 1e8 raw grams; past
      // that the same quantization rides DECIMAL(38,0).
      (s, dir) => dsirScored(s, dir).orderBy("doc_id"),
      Some("""WITH toks AS (
          SELECT doc_id, lang,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS tks
          FROM documents),
        t2 AS (SELECT doc_id, lang, tks FROM toks WHERE len(tks) >= 2),
        grams AS (
          SELECT doc_id, lang,
                 CAST(('0x' || substr(md5('ds:' || g), 1, 8)) AS BIGINT) % 128 AS b,
                 lang = 'de' AS tgt
          FROM (SELECT doc_id, lang,
                       unnest(list_transform(range(len(tks) - 1),
                         i -> tks[i+1] || ' ' || tks[i+2])) AS g
                FROM t2)),
        bc AS (
          SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tb,
                 sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS rb
          FROM grams GROUP BY 1),
        tot AS (SELECT sum(tb) AS tt, sum(rb) AS rt FROM bc),
        ratio AS (
          SELECT b, CAST(((tb + 1) * (rt + 128) * 1000000) // ((rb + 1) * (tt + 128)) AS BIGINT) AS rm
          FROM bc CROSS JOIN tot),
        scored AS (
          SELECT g.doc_id, g.lang, count(*) AS n_grams,
                 CAST(sum(r.rm) AS BIGINT) AS score_micro
          FROM grams g JOIN ratio r USING (b)
          WHERE NOT g.tgt GROUP BY 1, 2),
        ranked AS (
          SELECT doc_id, lang, n_grams, score_micro,
                 CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank,
                 count(*) OVER (PARTITION BY lang) AS n_lang
          FROM scored)
        SELECT doc_id, lang, n_grams, score_micro, rank,
               rank <= (n_lang + 4) // 5 AS keep
        FROM ranked ORDER BY doc_id"""),
    ),

    QDef("join_spatial_radius",
      // Grid-binned spatial radius join — the 2-D generalization of
      // join_range_binned: every customer within Euclidean distance R
      // of a facility, without a cross join. Coordinates are the
      // deterministic md5 stand-in for a geocoding stage (same
      // discipline as the stubbed media codec): integer positions on a
      // 1000x1000 grid, so distances compare in EXACT int64 squared
      // form — no sqrt, no FP. Binning: cell = coord div R; any point
      // within R of (x,y) lies in the 3x3 cell neighborhood, so the
      // facility side (the small one) explodes x9 into its neighbor
      // cells and the customer side joins on ITS OWN single cell —
      // fact-side rows are never amplified, which is the posture that
      // matters when the probe side is 100 TB. Each binned candidate
      // is verified once by the exact predicate; per-customer nearest =
      // one window over the (bounded) verified matches.
      (s, dir) => {
        val R = 100L
        def gcoord(salt: String, k: org.apache.spark.sql.Column) =
          pmod(Text.md5Hash32(concat(lit(salt), k.cast("string"))), lit(1000L))
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"),
            gcoord("gx:", col("c_custkey")).as("cx"),
            gcoord("gy:", col("c_custkey")).as("cy"))
          .withColumn("cellx", expr(s"cx div $R"))
          .withColumn("celly", expr(s"cy div $R"))
        val supp = t(s, dir, "supplier")
          .select(col("s_suppkey"),
            gcoord("sgx:", col("s_suppkey")).as("sx"),
            gcoord("sgy:", col("s_suppkey")).as("sy"))
        val sCells = supp
          .withColumn("dx", explode(sequence(lit(-1L), lit(1L))))
          .withColumn("dy", explode(sequence(lit(-1L), lit(1L))))
          .select(col("s_suppkey"), col("sx"), col("sy"),
            (expr(s"sx div $R") + col("dx")).as("cellx"),
            (expr(s"sy div $R") + col("dy")).as("celly"))
        val matches = cust.join(broadcast(sCells), Seq("cellx", "celly"))
          .withColumn("d2",
            (col("cx") - col("sx")) * (col("cx") - col("sx")) +
              (col("cy") - col("sy")) * (col("cy") - col("sy")))
          .filter(col("d2") <= R * R)
        matches
          .withColumn("rn", row_number().over(
            Window.partitionBy("c_custkey").orderBy(col("d2"), col("s_suppkey"))))
          .withColumn("n_near",
            count(lit(1)).over(Window.partitionBy("c_custkey")))
          .filter(col("rn") === 1)
          .select(col("c_custkey"), col("n_near"),
            col("s_suppkey").as("nearest_supp"), col("d2").as("d2_min"))
          .orderBy("c_custkey")
      },
      Some("""WITH c AS (
          SELECT c_custkey,
                 CAST(('0x' || substr(md5('gx:' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS cx,
                 CAST(('0x' || substr(md5('gy:' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS cy
          FROM customer),
        s AS (
          SELECT s_suppkey,
                 CAST(('0x' || substr(md5('sgx:' || CAST(s_suppkey AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS sx,
                 CAST(('0x' || substr(md5('sgy:' || CAST(s_suppkey AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS sy
          FROM supplier),
        p AS (
          SELECT c.c_custkey, s.s_suppkey,
                 (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS d2
          FROM c CROSS JOIN s
          WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 10000)
        SELECT c_custkey, n_near, s_suppkey AS nearest_supp, d2 AS d2_min
        FROM (SELECT *,
                     row_number() OVER (PARTITION BY c_custkey ORDER BY d2, s_suppkey) AS rn,
                     count(*) OVER (PARTITION BY c_custkey) AS n_near
              FROM p)
        WHERE rn = 1 ORDER BY c_custkey"""),
    ),

    QDef("layout_bitmap_index",
      // Bitmap co-occurrence index — the compressed-bitset counterpart
      // of layout_inverted_index: per (term, 32-doc word block), one
      // long whose bits mark the docs containing the term (bit_or is
      // idempotent, so no distinct pass is needed). Co-occurrence of
      // any term pair is then Σ bit_count(a & b) over word-aligned
      // blocks — a join on the word key plus popcount, never an
      // explode of per-doc pairs, and the bitmap for a segment is
      // ~n_docs/8 bytes regardless of term frequency. Words are 32
      // bits inside a long so no shift ever reaches the sign bit
      // (DuckDB range-checks << on BIGINT). The exact per-pair distinct
      // count is computed alongside and must EQUAL the bitmap count —
      // the index is lossless, which is the whole point over sketches.
      // At 100 TB the bitmap build is one map-side-combined aggregate
      // keyed (term, doc_id div 32); pair scoring touches only the
      // top-K vocabulary's bitmaps.
      (s, dir) => {
        val td = t(s, dir, "documents")
          .withColumn("tks", Text.tokens(Text.normTerm(col("text"))))
          .select(col("doc_id"), explode(col("tks")).as("term"))
          .filter(length(col("term")) > 0)
        // NOTE (r18): eager checkpoints on top/bm/dt were tried and
        // REVERTED — exchange reuse already dedups the tokenize
        // explode below the shared aggregates, and the checkpoints
        // cost +1.1 s warm median in the interleaved A/B.
        val top = td.groupBy("term").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("term")).limit(10)
          .select("term")
        val bm = td.join(broadcast(top), "term")
          .withColumn("w", expr("doc_id div 32"))
          .groupBy("term", "w")
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pmod(doc_id, 32) AS INT)))").as("bits"))
        val dt = td.join(broadcast(top), "term").distinct()
        val pairs = top.select(col("term").as("term_a"))
          .crossJoin(top.select(col("term").as("term_b")))
          .filter(col("term_a") < col("term_b"))
        val co = bm.select(col("term").as("term_a"), col("w"), col("bits").as("ba"))
          .join(bm.select(col("term").as("term_b"), col("w"), col("bits").as("bb")), Seq("w"))
          .filter(col("term_a") < col("term_b"))
          .groupBy("term_a", "term_b")
          .agg(count(lit(1)).as("n_words"),
            sum(expr("bit_count(ba & bb)")).as("co_docs"))
        val ex = dt.select(col("term").as("term_a"), col("doc_id"))
          .join(dt.select(col("term").as("term_b"), col("doc_id")), Seq("doc_id"))
          .filter(col("term_a") < col("term_b"))
          .groupBy("term_a", "term_b")
          .agg(count(lit(1)).as("exact_docs"))
        pairs.join(co, Seq("term_a", "term_b"), "left")
          .join(ex, Seq("term_a", "term_b"), "left")
          .select(col("term_a"), col("term_b"),
            coalesce(col("n_words"), lit(0L)).as("n_words"),
            coalesce(col("co_docs"), lit(0L)).as("co_docs"),
            coalesce(col("exact_docs"), lit(0L)).as("exact_docs"))
          .orderBy("term_a", "term_b")
      },
      Some("""WITH toks AS (
          SELECT doc_id,
                 unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
          FROM documents),
        td0 AS (SELECT doc_id, term FROM toks WHERE len(term) > 0),
        top AS (
          SELECT term FROM (SELECT term, count(*) AS c FROM td0 GROUP BY 1)
          ORDER BY c DESC, term LIMIT 10),
        td AS (SELECT DISTINCT t.doc_id, t.term FROM td0 t JOIN top USING (term)),
        bm AS (
          SELECT term, doc_id // 32 AS w,
                 bit_or(CAST(1 AS BIGINT) << CAST(doc_id % 32 AS INT)) AS bits
          FROM td GROUP BY 1, 2),
        pairs AS (
          SELECT a.term AS term_a, b.term AS term_b
          FROM top a JOIN top b ON a.term < b.term),
        co AS (
          SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_words,
                 CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) AS co_docs
          FROM bm a JOIN bm b ON a.w = b.w AND a.term < b.term
          GROUP BY 1, 2),
        ex AS (
          SELECT a.term AS term_a, b.term AS term_b, count(*) AS exact_docs
          FROM td a JOIN td b ON a.doc_id = b.doc_id AND a.term < b.term
          GROUP BY 1, 2)
        SELECT p.term_a, p.term_b,
               CAST(COALESCE(co.n_words, 0) AS BIGINT) AS n_words,
               CAST(COALESCE(co.co_docs, 0) AS BIGINT) AS co_docs,
               CAST(COALESCE(ex.exact_docs, 0) AS BIGINT) AS exact_docs
        FROM pairs p
        LEFT JOIN co USING (term_a, term_b)
        LEFT JOIN ex USING (term_a, term_b)
        ORDER BY term_a, term_b"""),
    ),

    QDef("select_pareto_skyline",
      // Pareto-skyline selection per order priority: orders not
      // dominated on (totalprice, orderdate) — maximize both. The
      // scale property is ALGEBRAIC: skylines compose (skyline(A∪B) =
      // skyline(skyline(A) ∪ skyline(B))), so phase 1 computes a LOCAL
      // skyline inside each of 32 hash shards (a per-shard window —
      // fully parallel, removes ~all dominated rows), and only the
      // surviving sliver reaches the per-priority merge window. The
      // single-window form would serialize each priority through one
      // reducer at 100 TB; the shard pre-filter makes the final window
      // see O(skyline) rows, not O(n). Dominance is tested with two
      // RANGE frames over exact int64 cents/epoch-days: the max date
      // among STRICTLY-higher prices (desc range .. -1) and among
      // EQUAL prices (range 0..0) — dominated iff either beats this
      // row's date. Ties on both axes stay on the skyline (no strict
      // dominator exists), matching the textbook definition. The
      // oracle runs the one-window form: the pre-filter provably
      // never changes the result set (any dominator of a dropped row
      // itself survives its shard's local skyline, by transitivity).
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            (money(col("o_totalprice")) * 100).cast("long").as("price_c"),
            datediff(col("o_orderdate").cast("date"),
              lit("1970-01-01").cast("date")).cast("long").as("epoch_day"))
        def skyline(df: org.apache.spark.sql.DataFrame, parts: org.apache.spark.sql.Column*) = {
          val base = Window.partitionBy(parts: _*).orderBy(col("price_c").desc)
          val hi = base.rangeBetween(Window.unboundedPreceding, -1)
          val eq = base.rangeBetween(Window.currentRow, Window.currentRow)
          df.withColumn("mx_hi", max(col("epoch_day")).over(hi))
            .withColumn("mx_eq", max(col("epoch_day")).over(eq))
            .filter(!(coalesce(col("mx_hi") >= col("epoch_day"), lit(false)) ||
              col("mx_eq") > col("epoch_day")))
            .drop("mx_hi", "mx_eq")
        }
        val local = skyline(
          o.withColumn("shard", pmod(col("o_orderkey"), lit(32L))),
          col("o_orderpriority"), col("shard")).drop("shard")
        skyline(local, col("o_orderpriority"))
          .select(col("o_orderkey"), col("o_orderpriority"),
            (col("price_c").cast("double") / 100).as("price"),
            col("epoch_day"))
          .orderBy(col("o_orderpriority"), col("price_c").desc, col("o_orderkey"))
      },
      Some("""WITH o AS (
          SELECT o_orderkey, o_orderpriority,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS epoch_day
          FROM orders),
        f AS (
          SELECT *,
            max(epoch_day) OVER (PARTITION BY o_orderpriority ORDER BY price_c DESC
              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx_hi,
            max(epoch_day) OVER (PARTITION BY o_orderpriority ORDER BY price_c DESC
              RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS mx_eq
          FROM o)
        SELECT o_orderkey, o_orderpriority,
               CAST(price_c AS DOUBLE) / 100 AS price, epoch_day
        FROM f
        WHERE NOT (COALESCE(mx_hi >= epoch_day, FALSE) OR mx_eq > epoch_day)
        ORDER BY o_orderpriority, price_c DESC, o_orderkey"""),
    ),

    QDef("join_record_linkage",
      // Entity resolution with MULTI-PASS EXACT BLOCKING and
      // Fellegi-Sunter-style integer agreement weights: link the
      // customer table against a deterministically perturbed snapshot
      // of itself (every 7th name truncated, every 13th nation bumped,
      // every balance jittered ±50 cents by salted md5 — the
      // reproducible stand-in for a second source system). Candidates
      // come ONLY from two equi-join blocking passes — exact normalized
      // name, then (nation, shifted-cents div 1000) — never a cross
      // join, so each pass is a hash join on a high-cardinality key and
      // the pair universe stays linear; union + distinct merges the
      // passes (the standard multi-pass recall trick: what one key
      // misses the other catches). Every candidate scores three field
      // agreements with fixed integer log-odds stand-ins (+40/−20
      // name, +30/−25 balance-within-60¢, +10/−15 nation) and
      // thresholds into match / possible / nonmatch; ground truth
      // (same key) is known by construction, so the output reports
      // per-decision pair and true-pair counts — the
      // precision-per-threshold table an ER pipeline actually ships.
      // Cents are shifted +100000 before the div-1000 bucket so the
      // quotient never goes negative (Spark div truncates toward
      // zero, DuckDB // floors — they disagree below zero).
      (s, dir) => {
        val a = t(s, dir, "customer").select(
          col("c_custkey").as("key_a"),
          lower(col("c_name")).as("name_a"),
          col("c_nationkey").cast("long").as("nat_a"),
          (money(col("c_acctbal")) * 100).cast("long").as("cents_a"))
        val b = t(s, dir, "customer").select(
          col("c_custkey").as("key_b"),
          when(pmod(col("c_custkey"), lit(7L)) === 0,
            expr("substring(lower(c_name), 1, length(c_name) - 1)"))
            .otherwise(lower(col("c_name"))).as("name_b"),
          (col("c_nationkey").cast("long") +
            when(pmod(col("c_custkey"), lit(13L)) === 0, 1L).otherwise(0L))
            .as("nat_b"),
          ((money(col("c_acctbal")) * 100).cast("long") +
            pmod(Text.md5Hash32(
              concat(lit("pert:"), col("c_custkey").cast("string"))),
              lit(101L)) - 50L).as("cents_b"))
        val p1 = a.join(b, col("name_a") === col("name_b"))
        val p2 = a.join(b, col("nat_a") === col("nat_b") &&
          expr("(cents_a + 100000) div 1000") ===
            expr("(cents_b + 100000) div 1000"))
        val scored = p1.union(p2).distinct()
          .withColumn("score",
            (when(col("name_a") === col("name_b"), 40L).otherwise(-20L) +
              when(abs(col("cents_a") - col("cents_b")) <= 60L, 30L)
                .otherwise(-25L) +
              when(col("nat_a") === col("nat_b"), 10L).otherwise(-15L))
              .cast("long"))
          .withColumn("decision",
            when(col("score") >= 60, "match")
              .when(col("score") >= 20, "possible")
              .otherwise("nonmatch"))
        scored.groupBy("decision")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("key_a") === col("key_b"), 1L).otherwise(0L))
              .as("n_true"),
            min("score").as("min_score"), max("score").as("max_score"))
          .orderBy("decision")
      },
      Some("""WITH a AS (
          SELECT c_custkey AS key_a, lower(c_name) AS name_a,
                 CAST(c_nationkey AS BIGINT) AS nat_a,
                 CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents_a
          FROM customer),
        b AS (
          SELECT c_custkey AS key_b,
                 CASE WHEN c_custkey % 7 = 0
                      THEN substr(lower(c_name), 1, length(c_name) - 1)
                      ELSE lower(c_name) END AS name_b,
                 CAST(c_nationkey AS BIGINT)
                   + CASE WHEN c_custkey % 13 = 0 THEN 1 ELSE 0 END AS nat_b,
                 CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   + CAST(('0x' || substr(md5('pert:' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 101
                   - 50 AS cents_b
          FROM customer),
        cand AS (
          SELECT DISTINCT * FROM (
            SELECT a.*, b.* FROM a JOIN b ON name_a = name_b
            UNION ALL
            SELECT a.*, b.* FROM a JOIN b
              ON nat_a = nat_b
             AND (cents_a + 100000) // 1000 = (cents_b + 100000) // 1000)),
        scored AS (
          SELECT *,
            CAST(CASE WHEN name_a = name_b THEN 40 ELSE -20 END
               + CASE WHEN abs(cents_a - cents_b) <= 60 THEN 30 ELSE -25 END
               + CASE WHEN nat_a = nat_b THEN 10 ELSE -15 END AS BIGINT) AS score
          FROM cand),
        dec AS (
          SELECT *, CASE WHEN score >= 60 THEN 'match'
                         WHEN score >= 20 THEN 'possible'
                         ELSE 'nonmatch' END AS decision
          FROM scored)
        SELECT decision, count(*) AS n_pairs,
               CAST(sum(CASE WHEN key_a = key_b THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
               min(score) AS min_score, max(score) AS max_score
        FROM dec GROUP BY 1 ORDER BY decision"""),
    ),

    QDef("sample_dsir_shift",
      // Distribution-shift audit of the DSIR selector — the measured
      // property that justifies importance resampling: total variation
      // distance between the target's hashed-feature distribution and
      // three MATCHED-RATE 20% selections — the DSIR top-20%, a
      // salted-md5 random control, and the inverse (bottom-20%) —
      // plus the full raw pool for context. Matched rates matter: any
      // finite subsample's TVD is inflated by multinomial sampling
      // noise, so "selected vs full pool" conflates shift with sample
      // size (the first cut of this audit did exactly that and made
      // the selector look harmful); against the same-size random
      // control the ordering selected < random < inverse holds at
      // every SF and IS the selector's signal. TVD is exact integer
      // micros (per-bucket count·1e6 div total, abs-diffed, summed,
      // halved) — hash-exact, no FP; same discipline as
      // sim_recall_graph_route: assumed quality is not quality.
      (s, dir) => {
        // One pass, not six: the three selections are FLAGS on the
        // per-doc ranked table (one row per raw doc), joined onto the
        // gram stream once and counted with conditional sums — the
        // funnel-flags shape. Locally the doc-level flag side
        // auto-broadcasts; at 100 TB it outgrows broadcast and the same
        // plan degrades gracefully to one shuffle-hash join on doc_id,
        // still a single scan of the gram stream (vs the previous
        // 3-join + 3-groupBy form that re-aggregated it five times).
        val g = dsirGrams(s, dir)
        val flags = dsirRanked(s, dir).select(
          col("doc_id"),
          col("keep").as("f0"),
          (pmod(Text.md5Hash32(
            concat(lit("rs:"), col("doc_id").cast("string"))), lit(5L)) === 0)
            .as("f1"),
          (col("rank") > col("n_lang") - expr("(n_lang + 4) div 5")).as("f2"))
        // Every non-target doc in the gram stream has a ranked row, so
        // the left join's null flags occur exactly on target-doc grams,
        // which the !tgt conditions exclude anyway. No broadcast hint:
        // flags is doc-count-sized, and the graceful-degradation story
        // above only holds if AQE is free to demote the broadcast.
        val per = g.join(flags, Seq("doc_id"), "left")
          .groupBy("b").agg(
            sum(when(col("tgt"), 1L).otherwise(0L)).as("tb"),
            sum(when(!col("tgt"), 1L).otherwise(0L)).as("rb"),
            sum(when(!col("tgt") && col("f0"), 1L).otherwise(0L)).as("sb0"),
            sum(when(!col("tgt") && col("f1"), 1L).otherwise(0L)).as("sb1"),
            sum(when(!col("tgt") && col("f2"), 1L).otherwise(0L)).as("sb2"))
          // BOUNDED (128 feature buckets) but referenced twice (totals
          // + tvd) — unpinned, the gram-stream join+aggregate (the one
          // corpus-sized stage here) ran twice per execution (r18).
          .transform(d => graft.pipeline.Lineage.checkpoint(d))
        val tot = per.agg(sum("tb").as("tt"), sum("rb").as("rt"),
          sum("sb0").as("st0"), sum("sb1").as("st1"), sum("sb2").as("st2"))
        val tvd = per.crossJoin(broadcast(tot))
          .select(
            abs(expr("(rb * 1000000) div rt") - expr("(tb * 1000000) div tt"))
              .as("draw"),
            abs(expr("(sb0 * 1000000) div st0") - expr("(tb * 1000000) div tt"))
              .as("d0"),
            abs(expr("(sb1 * 1000000) div st1") - expr("(tb * 1000000) div tt"))
              .as("d1"),
            abs(expr("(sb2 * 1000000) div st2") - expr("(tb * 1000000) div tt"))
              .as("d2"))
          .agg(expr("sum(draw) div 2").as("tvd_raw"),
            expr("sum(d0) div 2").as("tvd0"),
            expr("sum(d1) div 2").as("tvd1"),
            expr("sum(d2) div 2").as("tvd2"))
        // flags has one row per non-target doc in the gram stream, so
        // its row count IS nd_raw and the selection sizes are flag sums.
        val counts = flags.agg(
          count(lit(1)).as("nd_raw"),
          sum(when(col("f0"), 1L).otherwise(0L)).as("nd0"),
          sum(when(col("f1"), 1L).otherwise(0L)).as("nd1"),
          sum(when(col("f2"), 1L).otherwise(0L)).as("nd2"))
        tvd.crossJoin(broadcast(tot)).crossJoin(broadcast(counts))
          .selectExpr("""stack(4,
              'a_selected', nd0, st0, tvd0,
              'b_random_ctl', nd1, st1, tvd1,
              'c_inverse', nd2, st2, tvd2,
              'd_raw_pool', nd_raw, rt, tvd_raw)
            AS (population, n_docs, n_grams, tvd_vs_target_micro)""")
          .orderBy("population")
      },
      Some("""WITH toks AS (
          SELECT doc_id, lang,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS tks
          FROM documents),
        t2 AS (SELECT doc_id, lang, tks FROM toks WHERE len(tks) >= 2),
        grams AS (
          SELECT doc_id, lang,
                 CAST(('0x' || substr(md5('ds:' || g), 1, 8)) AS BIGINT) % 128 AS b,
                 lang = 'de' AS tgt
          FROM (SELECT doc_id, lang,
                       unnest(list_transform(range(len(tks) - 1),
                         i -> tks[i+1] || ' ' || tks[i+2])) AS g
                FROM t2)),
        bc AS (
          SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tb0,
                 sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS rb0
          FROM grams GROUP BY 1),
        tot0 AS (SELECT sum(tb0) AS tt0, sum(rb0) AS rt0 FROM bc),
        ratio AS (
          SELECT b, CAST(((tb0 + 1) * (rt0 + 128) * 1000000) // ((rb0 + 1) * (tt0 + 128)) AS BIGINT) AS rm
          FROM bc CROSS JOIN tot0),
        scored AS (
          SELECT g.doc_id, g.lang, CAST(sum(r.rm) AS BIGINT) AS score_micro
          FROM grams g JOIN ratio r USING (b)
          WHERE NOT g.tgt GROUP BY 1, 2),
        ranked AS (
          SELECT doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY score_micro DESC, doc_id) AS rank,
                 count(*) OVER (PARTITION BY lang) AS n_lang
          FROM scored),
        s0 AS (SELECT doc_id FROM ranked WHERE rank <= (n_lang + 4) // 5),
        s1 AS (SELECT doc_id FROM ranked
               WHERE CAST(('0x' || substr(md5('rs:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 = 0),
        s2 AS (SELECT doc_id FROM ranked
               WHERE rank > n_lang - (n_lang + 4) // 5),
        td AS (SELECT b, count(*) AS tb FROM grams WHERE tgt GROUP BY 1),
        rd AS (SELECT b, count(*) AS rb FROM grams WHERE NOT tgt GROUP BY 1),
        sd0 AS (SELECT b, count(*) AS sb0 FROM grams g JOIN s0 USING (doc_id)
                WHERE NOT tgt GROUP BY 1),
        sd1 AS (SELECT b, count(*) AS sb1 FROM grams g JOIN s1 USING (doc_id)
                WHERE NOT tgt GROUP BY 1),
        sd2 AS (SELECT b, count(*) AS sb2 FROM grams g JOIN s2 USING (doc_id)
                WHERE NOT tgt GROUP BY 1),
        spine AS (SELECT DISTINCT b FROM grams),
        per AS (
          SELECT spine.b,
                 CAST(coalesce(td.tb, 0) AS BIGINT) AS tb,
                 CAST(coalesce(rd.rb, 0) AS BIGINT) AS rb,
                 CAST(coalesce(sd0.sb0, 0) AS BIGINT) AS sb0,
                 CAST(coalesce(sd1.sb1, 0) AS BIGINT) AS sb1,
                 CAST(coalesce(sd2.sb2, 0) AS BIGINT) AS sb2
          FROM spine LEFT JOIN td USING (b) LEFT JOIN rd USING (b)
          LEFT JOIN sd0 USING (b) LEFT JOIN sd1 USING (b)
          LEFT JOIN sd2 USING (b)),
        tot AS (SELECT CAST(sum(tb) AS BIGINT) AS tt,
                       CAST(sum(rb) AS BIGINT) AS rt,
                       CAST(sum(sb0) AS BIGINT) AS st0,
                       CAST(sum(sb1) AS BIGINT) AS st1,
                       CAST(sum(sb2) AS BIGINT) AS st2 FROM per),
        tvd AS (
          SELECT CAST(sum(abs((rb * 1000000) // rt - (tb * 1000000) // tt)) // 2 AS BIGINT) AS tvd_raw,
                 CAST(sum(abs((sb0 * 1000000) // st0 - (tb * 1000000) // tt)) // 2 AS BIGINT) AS tvd0,
                 CAST(sum(abs((sb1 * 1000000) // st1 - (tb * 1000000) // tt)) // 2 AS BIGINT) AS tvd1,
                 CAST(sum(abs((sb2 * 1000000) // st2 - (tb * 1000000) // tt)) // 2 AS BIGINT) AS tvd2
          FROM per CROSS JOIN tot),
        nds AS (
          SELECT (SELECT count(DISTINCT doc_id) FROM grams WHERE NOT tgt) AS nd_raw,
                 (SELECT count(*) FROM s0) AS nd0,
                 (SELECT count(*) FROM s1) AS nd1,
                 (SELECT count(*) FROM s2) AS nd2)
        SELECT population, n_docs, n_grams, tvd_vs_target_micro FROM (
          SELECT 'a_selected' AS population, nd0 AS n_docs, st0 AS n_grams,
                 tvd0 AS tvd_vs_target_micro FROM nds, tot, tvd
          UNION ALL SELECT 'b_random_ctl', nd1, st1, tvd1 FROM nds, tot, tvd
          UNION ALL SELECT 'c_inverse', nd2, st2, tvd2 FROM nds, tot, tvd
          UNION ALL SELECT 'd_raw_pool', nd_raw, rt, tvd_raw FROM nds, tot, tvd)
        ORDER BY population"""),
    ),

    QDef("sample_srm_check",
      // Deterministic experiment assignment + sample-ratio-mismatch
      // guard — the integrity check every A/B platform runs before
      // reading an experiment: users hash into UNEQUAL variant arms
      // (40/20/20/10/10 via md5 bucket ranges — sticky, coordination-
      // free, the same assignment on any engine or rerun), observed arm
      // counts are compared to expected under the declared split, and
      // the chi-squared goodness-of-fit statistic flags SRM at the
      // 0.1% critical value (18.467 for 4 dof — a literal; an SRM'd
      // experiment's metrics are unreadable no matter how pretty).
      // Distinct from agg_chi2_independence: that tests association
      // between two observed columns; this tests one observed column
      // against DECLARED weights. Numeric discipline as there: exact
      // integer counts, expected = one IEEE division each, per-arm
      // contributions rx-rounded then decimal-summed (order-free) in a
      // scalar aggregate attached back by broadcast — no window at
      // all, so the guard spec's no-global-window gate holds by
      // construction. Corpus-sized work: one distinct + one bounded
      // aggregate.
      (s, dir) => {
        val arms = Seq(("control", 0, 40), ("t1_rank", 40, 60),
          ("t2_dedup", 60, 80), ("t3_mix", 80, 90), ("t4_pack", 90, 100))
        val armDim = {
          import s.implicits._
          arms.map { case (v, lo, hi) => (v, lo, hi, hi - lo) }
            .toDF("variant", "lo", "hi", "weight_pct")
        }
        val assigned = t(s, dir, "events")
          .select(col("user_id")).distinct()
          .withColumn("b", pmod(Text.md5Hash32(
            concat(lit("exp1:"), col("user_id").cast("string"))), lit(100L)))
          .join(broadcast(armDim),
            col("b") >= col("lo") && col("b") < col("hi"))
        val obs = assigned.groupBy("variant", "weight_pct")
          .agg(count(lit(1)).as("n_users"))
        val tot = obs.agg(sum("n_users").as("n"))
        val expd = (col("n") * col("weight_pct")).cast("double") / lit(100.0)
        val contrib = rx((col("n_users").cast("double") - expd) *
          (col("n_users").cast("double") - expd) / expd, 6)
        val cells = obs.crossJoin(broadcast(tot))
          .withColumn("expected", rx(expd, 2))
          .withColumn("cell_chi2", contrib)
        val chi2 = cells.agg(
          sum(col("cell_chi2").cast("decimal(38,6)")).cast("double").as("chi2"))
        cells.crossJoin(broadcast(chi2))
          .select(col("variant"), col("weight_pct"), col("n_users"),
            col("expected"), col("cell_chi2"), col("chi2"),
            (col("chi2") > 18.467).as("srm"))
          .orderBy("variant")
      }, {
        val armsSql = Seq(("control", 0, 40), ("t1_rank", 40, 60),
          ("t2_dedup", 60, 80), ("t3_mix", 80, 90), ("t4_pack", 90, 100))
          .map { case (v, lo, hi) => s"('$v', $lo, $hi, ${hi - lo})" }
          .mkString(", ")
        Some(s"""WITH arms(variant, lo, hi, weight_pct) AS (VALUES $armsSql),
          u AS (
            SELECT DISTINCT user_id FROM events),
          assigned AS (
            SELECT a.variant, a.weight_pct
            FROM (SELECT user_id,
                         CAST(('0x' || substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
                  FROM u) h
            JOIN arms a ON h.b >= a.lo AND h.b < a.hi),
          obs AS (
            SELECT variant, weight_pct, CAST(count(*) AS BIGINT) AS n_users
            FROM assigned GROUP BY 1, 2),
          tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS n FROM obs),
          g AS (
            SELECT variant, weight_pct, n_users,
                   CAST(n * weight_pct AS DOUBLE) / 100.0 AS e
            FROM obs CROSS JOIN tot),
          g2 AS (
            SELECT variant, weight_pct, n_users,
                   ${rxSql("e", 2)} AS expected,
                   ${rxSql("(CAST(n_users AS DOUBLE) - e) * (CAST(n_users AS DOUBLE) - e) / e", 6)} AS cell_chi2
            FROM g)
          SELECT variant, CAST(weight_pct AS INT) AS weight_pct, n_users,
                 expected, cell_chi2,
                 CAST(sum(CAST(cell_chi2 AS DECIMAL(38,6))) OVER () AS DOUBLE) AS chi2,
                 CAST(sum(CAST(cell_chi2 AS DECIMAL(38,6))) OVER () AS DOUBLE) > 18.467 AS srm
          FROM g2 ORDER BY variant""")
      }),

    QDef("agg_raking_ipf",
      // Raking / iterative proportional fitting (Deming & Stephan) —
      // the dataset-balancing pass that reweights a skewed sample to
      // declared marginal targets (here: uniform across segments AND
      // uniform across nations) without touching the cells' interior
      // association structure. Three synchronous IPF rounds, each a
      // row-margin step then a column-margin step; every update is
      // w ← (w · target) div current — a WIDE-integer multiply
      // (DECIMAL(38,0) ≙ HUGEINT, the product overflows int64 past
      // sf0.01) whose floor-divided RESULT is back in int64 micros, so
      // the whole trajectory is integer-exact and engine-identical
      // (double IPF would compound fold-order drift round over round).
      // Scale shape: ONE corpus-sized aggregate builds the cell table;
      // the cell table is provably ≤ |seg|·|nat| rows (the category
      // product — 125 here, never corpus-scaled), so the iterations
      // run DRIVER-SIDE on the collected cells in exact BigInt
      // arithmetic (trajectory-identical to the DECIMAL(38,0)/HUGEINT
      // relational spelling the oracle keeps). The round-11 relational
      // rounds cost six tiny-table shuffles × the fixed stage floor
      // (8.0× the oracle at sf0.1) while moving 125 rows; the
      // driver pass is the "≤NBuckets driver list" discipline — the
      // corpus never leaves the cluster, only the synopsis does.
      (s, dir) => {
        val cells = t(s, dir, "customer")
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_mktsegment").as("seg"), col("n_name").as("nat"))
          .agg(count(lit(1)).as("n"))
        val rows = cells.collect() // ≤ |seg|·|nat| — category-product bound
        val total = rows.map(_.getLong(2)).sum
        val tgtSeg = total * 1000000L / rows.map(_.getString(0)).distinct.length
        val tgtNat = total * 1000000L / rows.map(_.getString(1)).distinct.length
        var w = rows.toSeq.map(r =>
          (r.getString(0), r.getString(1), r.getLong(2),
            BigInt(r.getLong(2)) * 1000000L))
        for (_ <- 1 to 3) {
          // BigInt `/` truncates toward zero == floor for these
          // all-positive weights — the div/`//` parity argument.
          val cs = w.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._4).sum }
          w = w.map { case (sg, nt, n, wv) => (sg, nt, n, wv * tgtSeg / cs(sg)) }
          val cn = w.groupBy(_._2).map { case (k, xs) => k -> xs.map(_._4).sum }
          w = w.map { case (sg, nt, n, wv) => (sg, nt, n, wv * tgtNat / cn(nt)) }
        }
        import s.implicits._
        w.map { case (sg, nt, n, wv) => (sg, nt, n, wv.toLong) }
          .toDF("seg", "nat", "n", "w_micro")
          .orderBy("seg", "nat")
      }, {
        val rounds = (1 to 3).map { i =>
          s"""rs$i AS (
              SELECT seg, CAST(sum(w) AS BIGINT) AS cur_seg
              FROM w${i - 1} GROUP BY 1),
            wr$i AS (
              SELECT w.seg, w.nat, w.n, w.tgt_seg, w.tgt_nat,
                     CAST((CAST(w.w AS HUGEINT) * w.tgt_seg) // rs$i.cur_seg AS BIGINT) AS w
              FROM w${i - 1} w JOIN rs$i ON rs$i.seg = w.seg),
            cs$i AS (
              SELECT nat, CAST(sum(w) AS BIGINT) AS cur_nat
              FROM wr$i GROUP BY 1),
            w$i AS (
              SELECT w.seg, w.nat, w.n, w.tgt_seg, w.tgt_nat,
                     CAST((CAST(w.w AS HUGEINT) * w.tgt_nat) // cs$i.cur_nat AS BIGINT) AS w
              FROM wr$i w JOIN cs$i ON cs$i.nat = w.nat)"""
        }.mkString(",\n")
        Some(s"""WITH cells AS (
            SELECT c_mktsegment AS seg, n_name AS nat,
                   CAST(count(*) AS BIGINT) AS n
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2),
          dims AS (
            SELECT CAST(sum(n) AS BIGINT) AS total,
                   CAST(count(DISTINCT seg) AS BIGINT) AS r,
                   CAST(count(DISTINCT nat) AS BIGINT) AS c
            FROM cells),
          w0 AS (
            SELECT seg, nat, n, n * 1000000 AS w,
                   CAST((total * 1000000) // r AS BIGINT) AS tgt_seg,
                   CAST((total * 1000000) // c AS BIGINT) AS tgt_nat
            FROM cells CROSS JOIN dims),
          $rounds
          SELECT seg, nat, n, CAST(w AS BIGINT) AS w_micro
          FROM w3 ORDER BY seg, nat""")
      }),

    QDef("sample_strat_neyman",
      // Neyman-optimal stratified allocation (n_h ∝ N_h·σ_h) of a
      // 100-doc sample across language strata — the sampling-theory
      // upgrade over proportional allocation: variable strata get more
      // budget, so the stratified mean's variance is minimized at the
      // same cost. Per-stratum σ comes from exact integer power sums
      // (population variance, the moments discipline: one IEEE tree on
      // identical doubles); weights N_h·σ_h are rx-rounded then
      // decimal-summed so the normalizer is order-free; and the
      // allocation rounds with LARGEST-REMAINDER (Hamilton) so the
      // final counts sum to EXACTLY the declared budget — floor-only
      // allocation silently under-spends and naive rounding
      // over-spends. Ties in the remainder ranking break by stratum
      // key. Only the per-stratum aggregate is corpus-sized; the
      // allocation runs on one row per stratum.
      (s, dir) => {
        val n = 100L
        val st = t(s, dir, "documents")
          .groupBy("lang").agg(count(lit(1)).as("nh"),
            sum("n_chars").as("s1"),
            sum(col("n_chars") * col("n_chars")).as("s2"))
        val mu = col("s1").cast("double") / col("nh").cast("double")
        val sigma = sqrt(col("s2").cast("double") / col("nh").cast("double") -
          mu * mu)
        val withW = st.withColumn("w", rx(col("nh").cast("double") * sigma, 6))
          .withColumn("sigma", rx(sigma, 4))
        // Normalizer and floor-spend are scalar aggregates attached by
        // broadcast (round-10 ran both as unbounded windows); the only
        // remaining global window is the largest-remainder rank over
        // one row per language stratum — GlobalWindowGuardSpec
        // certifies it structurally through the lang-keyed aggregate.
        val bigw = withW.agg(
          sum(col("w").cast("decimal(38,6)")).cast("double").as("bigw"))
        val ideal = withW.crossJoin(broadcast(bigw))
          .withColumn("ideal", lit(n.toDouble) * col("w") / col("bigw"))
          .withColumn("base", floor(col("ideal")).cast("long"))
          .withColumn("rem", col("ideal") - col("base").cast("double"))
        val spent = ideal.agg(sum("base").as("spent"))
        val alloc = ideal.crossJoin(broadcast(spent))
          .withColumn("rrk", row_number().over(
            Window.orderBy(col("rem").desc, col("lang"))).cast("long"))
        alloc
          .select(col("lang"), col("nh").as("n_docs"), col("sigma"),
            col("w").as("weight"), col("base"),
            (col("base") + when(col("rrk") <= lit(n) - col("spent"), 1L)
              .otherwise(0L)).as("alloc"))
          .orderBy("lang")
      },
      Some(s"""WITH st AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS nh,
                 CAST(sum(n_chars) AS BIGINT) AS s1,
                 CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
          FROM documents GROUP BY 1),
        m AS (
          SELECT lang, nh,
                 CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE) AS mu,
                 CAST(s2 AS DOUBLE) / CAST(nh AS DOUBLE) AS r2
          FROM st),
        w_ AS (
          SELECT lang, nh,
                 ${rxSql("sqrt(r2 - mu * mu)", 4)} AS sigma,
                 ${rxSql("CAST(nh AS DOUBLE) * sqrt(r2 - mu * mu)", 6)} AS w
          FROM m),
        tot AS (
          SELECT lang, nh, sigma, w,
                 CAST(sum(CAST(w AS DECIMAL(38,6))) OVER () AS DOUBLE) AS bigw
          FROM w_),
        a AS (
          SELECT lang, nh, sigma, w,
                 100.0 * w / bigw AS ideal
          FROM tot),
        b AS (
          SELECT lang, nh, sigma, w,
                 CAST(floor(ideal) AS BIGINT) AS base,
                 ideal - floor(ideal) AS rem,
                 CAST(sum(CAST(floor(ideal) AS BIGINT)) OVER () AS BIGINT) AS spent,
                 CAST(row_number() OVER (ORDER BY ideal - floor(ideal) DESC, lang) AS BIGINT) AS rrk
          FROM a)
        SELECT lang, nh AS n_docs, sigma, w AS weight, base,
               base + CASE WHEN rrk <= 100 - spent THEN 1 ELSE 0 END AS alloc
        FROM b ORDER BY lang"""),
    ),

    QDef("sample_pps_systematic",
      // Probability-proportional-to-size SYSTEMATIC sampling — the
      // budgeted-selection workhorse (pick ~k documents where a doc's
      // inclusion probability tracks its token cost, with the
      // variance-crushing systematic grid instead of independent
      // draws): walk the docs in id order, and take a doc whenever the
      // running char total crosses another 1/k-th of the corpus total.
      // All integer: the crossing test floor((cum·k)/T) >
      // floor(((cum−w)·k)/T) counts grid multiples inside the doc's
      // weight span — nonnegative operands, so floor≡truncate in both
      // engines, and cum·k stays far under int64 at any plausible
      // corpus (chars ≤ 1e14 · k=100). The running total is the
      // shard-offset cumulative ([[graft.operators.DistributedRank
      // .withGlobalCumsum]]) — no partition-less window ever touches
      // the data path, the exact flaw agg_decile_lift was rebuilt to
      // avoid.
      (s, dir) => {
        val k = 100L
        val base = t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars").as("w"))
        val cum = graft.operators.DistributedRank.withGlobalCumsum(
          base, col("doc_id"), col("doc_id"), col("w"))
        val tot = base.agg(sum("w").as("tt"))
        cum.crossJoin(broadcast(tot))
          .withColumn("pick_no", expr(s"(gcs * $k) div tt"))
          .filter(col("pick_no") > expr(s"((gcs - w) * $k) div tt"))
          .select(col("doc_id"), col("w").as("n_chars"),
            col("gcs").as("cum_chars"), col("pick_no"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
          SELECT doc_id, n_chars AS w FROM documents),
        cum AS (
          SELECT doc_id, w,
                 CAST(sum(w) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS gcs
          FROM base),
        tot AS (SELECT CAST(sum(w) AS BIGINT) AS tt FROM base)
        SELECT doc_id, w AS n_chars, gcs AS cum_chars,
               CAST((gcs * 100) // tt AS BIGINT) AS pick_no
        FROM cum CROSS JOIN tot
        WHERE (gcs * 100) // tt > ((gcs - w) * 100) // tt
        ORDER BY doc_id"""),
    ),

    QDef("sample_curriculum_phases",
      // Curriculum schedule — the training-order pass: rank the corpus
      // easy→hard by a deterministic difficulty score (mean token
      // length in ppm — longer words ≙ harder text; all-integer so
      // the order is engine-exact), then cut the TOKEN budget (not the
      // doc count — docs vary 100× in cost) into three equal-token
      // phases along that order. Emits the schedule summary a trainer
      // consumes: per phase, doc count, token budget, difficulty
      // range. The running token total is the shard-offset cumulative
      // ([[graft.operators.DistributedRank.withGlobalCumsum]]) — the
      // global order never passes through a partition-less window, so
      // the plan survives a 100 TB corpus; the oracle spells the same
      // cumulative as DuckDB's global window (fine there — it IS a
      // single node).
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("tks", Text.tokens(Text.normTerm(col("text"))))
          .select(col("doc_id"),
            size(col("tks")).cast("long").as("n_toks"),
            aggregate(col("tks"), lit(0L), (a, x) => a + length(x))
              .as("n_tchars"))
          .withColumn("diff_ppm", expr("(1000000 * n_tchars) div n_toks"))
        // NOTE (r18): t_total = max(ctoks) off the cumsum cache was
        // tried and REVERTED — the extra per-shard window pass over
        // the cached frame measured slower than the straight tokenize
        // re-aggregate (interleaved A/B: +0.64 s warm median).
        val cum = graft.operators.DistributedRank.withGlobalCumsum(
          d, col("diff_ppm"), col("doc_id"), col("n_toks"), out = "ctoks")
        val tot = d.agg(sum("n_toks").as("t_total"))
        cum.crossJoin(broadcast(tot))
          .withColumn("phase", expr("((ctoks - 1) * 3) div t_total + 1"))
          .groupBy("phase")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_toks").as("tokens"),
            min("diff_ppm").as("diff_min"),
            max("diff_ppm").as("diff_max"))
          .orderBy("phase")
      },
      Some("""WITH tk AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS tks
          FROM documents),
        d AS (
          SELECT doc_id,
                 CAST(len(tks) AS BIGINT) AS n_toks,
                 CAST(list_sum(list_transform(tks, x -> len(x))) AS BIGINT)
                   AS n_tchars
          FROM tk),
        dd AS (
          SELECT doc_id, n_toks,
                 CAST((1000000 * n_tchars) // n_toks AS BIGINT) AS diff_ppm
          FROM d),
        c AS (
          SELECT doc_id, n_toks, diff_ppm,
                 CAST(sum(n_toks) OVER (ORDER BY diff_ppm, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS ctoks,
                 CAST(sum(n_toks) OVER () AS BIGINT) AS t_total
          FROM dd)
        SELECT CAST(((ctoks - 1) * 3) // t_total + 1 AS BIGINT) AS phase,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS tokens,
               CAST(min(diff_ppm) AS BIGINT) AS diff_min,
               CAST(max(diff_ppm) AS BIGINT) AS diff_max
        FROM c GROUP BY 1 ORDER BY phase"""),
    ),
  )
}
