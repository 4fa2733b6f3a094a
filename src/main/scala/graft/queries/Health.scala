package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Text
import graft.operators.DistributedRank

/** Dataset-health operators a production training-data pipeline runs
  * continuously: distribution-drift monitoring between ingest periods,
  * set-membership sketches for join pruning, self-join-size (F2)
  * estimation for planner statistics, chunk-level exact dedup (the C4
  * "three-sentence span" rule's shape), decay-weighted rolling metrics,
  * calendar densification for per-source daily health series, and
  * class-balanced downsampling.
  *
  * Oracle-parity design rule for the whole file: every comparison the
  * driver hashes is either pure integer arithmetic or a SINGLE IEEE
  * double division of exact integers — no transcendental functions
  * (ln/pow differ by ulps across libm builds), no multi-term double
  * sums (order-dependent across engines). Where a decay weight is
  * inherently FP, the weights are folded by repeated multiplication on
  * the driver ONCE and embedded in both plans as shortest-repr double
  * literals, so both engines consume bit-identical constants.
  */
object Health {
  import QDef._

  /** c(0.05)² for the two-sample KS rejection rule — evaluated ONCE
    * host-side so the identical double literal flows to both engines
    * (the squaring itself must not happen per-engine).
    */
  private val KsC2: Double = 1.3581015157406195 * 1.3581015157406195

  /** Poisson(1) CDF thresholds on the 2^32 integer grid for
    * agg_poisson_bootstrap: thr(k) = floor(P(X ≤ k)·2³²), k = 0..8.
    * A md5-uniform u ∈ [0, 2³²) maps to weight w = #{k : u ≥ thr(k)}
    * (inverse-CDF sampling, capped at 9 where the tail mass is
    * ~1.1e-6). Evaluated host-side ONCE — exp(−1) is transcendental,
    * so it must not be computed per-engine — and flows to both plans
    * as identical integer literals, making the whole weight draw
    * integer-exact cross-engine.
    */
  private val PoisThr: Seq[Long] = {
    var term = math.exp(-1.0)
    var acc = 0.0
    (0 to 8).map { k =>
      acc += term
      term = term / (k + 1).toDouble
      math.floor(acc * 4294967296.0).toLong
    }
  }

  /** z(0.975) + z(0.80) for agg_power_mde's two-sided 5%/80%-power MDE
    * — summed host-side once so the identical double literal flows to
    * both engines (KsC2's discipline).
    */
  private val ZSum: Double = 1.959963984540054 + 0.8416212335729143

  /** z(0.975) for agg_ratio_delta_method's CI half-width. */
  private val Z975: Double = 1.959963984540054

  val all: Seq[QDef] = Seq(

    QDef("profile_data_drift",
      // Population drift between two ingest periods (first vs second
      // half of the event stream), per event_type, over 10 fixed-width
      // value buckets with +1 Laplace smoothing. The drift statistic is
      // total-variation distance; computed over the COMMON DENOMINATOR
      // so the per-type sum is exact 64-bit integer arithmetic:
      //   p2-p1 = ((n2+1)*D1 - (n1+1)*D2) / (D1*D2),  D = N+10
      // tvd_scaled = sum |…| is a long; tvd divides it once. At 100 TB
      // this is one scan, one map-side-combined aggregate on a
      // (type × period × bucket) key space of a few hundred rows, and a
      // window over that tiny aggregate — the scan dominates, exactly
      // as a drift monitor should.
      (s, dir) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val ev = t(s, dir, "events")
          .withColumn("b", least(floor(col("value") / 50).cast("long"), lit(9L)))
          .groupBy(col("event_type"), col("b"))
          .agg(sum(when(col("ts") < cut, 1L).otherwise(0L)).as("n1"),
            sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("n2"))
        val spine = ev.select("event_type").distinct()
          .crossJoin(s.range(10).select(col("id").as("b")))
        val w = Window.partitionBy("event_type")
        spine.join(ev, Seq("event_type", "b"), "left")
          .select(col("event_type"), col("b"),
            coalesce(col("n1"), lit(0L)).as("n1"),
            coalesce(col("n2"), lit(0L)).as("n2"))
          .withColumn("d1", sum("n1").over(w) + 10L)
          .withColumn("d2", sum("n2").over(w) + 10L)
          .withColumn("p1", (col("n1") + 1).cast("double") / col("d1").cast("double"))
          .withColumn("p2", (col("n2") + 1).cast("double") / col("d2").cast("double"))
          // The cross product (n+1)·D is ~N² per event type — ridden on
          // DECIMAL(38,0) ≙ HUGEINT so the per-term arithmetic cannot
          // wrap past ~3e9 rows/type. tvd_scaled (a diagnostics column)
          // still casts to int64 at the boundary — past ~1.5e9
          // rows/type the normalized `tvd` is the scale-safe output —
          // and the tvd denominator multiplies as DOUBLES for the same
          // reason.
          .withColumn("tvd_scaled",
            sum(abs((col("n2") + 1).cast("decimal(38,0)") * col("d1") -
              (col("n1") + 1).cast("decimal(38,0)") * col("d2"))).over(w)
              .cast("long"))
          .select(col("event_type"), col("b"), col("n1"), col("n2"),
            col("p1"), col("p2"), col("tvd_scaled"),
            (col("tvd_scaled").cast("double") /
              (lit(2.0) * col("d1").cast("double") * col("d2").cast("double")))
              .as("tvd"))
          .orderBy("event_type", "b")
      },
      Some("""WITH ev AS (
          SELECT event_type, least(CAST(floor(value / 50) AS BIGINT), 9) AS b,
                 sum(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS n1,
                 sum(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS n2
          FROM events GROUP BY 1, 2),
        spine AS (
          SELECT et.event_type, r.range AS b
          FROM (SELECT DISTINCT event_type FROM ev) et CROSS JOIN range(10) r),
        f AS (
          SELECT s.event_type, s.b,
                 CAST(coalesce(e.n1, 0) AS BIGINT) AS n1,
                 CAST(coalesce(e.n2, 0) AS BIGINT) AS n2
          FROM spine s LEFT JOIN ev e ON e.event_type = s.event_type AND e.b = s.b),
        g AS (
          SELECT *, sum(n1) OVER (PARTITION BY event_type) + 10 AS d1,
                    sum(n2) OVER (PARTITION BY event_type) + 10 AS d2
          FROM f)
        SELECT event_type, b, n1, n2,
               CAST(n1 + 1 AS DOUBLE) / CAST(d1 AS DOUBLE) AS p1,
               CAST(n2 + 1 AS DOUBLE) / CAST(d2 AS DOUBLE) AS p2,
               CAST(sum(abs(CAST(n2 + 1 AS HUGEINT) * d1 - CAST(n1 + 1 AS HUGEINT) * d2)) OVER (PARTITION BY event_type) AS BIGINT) AS tvd_scaled,
               CAST(sum(abs(CAST(n2 + 1 AS HUGEINT) * d1 - CAST(n1 + 1 AS HUGEINT) * d2)) OVER (PARTITION BY event_type) AS DOUBLE)
                 / (2.0 * CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)) AS tvd
        FROM g ORDER BY event_type, b"""),
    ),

    QDef("agg_bloom_membership",
      // Distributed Bloom filter as data, not a driver-side object:
      // m=8192 bits, kh=4 engine-portable md5 hash rows. The built
      // filter IS a DataFrame of set bit positions (how a filter ships
      // between jobs / to a different engine); the probe is a left join
      // on bit id + an all-4-matched gate. Members = customers with any
      // order above 480k (~1/3 of customers at every SF). Zero false
      // negatives by construction; false positives rise as n/m grows —
      // at 100 TB you size m from an upfront approx_count_distinct
      // exactly like Spark's own might-contain build does, and the
      // probe stays a shuffle-free broadcast join because 8192 bit
      // rows is nothing. All arithmetic integer; the driver-hashed
      // columns are bools and longs.
      (s, dir) => {
        def bit(i: Int, key: org.apache.spark.sql.Column) =
          pmod(Text.md5Hash32(concat(lit(s"bf$i:"), key.cast("string"))), lit(8192L))
        val members = t(s, dir, "orders")
          .filter(col("o_totalprice") > 480000)
          .select(col("o_custkey").as("k")).distinct()
        val bits = (0 until 4).map(i => members.select(bit(i, col("k")).as("bit")))
          .reduce(_ union _).distinct().withColumn("hit", lit(1L))
        val probes = t(s, dir, "customer").select(col("c_custkey"))
        val probeBits = (0 until 4).map(i =>
          probes.select(col("c_custkey"), lit(i).as("i"), bit(i, col("c_custkey")).as("bit")))
          .reduce(_ union _)
        probeBits.join(broadcast(bits), Seq("bit"), "left")
          .groupBy("c_custkey")
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .join(members.withColumn("is_m", lit(true)),
            col("c_custkey") === col("k"), "left")
          .select(col("c_custkey"), (col("n_hit") === 4).as("predicted"),
            coalesce(col("is_m"), lit(false)).as("actual"))
          .withColumn("false_positive", col("predicted") && !col("actual"))
          .orderBy("c_custkey")
      },
      Some("""WITH members AS (
          SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 480000),
        bits AS (
          SELECT DISTINCT CAST(('0x' || substr(md5('bf' || i || ':' || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 8192 AS bit
          FROM members CROSS JOIN (SELECT unnest([0,1,2,3]) AS i)),
        pb AS (
          SELECT c_custkey, i,
                 CAST(('0x' || substr(md5('bf' || i || ':' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 8192 AS bit
          FROM customer CROSS JOIN (SELECT unnest([0,1,2,3]) AS i)),
        hits AS (
          SELECT p.c_custkey, sum(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS n_hit
          FROM pb p LEFT JOIN bits b ON b.bit = p.bit GROUP BY 1)
        SELECT h.c_custkey, h.n_hit = 4 AS predicted,
               m.k IS NOT NULL AS actual,
               (h.n_hit = 4) AND m.k IS NULL AS false_positive
        FROM hits h LEFT JOIN members m ON m.k = h.c_custkey
        ORDER BY h.c_custkey"""),
    ),

    QDef("agg_ams_f2",
      // AMS (Alon-Matias-Szegedy) sketch of the second frequency moment
      // of l_partkey — F2 IS the self-join size, the number a join
      // planner wants before it picks a strategy on a skewed key. 16
      // independent ±1 estimators from salted md5 parity; each X_i =
      // (Σ f_k·s_i(k))² concentrates around F2. Everything is exact
      // 64-bit integer arithmetic (counts and ±1 signs), so the
      // estimate — INCLUDING the rank-based median — replays
      // bit-identically in DuckDB. At 100 TB: one map-side-combined
      // count per key, then ONE grand aggregate computes all 16 signed
      // sums AND the exact F2 in the same pass over the key-frequency
      // table (the estimator-id explode with its 16× row blowup, the
      // per-estimator shuffle, and the separate truth aggregate all
      // collapse into 17 columns of one map-side-combined fold);
      // everything after runs on a 16-row stack of that single row.
      (s, dir) => {
        def sgn(i: Int) =
          when(pmod(Text.md5Hash32(
            concat(lit("ams"), lit(i.toString), lit(":"),
              col("k").cast("string"))), lit(2L)) === 0, 1L).otherwise(-1L)
        val freq = t(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("f"))
        val zcols = (0 until 16).map(i => sum(sgn(i) * col("f")).as(s"z$i"))
        val onerow = freq.agg(zcols.head,
          (zcols.tail :+ sum(col("f") * col("f")).as("true_f2")): _*)
          // Empty-input parity: a grouping-less aggregate always emits
          // one row (all-null sums), which stack() would fan to 16 null
          // estimators where the oracle's freq-driven CROSS JOIN emits
          // zero rows — drop the null row so both engines yield 0 rows
          // on an empty corpus.
          .filter(col("true_f2").isNotNull)
        val est = onerow
          .select(col("true_f2"), expr("stack(16, " +
            (0 until 16).map(i => s"$i, z$i").mkString(", ") + ") AS (i, z)"))
          .select(col("i").cast("int").as("i"),
            (col("z") * col("z")).as("x2"), col("true_f2"))
        val ranked = est.withColumn("rn",
          row_number().over(Window.orderBy(col("x2"), col("i"))))
        // Median attached as a SECOND window over the same 16-row
        // frame, not a filter+agg+crossJoin: the crossJoin spelling
        // referenced `ranked` twice and Spark shares no common
        // subtrees, so the whole freq+grand-aggregate corpus chain
        // (two scans, four exchanges) executed twice per run — the
        // r15/r16 flag on this query was that duplicated pass, not
        // the sketch. Both windows are partition-less over the
        // 16-row stack of a grand aggregate (literal fan-out), the
        // bounded shape the global-window guard certifies.
        val wAll = Window.orderBy(col("rn"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ranked
          .withColumn("est_f2",
            (sum(when(col("rn").isin(8, 9), col("x2"))).over(wAll)
              .cast("double") / 2.0))
          .select(col("i"), col("x2"), col("est_f2"), col("true_f2"),
            ((col("est_f2") - col("true_f2").cast("double")) /
              col("true_f2").cast("double")).as("rel_err"))
          .orderBy("i")
      },
      Some("""WITH freq AS (
          SELECT l_partkey AS k, count(*) AS f FROM lineitem GROUP BY 1),
        est AS (
          SELECT i, sum(CASE WHEN CAST(('0x' || substr(md5('ams' || i || ':' || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0
                             THEN 1 ELSE -1 END * f) AS z
          FROM freq CROSS JOIN (SELECT unnest(range(16)) AS i) GROUP BY 1),
        ranked AS (
          SELECT CAST(i AS INT) AS i, CAST(z * z AS BIGINT) AS x2,
                 row_number() OVER (ORDER BY z * z, i) AS rn
          FROM est),
        med AS (
          SELECT CAST(sum(x2) AS DOUBLE) / 2.0 AS est_f2 FROM ranked WHERE rn IN (8, 9)),
        truth AS (SELECT CAST(sum(f * f) AS BIGINT) AS true_f2 FROM freq)
        SELECT r.i, r.x2, m.est_f2, t.true_f2,
               (m.est_f2 - CAST(t.true_f2 AS DOUBLE)) / CAST(t.true_f2 AS DOUBLE) AS rel_err
        FROM ranked r CROSS JOIN med m CROSS JOIN truth t
        ORDER BY r.i"""),
    ),

    QDef("dedup_chunk_exact",
      // Chunk-level exact dedup — the C4/RefinedWeb span rule's shape:
      // split each doc into non-overlapping 8-token chunks, count each
      // chunk's corpus-wide frequency by 16-hex fingerprint, and score
      // each doc by the fraction of its chunks that appear elsewhere.
      // Catches partial/boilerplate duplication that doc-level
      // fingerprints miss. The chunk array is bound with withColumn
      // BEFORE the explode (inlining a computed array re-evaluates the
      // split per element). At 100 TB: explode → one count shuffle on
      // the fingerprint → one join back on doc_id; chunk cardinality is
      // ~tokens/8, so the shuffle is smaller than the input scan.
      (s, dir) => {
        // Staged: the chunk stream (tokenize + normalize + chunk explode
        // + md5 — the dominant cost) feeds both the freq aggregate and
        // the join-back probe with no common subtree, so unstaged Spark
        // executes the whole explode twice (the substr_windows/span_grams
        // discipline; flagged as the r9 double-scan).
        val chunks = graft.pipeline.Staged.disk(s, dir, "chunk_fps") {
          t(s, dir, "documents")
            .withColumn("tks", Text.tokens(Text.normTerm(col("text"))))
            // Guard the empty token array: (size-1)/8 = 0 would yield
            // sequence(0,0) = one empty chunk in Spark where the oracle's
            // range() yields zero chunks — drop the row on both engines'
            // shared semantics (the doc then has no chunk rows at all).
            .filter(size(col("tks")) >= 1)
            .withColumn("cks",
              transform(sequence(lit(0), ((size(col("tks")) - 1) / 8).cast("int")),
                j => concat_ws(" ", slice(col("tks"), j * 8 + 1, lit(8)))))
            .select(col("doc_id"), explode(col("cks")).as("chunk"))
            .withColumn("fp", substring(md5(col("chunk")), 1, 16))
            .select("doc_id", "fp")
        }
        val freq = chunks.groupBy("fp").agg(count(lit(1)).as("n"))
        chunks.join(freq, "fp")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup"))
          .select(col("doc_id"), col("n_chunks"), col("n_dup"),
            (col("n_dup").cast("double") / col("n_chunks").cast("double")).as("dup_frac"))
          .withColumn("keep", col("n_dup") * 2 <= col("n_chunks"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS tks
          FROM documents),
        chunks AS (
          SELECT doc_id,
                 substr(md5(array_to_string(list_slice(tks, j * 8 + 1, j * 8 + 8), ' ')), 1, 16) AS fp
          FROM toks, unnest(range((len(tks) - 1) // 8 + 1)) AS u(j)),
        freq AS (SELECT fp, count(*) AS n FROM chunks GROUP BY 1)
        SELECT c.doc_id, count(*) AS n_chunks,
               CAST(sum(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               CAST(sum(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_frac,
               CAST(sum(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT) * 2 <= count(*) AS keep
        FROM chunks c JOIN freq f ON f.fp = c.fp
        GROUP BY c.doc_id ORDER BY c.doc_id"""),
    ),

    QDef("win_ewma",
      // Exponential decay average over the trailing 20 readings per
      // user — the rolling health metric shape (alerting smooths, decay
      // discounts stale points). The 20 decay weights 0.7^j are folded
      // by repeated multiplication ON THE DRIVER and embedded in both
      // plans as shortest-repr literals, so neither engine evaluates
      // pow(); the per-row math is then an in-order zip-multiply fold
      // of identical doubles — bit-identical across engines (the
      // verified aggregate ≙ list_sum(list_transform) equivalence). At
      // 100 TB this is one window per user partition, no extra shuffle
      // beyond the partitioning the sort already needs.
      (s, dir) => {
        val wts = Iterator.iterate(1.0)(_ * 0.7).take(20).toSeq
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-19, 0)
        t(s, dir, "events")
          .filter(pmod(col("user_id"), lit(5L)) === 0)
          .withColumn("vals", collect_list("value").over(w))
          .withColumn("wr",
            reverse(slice(array(wts.map(lit): _*), lit(1), size(col("vals")))))
          .select(col("event_id"), col("user_id"), col("value"),
            (aggregate(zip_with(col("vals"), col("wr"), (x, wt) => x * wt),
              lit(0.0), (acc, x) => acc + x) /
              aggregate(col("wr"), lit(0.0), (acc, x) => acc + x)).as("ewma"))
          .orderBy("event_id")
      },
      Some {
        val wts = Iterator.iterate(1.0)(_ * 0.7).take(20).toSeq
        // "e0" forces DuckDB to parse each element as DOUBLE: a bare
        // decimal list literal goes through a common DECIMAL type that
        // drops the 17th significant digit (0.48999999999999994 came
        // back as the NEIGHBORING double 0.4899999999999999).
        val wlist = wts.map { w =>
          val r = w.toString; if (r.contains("E")) r else r + "e0"
        }.mkString("[", ", ", "]")
        s"""WITH ev AS (
          SELECT event_id, user_id, value,
                 list(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
          FROM events WHERE user_id % 5 = 0)
        SELECT event_id, user_id, value,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(len(vals)),
                   j -> vals[j + 1] * list_reverse(list_slice($wlist, 1, len(vals)))[j + 1])),
                 (acc, x) -> acc + x)
               / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_reverse(list_slice($wlist, 1, len(vals)))),
                 (acc, x) -> acc + x) AS ewma
        FROM ev ORDER BY event_id"""
      },
    ),

    QDef("win_holt_linear",
      // Holt's linear (double-exponential) smoothing per user — the
      // level+trend forecast a capacity/health monitor actually runs
      // (EWMA above smooths level only; a drifting series needs the
      // trend term or the forecast lags forever): s_t = α·x_t +
      // (1−α)(s_{t−1}+b_{t−1}), b_t = β(s_t−s_{t−1}) + (1−β)b_{t−1},
      // α=1/2, β=1/4 (dyadic — every coefficient multiply is exact
      // scaling). The recurrence is inherently sequential per key, so
      // it runs as ONE in-order array fold over the user's (ts,
      // event_id)-sorted readings — the same strict-left-fold
      // contract the EWMA dot-product rides, with a STRUCT
      // accumulator (level, trend, index). The oracle replays the
      // recurrence as a recursive CTE stepping one reading per level —
      // NOT list_reduce with a struct accumulator: DuckDB's
      // list_reduce evaluates result-struct fields against partially
      // UPDATED accumulator state (probed: two fields with the
      // identical expression returned different values), so any
      // inter-field recurrence silently diverges there. Identical
      // IEEE op order both sides → bit-identical states; outputs
      // rx(4). Per-user fold over a user-bounded array — one shuffle,
      // linear at scale.
      (s, dir) => {
        import org.apache.spark.sql.Column
        def st(a: Column, f: String) = a.getField(f)
        def sNew(a: Column, x: Column): Column =
          when(st(a, "i") === 0.0, x)
            .otherwise(lit(0.5) * x + lit(0.5) * (st(a, "s") + st(a, "b")))
        val folded = t(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("tu"),
            col("event_id"), (money(col("value")) * 100).cast("double").as("c"))
          .groupBy("user_id")
          .agg(array_sort(collect_list(struct(col("tu"), col("event_id"),
            col("c")))).as("es"))
          .withColumn("xs", transform(col("es"), e => e.getField("c")))
          .withColumn("st", aggregate(col("xs"),
            struct(lit(0.0).as("s"), lit(0.0).as("b"), lit(0.0).as("i")),
            (a, x) => struct(
              sNew(a, x).as("s"),
              when(st(a, "i") === 0.0, lit(0.0))
                .otherwise(lit(0.25) * (sNew(a, x) - st(a, "s")) +
                  lit(0.75) * st(a, "b")).as("b"),
              (st(a, "i") + 1.0).as("i"))))
        folded.select(col("user_id"),
            size(col("xs")).cast("long").as("n_events"),
            rx(col("st").getField("s") / 100, 4).as("level"),
            rx(col("st").getField("b") / 100, 4).as("trend"),
            rx((col("st").getField("s") + col("st").getField("b")) / 100, 4)
              .as("forecast1"))
          .orderBy("user_id")
      },
      Some("""WITH RECURSIVE e AS (
          SELECT user_id,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DOUBLE) AS c,
                 CAST(ts AS TIMESTAMP) AS ts, event_id
          FROM events),
        r AS (
          SELECT user_id, c,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS idx
          FROM e),
        nn AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
               FROM r GROUP BY 1),
        rec AS (
          SELECT user_id, idx, c AS s, CAST(0.0 AS DOUBLE) AS b
          FROM r WHERE idx = 1
          UNION ALL
          SELECT r.user_id, r.idx,
                 0.5e0 * r.c + 0.5e0 * (rec.s + rec.b) AS s,
                 0.25e0 * ((0.5e0 * r.c + 0.5e0 * (rec.s + rec.b)) - rec.s)
                   + 0.75e0 * rec.b AS b
          FROM rec JOIN r ON r.user_id = rec.user_id
                         AND r.idx = rec.idx + 1)
        SELECT nn.user_id AS user_id, nn.n_events AS n_events,
               floor(rec.s / 100 * 1e4 + 0.5) / 1e4 AS level,
               floor(rec.b / 100 * 1e4 + 0.5) / 1e4 AS trend,
               floor((rec.s + rec.b) / 100 * 1e4 + 0.5) / 1e4 AS forecast1
        FROM rec JOIN nn ON rec.user_id = nn.user_id
                        AND rec.idx = nn.n_events
        ORDER BY user_id""")),

    QDef("win_gap_fill",
      // Calendar densification: per-user daily activity series with
      // missing days materialized as explicit zero rows — the step
      // every health dashboard and training-data freshness monitor
      // needs before windowed math is meaningful. The date spine is
      // sequence()+explode against the GLOBAL min/max day (two scalar
      // aggregates broadcast by crossJoin), not a driver loop; daily
      // sums are DECIMAL-exact then cast. At 100 TB the spine is
      // users × days (tiny vs events) and the left join shuffles on
      // (user, day) — the same key the daily aggregate already
      // produced, so AQE coalesces it into one exchange.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .filter(pmod(col("user_id"), lit(4L)) === 0)
          .withColumn("d", to_date(col("ts")))
        val span = ev.agg(min("d").as("d0"), max("d").as("d1"))
        val daily = ev.groupBy("user_id", "d")
          .agg(count(lit(1)).as("n"),
            sum(money(col("value"))).cast("double").as("total"))
        ev.select("user_id").distinct()
          .crossJoin(span)
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"))).as("d"))
          .join(daily, Seq("user_id", "d"), "left")
          .select(col("user_id"), col("d"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("total"), lit(0.0)).as("total"),
            col("n").isNull.as("is_gap"))
          .orderBy("user_id", "d")
      },
      Some("""WITH ev AS (
          SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, value
          FROM events WHERE user_id % 4 = 0),
        span AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
        daily AS (
          SELECT user_id, d, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM ev GROUP BY 1, 2),
        spine AS (
          SELECT u.user_id,
                 CAST(unnest(generate_series(CAST(s.d0 AS TIMESTAMP), CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
          FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN span s)
        SELECT s.user_id, s.d,
               CAST(coalesce(dl.n, 0) AS BIGINT) AS n,
               coalesce(dl.total, 0.0) AS total,
               dl.n IS NULL AS is_gap
        FROM spine s LEFT JOIN daily dl ON dl.user_id = s.user_id AND dl.d = s.d
        ORDER BY s.user_id, s.d"""),
    ),

    QDef("layout_inverted_index",
      // Retrieval-index build: term -> document-frequency + capped
      // posting list, the layout artifact a search/RAG stack derives
      // from the corpus. Postings are sorted doc_id arrays capped at 10
      // (real posting lists are blocked; the cap keeps the head block
      // the size a broadcast probe wants) and stringified for the gate.
      // One explode + one distinct + one aggregate — at 100 TB the
      // shuffle key is the term (vocab-bounded), and map-side combine
      // collapses each partition's postings before the exchange.
      (s, dir) => {
        val posts = t(s, dir, "documents")
          .withColumn("tks", Text.tokens(Text.normTerm(col("text"))))
          .select(col("doc_id"), explode(col("tks")).as("term"))
          .distinct()
        posts.groupBy("term")
          .agg(count(lit(1)).as("df"),
            array_join(slice(sort_array(collect_list(col("doc_id"))), 1, 10), "|")
              .as("head_postings"))
          .orderBy("term")
      },
      Some("""WITH posts AS (
          SELECT DISTINCT doc_id, unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
          FROM documents),
        pl AS (
          SELECT term, doc_id, row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
                 count(*) OVER (PARTITION BY term) AS df
          FROM posts)
        SELECT term, CAST(any_value(df) AS BIGINT) AS df,
               string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id) AS head_postings
        FROM pl WHERE rn <= 10 GROUP BY term ORDER BY term"""),
    ),

    QDef("text_feature_hash",
      // The hashing trick: tokens bucketed into a fixed 64-dim space by
      // salted md5 — the dimensionality-bounded featurization that
      // needs NO vocabulary pass (the property that matters at 100 TB:
      // a vocab dictionary is a second scan + a broadcast that grows
      // with the corpus; the hash needs neither). Emitted as sparse
      // (doc_id, bucket, cnt) rows — the layout a downstream trainer
      // consumes — with an exact-rational within-doc weight. Collisions
      // are the accepted tradeoff and are measurable here: bucket
      // cardinality vs distinct tokens.
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("tks", Text.tokens(Text.normTerm(col("text"))))
          .select(col("doc_id"), size(col("tks")).as("n_tok"),
            explode(col("tks")).as("tok"))
          .withColumn("bucket",
            pmod(Text.md5Hash32(concat(lit("fh:"), col("tok"))), lit(64L)))
          .groupBy("doc_id", "n_tok", "bucket")
          .agg(count(lit(1)).as("cnt"))
          .select(col("doc_id"), col("bucket"), col("cnt"),
            (col("cnt").cast("double") / col("n_tok").cast("double")).as("weight"))
          .orderBy("doc_id", "bucket")
      },
      Some("""WITH toks AS (
          SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS tks
          FROM documents),
        f AS (
          SELECT doc_id, len(tks) AS n_tok,
                 CAST(('0x' || substr(md5('fh:' || t.tok), 1, 8)) AS BIGINT) % 64 AS bucket
          FROM toks, unnest(tks) AS t(tok))
        SELECT doc_id, bucket, count(*) AS cnt,
               CAST(count(*) AS DOUBLE) / CAST(any_value(n_tok) AS DOUBLE) AS weight
        FROM f GROUP BY doc_id, bucket ORDER BY doc_id, bucket"""),
    ),

    QDef("agg_zscore_standardize",
      // Per-group z-score standardization — the feature-prep transform
      // every tabular trainer applies — with the two-pass mean/std
      // folded into ONE pass: sums of cents and squared cents are exact
      // int64, and mean/variance come out as single IEEE divisions of
      // those integers, so the standardized values are bit-identical in
      // any engine with no rounding guard. (int64 holds n·Σx² up to
      // ~sf10 here; past that the same sums ride DECIMAL(38,0).) At
      // 100 TB: one map-side-combined aggregate per group + one
      // broadcast join back — no second scan, no window over the fact.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .filter(pmod(col("user_id"), lit(3L)) === 0)
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
        val stats = ev.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("xc").as("sx"),
            sum(col("xc") * col("xc")).as("sx2"))
          .withColumn("meanc", col("sx").cast("double") / col("n").cast("double"))
          .withColumn("stdc",
            sqrt((col("n") * col("sx2") - col("sx") * col("sx")).cast("double") /
              (col("n").cast("double") * col("n").cast("double"))))
        ev.join(broadcast(stats), "event_type")
          .select(col("event_id"), col("event_type"), col("value"),
            (col("meanc") / 100.0).as("mean_v"),
            (col("stdc") / 100.0).as("std_v"),
            ((col("xc").cast("double") - col("meanc")) / col("stdc")).as("z"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
          SELECT event_id, event_type, value,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc
          FROM events WHERE user_id % 3 = 0),
        stats AS (
          SELECT event_type, count(*) AS n,
                 CAST(sum(xc) AS BIGINT) AS sx, CAST(sum(xc * xc) AS BIGINT) AS sx2
          FROM ev GROUP BY 1),
        st AS (
          SELECT event_type,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS meanc,
                 sqrt(CAST(n * sx2 - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS stdc
          FROM stats)
        SELECT e.event_id, e.event_type, e.value,
               s.meanc / 100.0 AS mean_v, s.stdc / 100.0 AS std_v,
               (CAST(e.xc AS DOUBLE) - s.meanc) / s.stdc AS z
        FROM ev e JOIN st s USING (event_type)
        ORDER BY e.event_id"""),
    ),

    QDef("agg_ttest_paired",
      // PAIRED t-test per event type — the matched-pairs companion to
      // agg_welch_ttest: same-user first-half vs second-half spend,
      // tested on the per-user DIFFERENCE (pairing removes the
      // between-user variance that dominates Welch's denominator —
      // the standard before/after design for feature launches). Per
      // (type, user) both half-sums come from ONE conditional
      // aggregate (no self-join); only users active in BOTH halves
      // pair (both sign arms probed live at sf0.001 and sf0.01). The
      // per-type reduction keeps exact integer diffs with Σd / Σd² on
      // DECIMAL(38,0) ≙ HUGEINT (d² passes 2⁶³ at ~10⁹-cent users);
      // mean, variance and t are a fixed tree of single IEEE ops — no
      // transcendentals. Zero-variance divisor guarded to NULL on
      // both engines (Spark ANSI raises on /0 where DuckDB yields
      // ±inf). Two map-side-combinable aggregates, no shuffle beyond
      // the (type, user) key — scan speed at 100 TB.
      (s, dir) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val pu = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("h", col("ts") < cut)
          .groupBy("event_type", "user_id")
          .agg(sum(when(col("h"), 1L).otherwise(0L)).as("n1"),
            sum(when(!col("h"), 1L).otherwise(0L)).as("n2"),
            sum(when(col("h"), col("xc")).otherwise(0L)).as("c1"),
            sum(when(!col("h"), col("xc")).otherwise(0L)).as("c2"))
          .filter(col("n1") > 0 && col("n2") > 0)
          .withColumn("dd", col("c2") - col("c1"))
        val st = pu.groupBy("event_type").agg(
          count(lit(1)).as("n_pairs"),
          sum(col("dd").cast("decimal(38,0)")).as("sd"),
          sum(col("dd").cast("decimal(38,0)") * col("dd")).as("sd2"))
        def d(c: String) = col(c).cast("double")
        val nd = d("n_pairs")
        val dbar = d("sd") / nd
        val svar = (nd * d("sd2") - d("sd") * d("sd")) / (nd * (nd - 1.0))
        val tstat = when(svar === 0.0, lit(null).cast("double"))
          .otherwise(dbar / sqrt(svar / nd))
        st.select(col("event_type"), col("n_pairs"),
            rx(dbar / 100.0, 4).as("mean_diff"),
            rx(tstat, 4).as("t_stat"),
            (abs(tstat) > 2.0).as("significant"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
          SELECT event_type, user_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc,
                 CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' AS h
          FROM events),
        pu AS (
          SELECT event_type, user_id,
                 CAST(sum(CASE WHEN NOT h THEN xc ELSE 0 END)
                   - sum(CASE WHEN h THEN xc ELSE 0 END) AS BIGINT) AS dd
          FROM ev GROUP BY 1, 2
          HAVING sum(CASE WHEN h THEN 1 ELSE 0 END) > 0
             AND sum(CASE WHEN NOT h THEN 1 ELSE 0 END) > 0),
        st AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
                 sum(CAST(dd AS HUGEINT)) AS sd,
                 sum(CAST(dd AS HUGEINT) * dd) AS sd2
          FROM pu GROUP BY 1),
        c AS (
          SELECT event_type, n_pairs,
                 CAST(sd AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS dbar,
                 (CAST(n_pairs AS DOUBLE) * CAST(sd2 AS DOUBLE)
                   - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                   / (CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) - 1.0))
                   AS svar
          FROM st)
        SELECT event_type, n_pairs,
               floor((dbar / 100.0) * 1e4 + 0.5) / 1e4 AS mean_diff,
               CASE WHEN svar = 0.0 THEN NULL ELSE
                 floor((dbar / sqrt(svar / CAST(n_pairs AS DOUBLE))) * 1e4 + 0.5) / 1e4
               END AS t_stat,
               CASE WHEN svar = 0.0 THEN NULL ELSE
                 abs(dbar / sqrt(svar / CAST(n_pairs AS DOUBLE))) > 2.0
               END AS significant
        FROM c ORDER BY event_type""")),

    QDef("profile_freshness_check",
      // Freshness SLO check — the ops gate every scheduled consumer
      // runs before trusting a partition ("is each producer still
      // writing?"): per event type, last event time, its lag behind
      // the corpus watermark (the global max), and a stale flag at
      // the 24h SLO. The feed models a broken producer
      // deterministically — the 'error' stream stops on Jan 25 (the
      // derived-feed reachability rule: without a hole every lag is
      // ~0 and the stale arm is untestable at any SF) — so both flag
      // arms are live at every SF. Integer lag (whole hours via
      // micros div); one conditional aggregate + one broadcast
      // watermark scalar: scan speed at 100 TB, and the same plan
      // reads partition-level max(ts) from manifest stats instead of
      // rows when the table format carries them.
      (s, dir) => {
        val feed = t(s, dir, "events")
          .filter(!(col("event_type") === "error" &&
            col("ts") >= lit("2024-01-25 00:00:00").cast("timestamp")))
        val perType = feed.groupBy("event_type")
          .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_events"))
        val wm = perType.agg(max("last_ts").as("watermark"))
        perType.crossJoin(broadcast(wm))
          .withColumn("lag_hours",
            expr("(unix_micros(watermark) - unix_micros(last_ts)) div 3600000000"))
          .select(col("event_type"), col("n_events"), col("last_ts"),
            col("lag_hours"), (col("lag_hours") >= 24L).as("stale"))
          .orderBy("event_type")
      },
      Some("""WITH feed AS (
          SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
          WHERE NOT (event_type = 'error'
            AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-25 00:00:00')),
        per_type AS (
          SELECT event_type, max(ts) AS last_ts,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM feed GROUP BY 1),
        wm AS (SELECT max(last_ts) AS watermark FROM per_type)
        SELECT event_type, n_events, last_ts,
               CAST((epoch_us(watermark) - epoch_us(last_ts)) // 3600000000
                 AS BIGINT) AS lag_hours,
               (epoch_us(watermark) - epoch_us(last_ts)) // 3600000000 >= 24
                 AS stale
        FROM per_type CROSS JOIN wm
        ORDER BY event_type""")),

    QDef("agg_bitemporal_snapshot",
      // BITEMPORAL snapshot — the two-clock question SCD2's single
      // valid-time axis can't answer: "what did we KNOW on Jan 16
      // about the state THROUGH Jan 15?" Every 5th event (md5 split)
      // is a late arrival recorded 2 days after it happened
      // (transaction time > valid time — the at-least-once reality of
      // every ingest). Per user: events known at the (V, T) point,
      // their exact cent sum, late rows EXCLUDED by the transaction
      // clock (happened ≤ V but recorded > T — the rows a naive
      // valid-time-only query silently includes, i.e. the
      // irreproducibility of yesterday's report), and future rows
      // beyond V. The V→T gap (1 day) is inside the 2-day lag so the
      // excluded arm is live at every SF. One conditional aggregate
      // over one scan — bitemporal correctness costs one extra
      // timestamp comparison, not a join.
      (s, dir) => {
        val v = lit("2024-01-15 00:00:00").cast("timestamp")
        val tt = lit("2024-01-16 00:00:00").cast("timestamp")
        val ev = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("recorded",
            when(pmod(graft.functions.Text.md5Hash32(
              concat(lit("late:"), col("event_id").cast("string"))),
              lit(5L)) === 0,
              col("ts") + expr("INTERVAL 2 DAYS")).otherwise(col("ts")))
        ev.groupBy("user_id")
          .agg(
            sum(when(col("ts") <= v && col("recorded") <= tt, 1L)
              .otherwise(0L)).as("n_known"),
            sum(when(col("ts") <= v && col("recorded") <= tt, col("xc"))
              .otherwise(0L)).as("cents_known"),
            sum(when(col("ts") <= v && col("recorded") > tt, 1L)
              .otherwise(0L)).as("n_late_excluded"),
            sum(when(col("ts") > v, 1L).otherwise(0L)).as("n_future"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (
          SELECT user_id,
                 CAST(ts AS TIMESTAMP) AS vts,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc,
                 CASE WHEN CAST(('0x' || substr(md5('late:' || CAST(event_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 5 = 0
                      THEN CAST(ts AS TIMESTAMP) + INTERVAL 2 DAY
                      ELSE CAST(ts AS TIMESTAMP) END AS recorded
          FROM events)
        SELECT user_id,
               CAST(sum(CASE WHEN vts <= TIMESTAMP '2024-01-15 00:00:00'
                 AND recorded <= TIMESTAMP '2024-01-16 00:00:00'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_known,
               CAST(sum(CASE WHEN vts <= TIMESTAMP '2024-01-15 00:00:00'
                 AND recorded <= TIMESTAMP '2024-01-16 00:00:00'
                 THEN xc ELSE 0 END) AS BIGINT) AS cents_known,
               CAST(sum(CASE WHEN vts <= TIMESTAMP '2024-01-15 00:00:00'
                 AND recorded > TIMESTAMP '2024-01-16 00:00:00'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_excluded,
               CAST(sum(CASE WHEN vts > TIMESTAMP '2024-01-15 00:00:00'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_future
        FROM ev GROUP BY user_id ORDER BY user_id""")),

    QDef("agg_beta_shrinkage",
      // Empirical-Bayes rate shrinkage — the small-sample stabilizer
      // every per-user/per-item rate report needs (a 1-for-2 user is
      // not a 50% converter): each user's high-spend rate shrinks
      // toward the GLOBAL rate with prior strength m=20 pseudo-counts,
      // shrunk = (s + m·p̄)/(n + m). Kept FULLY integer: with global
      // totals (S, N), shrunk_ppm = (s·N + m·S)·10⁶ div (N·(n+m)) —
      // exact cross-multiplied arithmetic, no FP rate ever formed; the
      // direction column compares s·N vs n·S the same way. The s·N
      // products ride DECIMAL(38,0) ≙ HUGEINT (past 2⁶³ at ~10¹⁰-row
      // corpora — the established overflow discipline). Shape: one
      // (user) aggregate + one broadcast scalar join; at 100 TB this
      // is the groupBy's cost and nothing else. Both shrink
      // directions live at every SF by construction (any user off the
      // global mean moves toward it).
      (s, dir) => {
        val pu = t(s, dir, "events")
          .withColumn("succ",
            (floor(col("value") * 100 + 0.5).cast("long") >= 6000L)
              .cast("long"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"), sum("succ").as("s"))
        val g = pu.agg(sum("n").as("nn"), sum("s").as("ss"))
        pu.crossJoin(broadcast(g))
          .select(col("user_id"), col("n"), col("s"),
            expr("(s * 1000000) div n").as("mle_ppm"),
            expr("""CAST(((CAST(s AS DECIMAL(38,0)) * nn + 20 * ss) * 1000000)
              div (CAST(nn AS DECIMAL(38,0)) * (n + 20)) AS BIGINT)""")
              .as("shrunk_ppm"),
            expr("""CASE WHEN CAST(s AS DECIMAL(38,0)) * nn > CAST(n AS DECIMAL(38,0)) * ss THEN 'above'
                    WHEN CAST(s AS DECIMAL(38,0)) * nn < CAST(n AS DECIMAL(38,0)) * ss THEN 'below'
                    ELSE 'at' END""").as("vs_global"))
          .orderBy("user_id")
      },
      Some("""WITH pu AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                   >= 6000 THEN 1 ELSE 0 END) AS BIGINT) AS s
          FROM events GROUP BY 1),
        g AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss
              FROM pu)
        SELECT user_id, n, s,
               CAST((s * 1000000) // n AS BIGINT) AS mle_ppm,
               CAST(((CAST(s AS HUGEINT) * nn + 20 * ss) * 1000000)
                 // (CAST(nn AS HUGEINT) * (n + 20)) AS BIGINT) AS shrunk_ppm,
               CASE WHEN CAST(s AS HUGEINT) * nn > CAST(n AS HUGEINT) * ss THEN 'above'
                    WHEN CAST(s AS HUGEINT) * nn < CAST(n AS HUGEINT) * ss THEN 'below'
                    ELSE 'at' END AS vs_global
        FROM pu CROSS JOIN g
        ORDER BY user_id""")),

    QDef("win_sprt_sequential",
      // Wald's SPRT — the SEQUENTIAL test the fixed-n t-tests here
      // can't express: walk the event stream in (ts, event_id) order,
      // accumulate the Bernoulli log-likelihood ratio, stop at the
      // first crossing of ln((1−β)/α) = ±ln 19 (α=β=0.05). Two test
      // configs run per event type: 'high_rate' (success = spend ≥ $40,
      // p̂≈0.45, H₀ 0.3 vs H₁ 0.5 → drifts up) and 'low_rate'
      // (success = spend ≥ $60, p̂≈0.30, H₀ 0.45 vs H₁ 0.65 → drifts
      // down), so BOTH decision arms are live by construction at every
      // SF. Exactness: the LLR is s·ln(p₁/p₀) + f·ln(q₁/q₀) where s,f
      // are exact window-cumulated integers and the two coefficients
      // (and the ±ln 19 boundaries) are HOST-side Scala literals that
      // flow to both engines verbatim (`e0`-forced DOUBLE in the
      // oracle) — no in-engine transcendentals, so crossing rows match
      // bit-for-bit. First crossing = min-by-n struct aggregate.
      // Scale: a sequential test is inherently serial PER TEST — the
      // per-type window is the semantics, not an accident; at 100 TB
      // you shard by running many tests (types × configs), not by
      // splitting one test's sample path.
      (s, dir) => {
        val lnA = math.log(19.0)
        def sprt(name: String, thrCents: Long, p0: Double, p1: Double) = {
          val c1 = math.log(p1 / p0)
          val c2 = math.log((1.0 - p1) / (1.0 - p0))
          val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
          val cum = t(s, dir, "events")
            .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
            .withColumn("succ", (col("xc") >= thrCents).cast("long"))
            .withColumn("n", row_number().over(w).cast("long"))
            .withColumn("sg", sum("succ").over(w))
            .withColumn("llr", col("sg").cast("double") * lit(c1) +
              (col("n") - col("sg")).cast("double") * lit(c2))
          val cross = cum
            .filter(col("llr") >= lnA || col("llr") <= -lnA)
            .groupBy("event_type")
            .agg(min(struct(col("n"), col("llr"))).as("m"))
            .select(col("event_type"), col("m.n").as("n_dec"),
              col("m.llr").as("llr_dec"))
          cum.groupBy("event_type")
            .agg(count(lit(1)).as("n_total"),
              max(struct(col("n"), col("llr"))).as("fin"))
            .join(cross, Seq("event_type"), "left")
            .select(col("event_type"), lit(name).as("test"),
              when(col("llr_dec").isNull, lit("continue"))
                .when(col("llr_dec") >= lnA, lit("accept_h1"))
                .otherwise(lit("accept_h0")).as("decision"),
              coalesce(col("n_dec"), col("n_total")).as("n_at_decision"),
              rx(coalesce(col("llr_dec"), col("fin").getField("llr")), 6)
                .as("llr"),
              col("n_total"))
        }
        sprt("high_rate", 4000L, 0.3, 0.5)
          .unionByName(sprt("low_rate", 6000L, 0.45, 0.65))
          .orderBy("test", "event_type")
      }, {
        val lnA = math.log(19.0)
        def cfg(name: String, thr: Long, p0: Double, p1: Double) = {
          val c1 = math.log(p1 / p0)
          val c2 = math.log((1.0 - p1) / (1.0 - p0))
          s"""SELECT event_type, '$name' AS test,
                CASE WHEN llr_dec IS NULL THEN 'continue'
                     WHEN llr_dec >= ${lnA}e0 THEN 'accept_h1'
                     ELSE 'accept_h0' END AS decision,
                coalesce(n_dec, n_total) AS n_at_decision,
                floor(coalesce(llr_dec, llr_fin) * 1e6 + 0.5) / 1e6 AS llr,
                n_total
              FROM (
                SELECT event_type,
                       CAST(count(*) AS BIGINT) AS n_total,
                       max_by(llr, n) AS llr_fin,
                       CAST(min(CASE WHEN llr >= ${lnA}e0 OR llr <= ${-lnA}e0
                         THEN n END) AS BIGINT) AS n_dec,
                       min_by(llr, CASE WHEN llr >= ${lnA}e0 OR llr <= ${-lnA}e0
                         THEN n END) AS llr_dec
                FROM (
                  SELECT event_type, n, sg,
                         CAST(sg AS DOUBLE) * ${c1}e0
                           + CAST(n - sg AS DOUBLE) * ${c2}e0 AS llr
                  FROM (
                    SELECT event_type,
                           CAST(row_number() OVER w AS BIGINT) AS n,
                           CAST(sum(CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                             >= $thr THEN 1 ELSE 0 END) OVER w AS BIGINT) AS sg
                    FROM events
                    WINDOW w AS (PARTITION BY event_type
                      ORDER BY CAST(ts AS TIMESTAMP), event_id)))
                GROUP BY event_type)"""
        }
        Some(s"""${cfg("high_rate", 4000L, 0.3, 0.5)}
          UNION ALL
          ${cfg("low_rate", 6000L, 0.45, 0.65)}
          ORDER BY test, event_type""")
      }),

    QDef("agg_welch_ttest",
      // Welch two-sample t-test per event type — the drift-significance
      // companion to agg_drift_tvd: is the second half-month's value
      // distribution different from the first's? Both halves fold to
      // (n, Σcents, Σcents²) in ONE conditional aggregate over one
      // scan (exact int64, map-side combined; int64 holds n·Σx² to
      // ~sf1, past that the same sums ride DECIMAL(38,0)). Mean,
      // sample variance and the t statistic are then a fixed tree of
      // single IEEE ops (+,−,×,÷,sqrt — all correctly rounded, so both
      // engines compute the identical doubles from the identical
      // integers; no transcendentals, which are NOT cross-engine
      // stable). The mid-month cut keeps both arms populated at every
      // SF. |t| > 2 flags drift — df is ≫30 here so the normal
      // threshold stands in for the t quantile.
      (s, dir) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val ev = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("h", col("ts") < cut)
        def half(flag: Boolean, suffix: String) = Seq(
          sum(when(col("h") === flag, 1L).otherwise(0L)).as(s"n_$suffix"),
          sum(when(col("h") === flag, col("xc")).otherwise(0L))
            .as(s"sx_$suffix"),
          sum(when(col("h") === flag, col("xc") * col("xc")).otherwise(0L))
            .as(s"sx2_$suffix"))
        val st = ev.groupBy("event_type")
          .agg((half(true, "a") ++ half(false, "b")).head,
            (half(true, "a") ++ half(false, "b")).tail: _*)
        def mean(p: String) =
          col(s"sx_$p").cast("double") / col(s"n_$p").cast("double")
        def svar(p: String) =
          (col(s"n_$p") * col(s"sx2_$p") - col(s"sx_$p") * col(s"sx_$p"))
            .cast("double") /
            (col(s"n_$p") * (col(s"n_$p") - 1L)).cast("double")
        val tstat = (mean("a") - mean("b")) /
          sqrt(svar("a") / col("n_a").cast("double") +
            svar("b") / col("n_b").cast("double"))
        st.select(col("event_type"), col("n_a"), col("n_b"),
            rx(mean("a") / 100.0, 4).as("mean_a"),
            rx(mean("b") / 100.0, 4).as("mean_b"),
            rx(tstat, 4).as("t_stat"),
            (abs(tstat) > 2.0).as("drift"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc,
                 CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' AS h
          FROM events),
        st AS (
          SELECT event_type,
                 CAST(sum(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN h THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
                 CAST(sum(CASE WHEN h THEN xc ELSE 0 END) AS BIGINT) AS sx_a,
                 CAST(sum(CASE WHEN NOT h THEN xc ELSE 0 END) AS BIGINT) AS sx_b,
                 CAST(sum(CASE WHEN h THEN xc * xc ELSE 0 END) AS BIGINT) AS sx2_a,
                 CAST(sum(CASE WHEN NOT h THEN xc * xc ELSE 0 END) AS BIGINT) AS sx2_b
          FROM ev GROUP BY 1),
        m AS (
          SELECT event_type, n_a, n_b,
            CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
            CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
            CAST(n_a * sx2_a - sx_a * sx_a AS DOUBLE)
              / CAST(n_a * (n_a - 1) AS DOUBLE) AS va,
            CAST(n_b * sx2_b - sx_b * sx_b AS DOUBLE)
              / CAST(n_b * (n_b - 1) AS DOUBLE) AS vb
          FROM st),
        tt AS (
          SELECT event_type, n_a, n_b, ma, mb,
            (ma - mb) / sqrt(va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)) AS t
          FROM m)
        SELECT event_type, n_a, n_b,
               ${rxSql("ma / 100.0", 4)} AS mean_a,
               ${rxSql("mb / 100.0", 4)} AS mean_b,
               ${rxSql("t", 4)} AS t_stat,
               abs(t) > 2.0 AS drift
        FROM tt ORDER BY event_type"""),
    ),

    QDef("agg_poisson_bootstrap",
      // Poisson bootstrap 95% CI of the mean order price per priority
      // — THE resampling technique for data too big to index (Chamandy
      // et al., Google): instead of drawing n rows with replacement
      // (which needs global coordination), each row independently
      // enters replica b with weight ~ Poisson(1) — in expectation a
      // with-replacement resample, embarrassingly parallel, one
      // streaming pass. Determinism: the weight is inverse-CDF sampled
      // from an md5 uniform against the host-computed PoisThr integer
      // grid — no RNG state, any engine replays it. Scale shape: the
      // B=40 replica explode multiplies MAP work only (the aggregate
      // is map-side combined, so the shuffle carries k·B rows — 200
      // here); replica means are single IEEE divisions of exact
      // DECIMAL/int64 sums, so they are bit-identical cross-engine and
      // safe to RANK directly (tie-break on b); the CI bounds are
      // positional picks at ranks 1 and 39 of the 40 means (2.5th /
      // 97.5th percentile, ceil(q·B)) inside a per-priority window.
      (s, dir) => {
        val reps = 40
        val xcents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
        val ev = t(s, dir, "orders")
          .select(col("o_orderpriority").as("pri"), col("o_orderkey"),
            xcents.as("xc"))
          .select(col("pri"), col("o_orderkey"), col("xc"),
            explode(sequence(lit(0), lit(reps - 1))).as("b"))
          .withColumn("u", Text.md5Hash32(concat(lit("pb"),
            col("b").cast("string"), lit(":"),
            col("o_orderkey").cast("string"))))
          .withColumn("w", PoisThr.map(tk =>
            when(col("u") >= tk, 1L).otherwise(0L)).reduce(_ + _))
        val repl = ev.groupBy("pri", "b")
          .agg(sum("w").as("nw"),
            sum(col("w").cast("decimal(38,0)") * col("xc")).as("sw"))
          .withColumn("m", col("sw").cast("double") / col("nw").cast("double"))
        val ranked = repl.withColumn("r", row_number().over(
          Window.partitionBy("pri").orderBy(col("m"), col("b"))))
        val ci = ranked.groupBy("pri").agg(
          max(when(col("r") === 1, col("m"))).as("lo"),
          max(when(col("r") === reps - 1, col("m"))).as("hi"))
        val base = t(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("pri"))
          .agg(count(lit(1)).as("n_orders"),
            sum(xcents.cast("decimal(38,0)")).as("sx"))
        base.join(ci, "pri")
          .select(col("pri"), col("n_orders"),
            rx(col("sx").cast("double") / col("n_orders").cast("double")
              / 100.0, 4).as("mean_price"),
            rx(col("lo") / 100.0, 4).as("ci_lo"),
            rx(col("hi") / 100.0, 4).as("ci_hi"))
          .orderBy("pri")
      },
      Some(s"""WITH ev AS (
          SELECT o_orderpriority AS pri, o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS xc
          FROM orders),
        reps AS (SELECT unnest(generate_series(0, 39)) AS b),
        wts AS (
          SELECT pri, b, xc,
            ${PoisThr.map(tk =>
              s"""(CASE WHEN CAST(('0x' || substr(md5('pb' || CAST(b AS VARCHAR) ||
                ':' || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) >= $tk
                THEN 1 ELSE 0 END)""").mkString(" + ")} AS w
          FROM ev CROSS JOIN reps),
        repl AS (
          SELECT pri, b, CAST(sum(w) AS BIGINT) AS nw,
                 sum(CAST(w AS HUGEINT) * xc) AS sw
          FROM wts GROUP BY 1, 2),
        means AS (SELECT pri, b,
                    CAST(sw AS DOUBLE) / CAST(nw AS DOUBLE) AS m
                  FROM repl),
        ranked AS (SELECT pri, m,
                     row_number() OVER (PARTITION BY pri ORDER BY m, b) AS r
                   FROM means),
        ci AS (SELECT pri, max(CASE WHEN r = 1 THEN m END) AS lo,
                      max(CASE WHEN r = 39 THEN m END) AS hi
               FROM ranked GROUP BY 1),
        base AS (SELECT o_orderpriority AS pri,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   sum(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                     AS HUGEINT)) AS sx
                 FROM orders GROUP BY 1)
        SELECT base.pri, n_orders,
          ${rxSql("CAST(sx AS DOUBLE) / CAST(n_orders AS DOUBLE) / 100.0", 4)}
            AS mean_price,
          ${rxSql("lo / 100.0", 4)} AS ci_lo,
          ${rxSql("hi / 100.0", 4)} AS ci_hi
        FROM base JOIN ci USING (pri) ORDER BY pri""")),

    QDef("agg_power_mde",
      // Experiment power planning per event type: the minimum
      // detectable effect (MDE) at 80% power / two-sided 5%, given the
      // metric's CURRENT variance and volume — the table that answers
      // "can this stream support the experiment at all?" BEFORE anyone
      // runs one (the planning complement to the after-the-fact
      // agg_welch_ttest / agg_cuped_adjust pair; CUPED's rho² shrinks
      // exactly this number). MDE = (z_{0.975}+z_{0.80})·√(2s²/n_arm),
      // n_arm = n div 2. One exact map-side sufficient-stats pass
      // (sums ride DECIMAL(38,0) ≙ HUGEINT); mean/variance/MDE are a
      // fixed IEEE tree on the exact sums — no transcendentals, the z
      // sum is one host-side shared literal — and the feasibility gate
      // compares the rx'd relative MDE to 2%, so both engines gate on
      // the same rounded double.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
        val st = ev.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum(col("xc").cast("decimal(38,0)")).as("sx"),
          sum(col("xc").cast("decimal(38,0)") * col("xc")).as("sx2"))
        def d(c: String) = col(c).cast("double")
        val nd = d("n")
        val va = (nd * d("sx2") - d("sx") * d("sx")) / (nd * (nd - 1.0))
        val mde = lit(ZSum) *
          sqrt(va * 2.0 / expr("n div 2").cast("double"))
        val mean = d("sx") / nd
        st.select(col("event_type"), col("n").as("n_events"),
            rx(mean / 100.0, 4).as("mean_val"),
            rx(sqrt(va) / 100.0, 4).as("sd_val"),
            rx(mde / 100.0, 4).as("mde_abs"),
            rx(mde / mean, 6).as("mde_rel"),
            (rx(mde / mean, 6) <= 0.02).as("feasible_2pct"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc
          FROM events),
        st AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(xc AS HUGEINT)) AS sx,
                 sum(CAST(xc AS HUGEINT) * xc) AS sx2
          FROM ev GROUP BY 1),
        m AS (
          SELECT event_type, n,
            CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
            (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
              (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS va
          FROM st),
        k AS (
          SELECT event_type, n, mean, va,
            $ZSum * sqrt(va * 2.0 / CAST(n // 2 AS DOUBLE)) AS mde
          FROM m)
        SELECT event_type, n AS n_events,
          ${rxSql("mean / 100.0", 4)} AS mean_val,
          ${rxSql("sqrt(va) / 100.0", 4)} AS sd_val,
          ${rxSql("mde / 100.0", 4)} AS mde_abs,
          ${rxSql("mde / mean", 6)} AS mde_rel,
          ${rxSql("mde / mean", 6)} <= 0.02 AS feasible_2pct
        FROM k ORDER BY event_type""")),

    QDef("agg_ratio_delta_method",
      // Delta-method standard error for a RATIO metric (clicks per
      // view, per assignment cohort) — the estimator every experiment
      // platform needs the moment its metric is a ratio of two
      // per-user quantities: user-level CTR is NOT iid row-level CTR
      // (users contribute correlated numerators and denominators), so
      // naive binomial SEs are wrong and the delta method's
      // Var(R̂) = (Vx − 2R·Cxy + R²·Vy)/(n·μy²) is the standard fix
      // (completing the experimentation shelf: SRM → CUPED → MDE →
      // ratio SEs). One conditional per-user aggregate + one
      // cohort-level moment rollup, both map-side combined — two
      // shuffles total, each bounded by users then cohorts. All six
      // sufficient sums are exact int64 (per-user event counts; at
      // 10¹⁰ users the squares still sit under 2⁶³ — the welch bound
      // note applies past that); the μy²-denominated form avoids
      // dividing by μx (a zero-click cohort stays finite), and the
      // variance is clamped at 0 before the sqrt (a |ρ|≈1 rounding
      // artifact must yield se = 0, not NaN — identically in both
      // engines). R, SE, and the z-CI are one fixed IEEE tree, rx(6).
      (s, dir) => {
        val pu = t(s, dir, "events")
          .groupBy(pmod(col("user_id"), lit(5L)).as("cohort"), col("user_id"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("x"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("y"))
        val st = pu.groupBy("cohort").agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        def d(c: String) = col(c).cast("double")
        val nd = d("n")
        val vx = (nd * d("sxx") - d("sx") * d("sx")) / (nd * (nd - 1.0))
        val vy = (nd * d("syy") - d("sy") * d("sy")) / (nd * (nd - 1.0))
        val cxy = (nd * d("sxy") - d("sx") * d("sy")) / (nd * (nd - 1.0))
        val r = d("sx") / d("sy")
        val muY = d("sy") / nd
        val se = sqrt(
          greatest(vx - lit(2.0) * r * cxy + r * r * vy, lit(0.0)) /
            (nd * muY * muY))
        st.select(col("cohort"), col("n").as("n_users"),
            col("sx").as("clicks"), col("sy").as("views"),
            rx(r, 6).as("ratio"), rx(se, 6).as("se"),
            rx(r - lit(Z975) * se, 6).as("ci_lo"),
            rx(r + lit(Z975) * se, 6).as("ci_hi"))
          .orderBy("cohort")
      },
      Some(s"""WITH pu AS (
          SELECT user_id % 5 AS cohort, user_id,
                 CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS BIGINT) AS x,
                 CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT cohort, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM pu GROUP BY 1),
        m AS (
          SELECT cohort, n, sx, sy,
            (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) /
              (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS vx,
            (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) /
              (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS vy,
            (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
              (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS cxy,
            CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
            CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS muy
          FROM st),
        k AS (
          SELECT cohort, n, sx, sy, r,
            sqrt(greatest(vx - 2.0 * r * cxy + r * r * vy, 0.0) /
              (CAST(n AS DOUBLE) * muy * muy)) AS se
          FROM m)
        SELECT cohort, n AS n_users, sx AS clicks, sy AS views,
          ${rxSql("r", 6)} AS ratio, ${rxSql("se", 6)} AS se,
          ${rxSql(s"r - $Z975 * se", 6)} AS ci_lo,
          ${rxSql(s"r + $Z975 * se", 6)} AS ci_hi
        FROM k ORDER BY cohort""")),

    QDef("profile_sequence_gaps",
      // Sequence-gap detection over an id stream — the ingest monitor
      // that answers "which id ranges never arrived?" (dropped
      // batches, dead producers, failed backfills show as contiguous
      // holes). Finding gaps needs CONSECUTIVE elements of a global
      // order — the classic single-reducer lag() trap — solved here as
      // ONE-PASS distributed lag (DistributedRank.withGlobalLead): a
      // lead() inside each value-range shard pairs successors
      // directly, and only the ≤shards boundary rows cross shards via
      // the driver-sized shard-bounds table — no global ordinal, no
      // rk ↔ rk+1 self-join over the corpus (the round-13 spelling
      // read the ranked frame twice on top of the rank's own triple
      // read; this is one shard-partitioned sort + one tiny aggregate).
      // The oracle keeps the lag() spelling: same semantics,
      // engine-appropriate operators. The synthetic id space is dense
      // (gap-free — a monitor that can never fire), so the feed
      // simulates ingest loss: ids hashing into a deterministic 1-in-20
      // md5 bucket "never arrived", which yields single and multi-id
      // holes at every SF (the derived-feed reachability rule).
      // Gaps before the first arrival are out of scope by definition
      // (gaps BETWEEN arrivals). Top-20 by (size, position) with full
      // tie-break.
      (s, dir) => {
        val arrived = t(s, dir, "events").select(col("event_id")).distinct()
          .filter(pmod(Text.md5Hash32(concat(lit("gap:"),
            col("event_id").cast("string"))), lit(20L)) =!= 0)
        graft.operators.DistributedRank
          .withGlobalLead(arrived, col("event_id"), out = "nk")
          .filter(col("nk") - col("event_id") > 1)
          .select(col("event_id").as("gap_after"),
            col("nk").as("next_present"),
            (col("nk") - col("event_id") - 1).as("n_missing"))
          .orderBy(col("n_missing").desc, col("gap_after"))
          .limit(20)
      },
      Some("""WITH arrived AS (
          SELECT DISTINCT event_id FROM events
          WHERE CAST(('0x' || substr(md5('gap:' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 20 <> 0),
        g AS (SELECT event_id AS nk,
                lag(event_id) OVER (ORDER BY event_id) AS k
              FROM arrived)
        SELECT k AS gap_after, nk AS next_present,
               CAST(nk - k - 1 AS BIGINT) AS n_missing
        FROM g WHERE nk - k > 1
        ORDER BY n_missing DESC, gap_after LIMIT 20""")),

    QDef("pipeline_retention_sweep",
      // Data-lifecycle retention sweep — the TTL report a warehouse
      // runs before every purge cycle: per source, how many rows are
      // past the 14-day retention window, how many of those a legal
      // hold exempts (purchase events — transaction records under
      // audit retention), and what actually gets deleted. "Now" is the
      // newest event anywhere (deterministic, replayable — never
      // wall-clock, which would make the oracle unrepeatable); ages
      // are exact integer day differences on DATEs; the mid-stream
      // 14-day cut keeps expired AND retained arms populated at every
      // SF, and the purchase hold keeps the exemption arm live. One
      // map-side-combined aggregate over one scan + a 1-row broadcast
      // — at 100 TB with date-partitioned storage the expired
      // predicate is partition pruning, making the sweep metadata-only.
      (s, dir) => {
        val nowD = t(s, dir, "events").agg(max(to_date(col("ts"))).as("nowd"))
        t(s, dir, "events").crossJoin(broadcast(nowD))
          .withColumn("expired",
            datediff(col("nowd"), to_date(col("ts"))) > 14)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("expired"), 1L).otherwise(0L)).as("n_expired"))
          .withColumn("n_hold", when(col("event_type") === "purchase",
            col("n_expired")).otherwise(0L))
          .withColumn("n_delete", col("n_expired") - col("n_hold"))
          .withColumn("delete_ppm", expr("(1000000 * n_delete) div n_rows"))
          .orderBy("event_type")
      },
      Some("""WITH nowd AS (
          SELECT max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS nd FROM events),
        r AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN date_diff('day',
                     CAST(CAST(ts AS TIMESTAMP) AS DATE), nd) > 14
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_expired
          FROM events, nowd GROUP BY 1)
        SELECT event_type, n_rows, n_expired,
               CAST(CASE WHEN event_type = 'purchase' THEN n_expired
                 ELSE 0 END AS BIGINT) AS n_hold,
               n_expired - (CASE WHEN event_type = 'purchase'
                 THEN n_expired ELSE 0 END) AS n_delete,
               CAST((1000000 * (n_expired - (CASE WHEN event_type = 'purchase'
                 THEN n_expired ELSE 0 END))) // n_rows AS BIGINT)
                 AS delete_ppm
        FROM r ORDER BY event_type""")),

    QDef("agg_chi2_independence",
      // Chi-squared test of independence + Cramér's V over the
      // segment × nation contingency table — "is market segment
      // associated with nation?", the categorical companion to
      // agg_welch_ttest (means) and agg_corr_decimal (numeric). One
      // map-side-combined aggregate builds the observed cells; margins
      // and dims are cell-table rollups (bounded by the category
      // product, NOT the fact table), so every crossJoin here is a
      // tiny-dim scalar attach (5 segs × 25 nations × one totals row).
      // The FULL grid — including obs=0 cells, which still contribute
      // their expectation — comes from the margin cross product with a
      // left join back to the observed cells. Numeric discipline:
      // expected counts and per-cell contributions are fixed trees of
      // single IEEE ops on exact integers (no transcendentals), each
      // cell is rx-rounded to 6 digits THEN summed as DECIMAL(38,6)
      // over an unbounded window — an order-free exact sum both
      // engines reproduce bit-identically (raw double window sums are
      // fold-order-dependent); Cramér's V adds only IEEE-exact sqrt
      // and division. At 100 TB the only corpus-sized stage is the
      // first groupBy; everything after runs on ~125 rows.
      (s, dir) => {
        val cells = t(s, dir, "customer")
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_mktsegment").as("seg"), col("n_name").as("nat"))
          .groupBy("seg", "nat").agg(count(lit(1)).as("obs"))
        val rt = cells.groupBy("seg").agg(sum("obs").as("n_seg"))
        val ct = cells.groupBy("nat").agg(sum("obs").as("n_nat"))
        val dims = rt.agg(count(lit(1)).as("r"))
          .crossJoin(ct.agg(count(lit(1)).as("c")))
          .crossJoin(cells.agg(sum("obs").as("n")))
        val grid = rt.crossJoin(ct).crossJoin(dims)
          .join(cells, Seq("seg", "nat"), "left")
          .withColumn("obs", coalesce(col("obs"), lit(0L)))
        val expd = (col("n_seg") * col("n_nat")).cast("double") /
          col("n").cast("double")
        val contrib = rx((col("obs").cast("double") - expd) *
          (col("obs").cast("double") - expd) / expd, 6)
        val w = Window.partitionBy()
        val scored = grid
          .withColumn("exp_ct", rx(expd, 6))
          .withColumn("cell_chi2", contrib)
          .withColumn("chi2",
            sum(contrib.cast("decimal(38,6)")).over(w).cast("double"))
        scored.select(col("seg"), col("nat"), col("obs"),
            col("exp_ct"), col("cell_chi2"), col("chi2"),
            ((col("r") - 1) * (col("c") - 1)).as("dof"),
            rx(sqrt(col("chi2") /
              (col("n") * least(col("r") - 1, col("c") - 1)).cast("double")), 6)
              .as("cramers_v"))
          .orderBy("seg", "nat")
      },
      Some(s"""WITH cn AS (
          SELECT c_mktsegment AS seg, n_name AS nat
          FROM customer JOIN nation ON c_nationkey = n_nationkey),
        cells AS (SELECT seg, nat, CAST(count(*) AS BIGINT) AS obs
                  FROM cn GROUP BY 1, 2),
        rt AS (SELECT seg, CAST(sum(obs) AS BIGINT) AS n_seg FROM cells GROUP BY 1),
        ct AS (SELECT nat, CAST(sum(obs) AS BIGINT) AS n_nat FROM cells GROUP BY 1),
        dims AS (SELECT CAST((SELECT count(*) FROM rt) AS BIGINT) AS r,
                        CAST((SELECT count(*) FROM ct) AS BIGINT) AS c,
                        CAST((SELECT sum(obs) FROM cells) AS BIGINT) AS n),
        grid AS (
          SELECT rt.seg, rt.n_seg, ct.nat, ct.n_nat, dims.r, dims.c, dims.n,
                 COALESCE(cells.obs, 0) AS obs
          FROM rt CROSS JOIN ct CROSS JOIN dims
          LEFT JOIN cells ON cells.seg = rt.seg AND cells.nat = ct.nat),
        g AS (
          SELECT seg, nat, obs, r, c, n,
                 CAST(n_seg * n_nat AS DOUBLE) / CAST(n AS DOUBLE) AS e
          FROM grid),
        g2 AS (
          SELECT seg, nat, obs, r, c, n,
                 ${rxSql("e", 6)} AS exp_ct,
                 ${rxSql("(CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e) / e", 6)} AS cell_chi2
          FROM g),
        g3 AS (
          SELECT seg, nat, obs, exp_ct, cell_chi2, r, c, n,
                 CAST(sum(CAST(cell_chi2 AS DECIMAL(38,6))) OVER () AS DOUBLE) AS chi2
          FROM g2)
        SELECT seg, nat, obs, exp_ct, cell_chi2, chi2,
               CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
               ${rxSql("sqrt(chi2 / CAST(n * least(r - 1, c - 1) AS DOUBLE))", 6)} AS cramers_v
        FROM g3 ORDER BY seg, nat"""),
    ),

    QDef("agg_moments_skew_kurt",
      // Higher distribution moments per event type — skewness and
      // excess kurtosis, the shape profile a drift monitor keeps next
      // to mean/stddev (agg_welch_ttest) when tail behavior matters.
      // One map-side-combined aggregate folds each group to exact
      // power sums (n, ΣX, ΣX², ΣX³, ΣX⁴) of integer cents; X⁴ tops
      // 1e19 per term so the cubic and quartic terms ride DECIMAL(38,0)
      // in Spark ≙ HUGEINT in DuckDB — both 100% exact, and both cast
      // to the identical nearest double at the end. The central
      // moments, skew (m3/(√m2·m2) — no pow(), which is not
      // correctly-rounded) and kurtosis are then the SAME fixed tree of
      // single IEEE ops on those identical doubles in both engines,
      // rx-rounded only at the output boundary. Corpus-sized work is
      // exactly one scan + one bounded-key aggregate.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
        val st = ev.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("xc").as("s1"),
          // s2 rides DECIMAL too: Σxc² over ~1e12 rows/group of 1e4-
          // cent values is ~1e20 — past int64 even though each term
          // fits (the r12 overflow sweep; s3/s4 had it from day one).
          sum(col("xc").cast("decimal(38,0)") * col("xc")).as("s2"),
          sum(col("xc").cast("decimal(38,0)") * col("xc") * col("xc")).as("s3"),
          sum(col("xc").cast("decimal(38,0)") * col("xc") * col("xc") * col("xc")).as("s4"))
        val n = col("n").cast("double")
        val mu = col("s1").cast("double") / n
        val m2 = col("s2").cast("double") / n - mu * mu
        val m3 = col("s3").cast("double") / n - lit(3.0) * mu *
          (col("s2").cast("double") / n) + lit(2.0) * mu * mu * mu
        val m4 = col("s4").cast("double") / n - lit(4.0) * mu *
          (col("s3").cast("double") / n) + lit(6.0) * mu * mu *
          (col("s2").cast("double") / n) - lit(3.0) * mu * mu * mu * mu
        st.select(col("event_type"), col("n"),
            rx(mu / 100.0, 4).as("mean"),
            rx(sqrt(m2) / 100.0, 4).as("stddev_pop"),
            rx(m3 / (sqrt(m2) * m2), 6).as("skewness"),
            rx(m4 / (m2 * m2) - lit(3.0), 6).as("kurt_excess"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
          SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc
          FROM events),
        st AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(xc) AS BIGINT) AS s1,
                 sum(CAST(xc AS HUGEINT) * xc) AS s2,
                 sum(CAST(xc AS HUGEINT) * xc * xc) AS s3,
                 sum(CAST(xc AS HUGEINT) * xc * xc * xc) AS s4
          FROM ev GROUP BY 1),
        m AS (
          SELECT event_type, n,
            CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
            CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
            CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
            CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
          FROM st),
        c AS (
          SELECT event_type, n, mu,
            r2 - mu * mu AS m2,
            r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
            r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 - 3.0 * mu * mu * mu * mu AS m4
          FROM m)
        SELECT event_type, n,
               ${rxSql("mu / 100.0", 4)} AS mean,
               ${rxSql("sqrt(m2) / 100.0", 4)} AS stddev_pop,
               ${rxSql("m3 / (sqrt(m2) * m2)", 6)} AS skewness,
               ${rxSql("m4 / (m2 * m2) - 3.0", 6)} AS kurt_excess
        FROM c ORDER BY event_type"""),
    ),

    QDef("win_kaplan_meier",
      // Kaplan-Meier survival estimate over time-to-conversion: per
      // user, days from first event to the first big purchase
      // (value >= 100 — chosen so BOTH arms are populated at every SF:
      // users who never convert are right-CENSORED at their last
      // observed event, and a dead censor arm would make censor
      // handling untestable). The survival table is the classic product
      // S(t) = Π (1 - d_i/n_i) over event times <= t. Scale shape: the
      // ONLY corpus-sized stage is the per-user aggregate; everything
      // after runs on at most one row per distinct duration-day
      // (bounded by the observation window, ~31 here), and the one
      // running total over that table rides the shard-offset helper
      // anyway — the day span is the corpus's collection time, the one
      // "small" count that grows with it.
      // Cross-engine determinism of the product: both engines fold the
      // IDENTICAL ordered factor sequence left-to-right (Spark
      // `aggregate` over the sorted steps array ≙ DuckDB `list_reduce`
      // over an ORDER BY list) — every factor and multiply is a single
      // correctly-rounded IEEE op on identical inputs, so no log-sum
      // trick and no drift; rx(10) only at the output boundary.
      (s, dir) => {
        val u = t(s, dir, "events").groupBy("user_id").agg(
          min("ts").as("e0"),
          min(when(col("event_type") === "purchase" && col("value") >= 100,
            col("ts"))).as("ep"),
          max("ts").as("tl"))
        val dur = u.select(
          datediff(coalesce(col("ep"), col("tl")).cast("date"),
            col("e0").cast("date")).cast("long").as("t"),
          col("ep").isNotNull.as("observed"))
        val km = dur.groupBy("t").agg(
          sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
          sum(when(col("observed"), 0L).otherwise(1L)).as("c"))
        // The at-risk count is an EXCLUSIVE running total over the
        // duration-day table. That table is observation-window-sized
        // (~31 rows here), but its row count is the corpus's day SPAN —
        // the one distinct-count that grows with collection time (the
        // same reason the bounded walk excludes year()) — so the
        // cumulative rides the shard-offset helper rather than a
        // partition-less window: exclusive = inclusive − own weight.
        // n_total comes from the MAX of the inclusive cumulative (its
        // last value IS Σ(d+c); the cumsum helper persists its keyed
        // input, so this aggregate reads the cache) instead of a
        // separate km.agg crossJoined BELOW the cumsum — that form put
        // the whole corpus user-aggregate chain into the cached frame
        // twice (km and tot arms), so every run paid the events
        // aggregate 2x (r18: one corpus pass, 18 -> 9 static scans).
        val cum = DistributedRank.withGlobalCumsum(
            km, col("t"), lit(0L), col("d") + col("c"), out = "__km_cum")
        val tot = cum.agg(max("__km_cum").as("n_total"))
        val km2 = cum.crossJoin(broadcast(tot))
          .withColumn("n_risk", col("n_total") -
            (col("__km_cum") - (col("d") + col("c"))))
          .drop("__km_cum")
        val steps = km2.agg(
          sort_array(collect_list(struct(col("t"), col("d"), col("n_risk"))))
            .as("steps"))
        km2.crossJoin(broadcast(steps))
          .withColumn("surv", rx(aggregate(
            filter(col("steps"), e => e.getField("t") <= col("t")),
            lit(1.0),
            (acc, e) => acc * (lit(1.0) -
              e.getField("d").cast("double") /
                e.getField("n_risk").cast("double"))), 10))
          .select(col("t").as("t_days"), col("d").as("n_events"),
            col("c").as("n_censored"), col("n_risk"), col("surv"))
          .orderBy("t_days")
      },
      Some(s"""WITH u AS (
          SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS e0,
                 min(CASE WHEN event_type = 'purchase' AND value >= 100
                          THEN CAST(ts AS TIMESTAMP) END) AS ep,
                 max(CAST(ts AS TIMESTAMP)) AS tl
          FROM events GROUP BY 1),
        dur AS (
          SELECT CAST(date_diff('day', CAST(e0 AS DATE),
                                CAST(COALESCE(ep, tl) AS DATE)) AS BIGINT) AS t,
                 ep IS NOT NULL AS observed
          FROM u),
        km AS (
          SELECT t, CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS d,
                 CAST(sum(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT) AS c
          FROM dur GROUP BY 1),
        km2 AS (
          SELECT t, d, c,
                 CAST((SELECT sum(d + c) FROM km) -
                      COALESCE(sum(d + c) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS n_risk
          FROM km)
        SELECT k.t AS t_days, k.d AS n_events, k.c AS n_censored, k.n_risk,
               ${rxSql("""(SELECT COALESCE(list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                 list(CAST(1.0 AS DOUBLE) - CAST(k2.d AS DOUBLE) / CAST(k2.n_risk AS DOUBLE)
                      ORDER BY k2.t)), (a, x) -> a * x), 1.0)
                 FROM km2 k2 WHERE k2.t <= k.t)""", 10)} AS surv
        FROM km2 k ORDER BY t_days"""),
    ),

    QDef("win_theil_sen",
      // Theil-Sen robust trend per event type: the slope estimate a
      // drift monitor trusts when single-day outliers poison least
      // squares (the estimator has a 29% breakdown point vs LS's
      // zero). Slope = MEDIAN of all pairwise day-to-day slopes of the
      // daily revenue series. Scale discipline: the pairwise stage is
      // quadratic in DAYS PER TYPE (bounded by the observation window,
      // ≤ ~31 here — never in the corpus), after a corpus-sized
      // map-side aggregate folds events to exact daily cent sums; so
      // the plan is one scan + one bounded self-join per type. Each
      // slope is ONE IEEE division of exact integers; the median is
      // positional (row_number against the pair count, averaging the
      // two middles on even counts — a commutative 2-term add, safe),
      // so no FP fold order exists anywhere.
      (s, dir) => {
        // daily is BOUNDED (types x days) but referenced 3x (both
        // slope-pair sides + the day count) — unpinned, the corpus
        // daily aggregate ran 3x per execution (r18).
        val daily = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("d",
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast("long"))
          .groupBy("event_type", "d").agg(sum("xc").as("y"))
          .transform(d => graft.pipeline.Lineage.checkpoint(d))
        val slopes = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.d") < col("b.d"))
          .select(col("a.event_type").as("event_type"),
            ((col("b.y") - col("a.y")).cast("double") /
              (col("b.d") - col("a.d")).cast("double")).as("slope"))
        val np = slopes.groupBy("event_type")
          .agg(count(lit(1)).as("n_pairs"))
        val nd = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
        val rn = row_number().over(
          Window.partitionBy("event_type").orderBy("slope")).cast("long")
        slopes.withColumn("rn", rn)
          .join(np, "event_type")
          .filter(col("rn") === expr("(n_pairs + 1) div 2") ||
            col("rn") === expr("(n_pairs + 2) div 2"))
          .groupBy("event_type", "n_pairs")
          .agg((sum("slope") / count(lit(1))).as("m"))
          .join(nd, "event_type")
          .select(col("event_type"), col("n_days"), col("n_pairs"),
            rx(col("m"), 6).as("ts_slope_cents_per_day"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
          SELECT event_type,
                 CAST(date_diff('day', DATE '2024-01-01',
                                CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        slopes AS (
          SELECT a.event_type,
                 CAST(b.y - a.y AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.d < b.d),
        np AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs
               FROM slopes GROUP BY 1),
        nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
               FROM daily GROUP BY 1),
        rk AS (
          SELECT event_type, slope,
                 CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY slope) AS BIGINT) AS rn
          FROM slopes),
        med AS (
          SELECT r.event_type, n_pairs,
                 sum(r.slope) / count(*) AS m
          FROM rk r JOIN np ON np.event_type = r.event_type
          WHERE r.rn = (n_pairs + 1) // 2 OR r.rn = (n_pairs + 2) // 2
          GROUP BY 1, 2)
        SELECT med.event_type, n_days, n_pairs,
               ${rxSql("m", 6)} AS ts_slope_cents_per_day
        FROM med JOIN nd ON nd.event_type = med.event_type
        ORDER BY med.event_type"""),
    ),

    QDef("win_changepoint_pettitt",
      // Pettitt changepoint test per event type — the nonparametric
      // "did the distribution SHIFT, and when?" companion to
      // win_cusum_alert (which assumes a known baseline): U_t =
      // ΣΣ sign(x_j − x_i) over pairs straddling cut t, the changepoint
      // is argmax |U_t|, and significance uses the classic
      // approximation p ≈ 2·exp(−6K²/(n³+n²)) rearranged so the GATE is
      // integer-vs-one-multiply: 6K² ≥ C·(n³+n²) with C = −ln(0.025)
      // evaluated HOST-side once and flowing to both engines as the
      // same literal (keeps libm out of the gate). Everything is rank
      // arithmetic on exact daily cent sums. Scale shape: pairs and
      // cuts are quadratic/cubic in DAYS PER TYPE (≤ ~31, bounded by
      // the observation window) downstream of the one corpus-sized
      // map-side daily aggregate — the same boundedness argument as
      // win_theil_sen, never corpus-quadratic.
      (s, dir) => {
        val C = 3.6888794541139363 // -ln(0.025), host-side, shared literal
        // daily is BOUNDED (types x days) but referenced 4x (both pair
        // sides + the cuts aggregate and its join) — unpinned, the
        // corpus daily aggregate ran 4x per execution (r18).
        val daily = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("d",
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast("long"))
          .groupBy("event_type", "d").agg(sum("xc").as("x"))
          .transform(d => graft.pipeline.Lineage.checkpoint(d))
        val pairs = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.d") < col("b.d"))
          .select(col("a.event_type").as("event_type"),
            col("a.d").as("di"), col("b.d").as("dj"),
            when(col("b.x") > col("a.x"), 1L)
              .when(col("b.x") < col("a.x"), -1L).otherwise(0L).as("sgn"))
        val cuts = daily.groupBy("event_type")
          .agg(max("d").as("dmax"), count(lit(1)).as("n_days"))
          .join(daily.select(col("event_type"), col("d").as("t")), "event_type")
          .filter(col("t") < col("dmax"))
          .select("event_type", "t", "n_days")
        val u = cuts.join(pairs, Seq("event_type"))
          .filter(col("di") <= col("t") && col("t") < col("dj"))
          .groupBy("event_type", "t", "n_days")
          .agg(sum("sgn").as("u_t"))
        u.withColumn("rn", row_number().over(
            Window.partitionBy("event_type")
              .orderBy(abs(col("u_t")).desc, col("t"))))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("n_days"), col("t").as("cp_day"),
            col("u_t").as("u_at_cp"), abs(col("u_t")).as("k_abs"),
            ((col("u_t") * col("u_t") * 6).cast("double") >=
              lit(C) * (col("n_days") * col("n_days") * col("n_days") +
                col("n_days") * col("n_days")).cast("double"))
              .as("significant"))
          .orderBy("event_type")
      }, {
        val C = "3.6888794541139363e0"
        Some(s"""WITH daily AS (
          SELECT event_type,
                 CAST(date_diff('day', DATE '2024-01-01',
                                CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        pairs AS (
          SELECT a.event_type, a.d AS di, b.d AS dj,
                 CAST(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END AS BIGINT) AS sgn
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.d < b.d),
        meta AS (
          SELECT event_type, max(d) AS dmax, CAST(count(*) AS BIGINT) AS n_days
          FROM daily GROUP BY 1),
        cuts AS (
          SELECT daily.event_type, daily.d AS t, meta.n_days
          FROM daily JOIN meta ON meta.event_type = daily.event_type
          WHERE daily.d < meta.dmax),
        u AS (
          SELECT c.event_type, c.t, c.n_days,
                 CAST(sum(p.sgn) AS BIGINT) AS u_t
          FROM cuts c JOIN pairs p
            ON p.event_type = c.event_type
           AND p.di <= c.t AND c.t < p.dj
          GROUP BY 1, 2, 3),
        best AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                   ORDER BY abs(u_t) DESC, t) AS rn
          FROM u)
        SELECT event_type, n_days, t AS cp_day, u_t AS u_at_cp,
               abs(u_t) AS k_abs,
               CAST(u_t * u_t * 6 AS DOUBLE) >=
                 $C * CAST(n_days * n_days * n_days + n_days * n_days AS DOUBLE)
                 AS significant
        FROM best WHERE rn = 1 ORDER BY event_type""")
      }),

    QDef("agg_ks_test",
      // Two-sample Kolmogorov-Smirnov per event type — the
      // distribution-SHAPE drift test next to agg_welch_ttest (means
      // only) and win_changepoint_pettitt (shift location): D =
      // max_x |F1(x) − F2(x)| between the first and second half-month
      // value distributions. ENTIRELY integer: with per-value
      // cumulative counts c1, c2 and totals n1, n2, the numerator is
      // max |c1·n2 − c2·n1| (D = that over n1·n2), and the α=0.05
      // rejection D ≥ c·√((n1+n2)/(n1·n2)) squares into
      // d_num² ≥ c²·n1·n2·(n1+n2) — ONE double multiply against an
      // exact integer, c² a host-side shared literal; libm never
      // enters the gate. Scale shape: one map-side aggregate to
      // (type, cent-value) cells — bounded by the value domain, not
      // the corpus — then a per-type cumsum window over those cells.
      (s, dir) => {
        val cells = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("h",
            col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
          .groupBy("event_type", "xc")
          .agg(sum(when(col("h"), 1L).otherwise(0L)).as("a"),
            sum(when(col("h"), 0L).otherwise(1L)).as("b"))
        val w = Window.partitionBy("event_type").orderBy("xc")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = cells
          .withColumn("c1", sum("a").over(w))
          .withColumn("c2", sum("b").over(w))
        val tot = cells.groupBy("event_type")
          .agg(sum("a").as("n1"), sum("b").as("n2"))
        cum.join(tot, "event_type")
          .groupBy("event_type", "n1", "n2")
          .agg(max(abs(col("c1") * col("n2") - col("c2") * col("n1")))
            .as("d_num"))
          .select(col("event_type"), col("n1"), col("n2"), col("d_num"),
            expr("(d_num * 1000000) div (n1 * n2)").as("d_ppm"),
            // squares/products in DOUBLE (each multiply one exact-
            // rounded IEEE op) — the int64 spelling overflows past ~sf1
            (col("d_num").cast("double") * col("d_num").cast("double") >=
              lit(KsC2) * (col("n1").cast("double") * col("n2").cast("double") *
                (col("n1") + col("n2")).cast("double"))).as("reject_h0"))
          .orderBy("event_type")
      }, {
        val c2 = s"${KsC2}e0"
        Some(s"""WITH ev AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc,
                 CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' AS h
          FROM events),
        cells AS (
          SELECT event_type, xc,
                 CAST(sum(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(sum(CASE WHEN h THEN 0 ELSE 1 END) AS BIGINT) AS b
          FROM ev GROUP BY 1, 2),
        tot AS (
          SELECT event_type, CAST(sum(a) AS BIGINT) AS n1,
                 CAST(sum(b) AS BIGINT) AS n2
          FROM cells GROUP BY 1),
        cum AS (
          SELECT event_type, xc,
                 CAST(sum(a) OVER (PARTITION BY event_type ORDER BY xc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
                 CAST(sum(b) OVER (PARTITION BY event_type ORDER BY xc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2
          FROM cells),
        d AS (
          SELECT c.event_type, t.n1, t.n2,
                 CAST(max(abs(c.c1 * t.n2 - c.c2 * t.n1)) AS BIGINT) AS d_num
          FROM cum c JOIN tot t ON t.event_type = c.event_type
          GROUP BY 1, 2, 3)
        SELECT event_type, n1, n2, d_num,
               CAST((d_num * 1000000) // (n1 * n2) AS BIGINT) AS d_ppm,
               CAST(d_num AS DOUBLE) * CAST(d_num AS DOUBLE) >=
                 $c2 * (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) *
                        CAST(n1 + n2 AS DOUBLE)) AS reject_h0
        FROM d ORDER BY event_type""")
      }),

    QDef("win_autocorr",
      // Sample autocorrelation (lags 1..7) of the daily revenue series
      // per event type — the weekly-seasonality detector a monitor
      // runs before trusting any day-over-day alert (a strong lag-7
      // spike means "compare to last Tuesday, not yesterday"). Exact
      // decomposition: positions come from a per-type row_number (so
      // gaps in the calendar don't silently misalign lags), the lag
      // pairing is one self-join on rn+k against a broadcast 7-row lag
      // dim, and every sum (ΣxᵢxᵢŦₖ as DECIMAL ≙ HUGEINT, head/tail
      // sums, Σx, Σx²) is exact integer — r_k is then the SAME fixed
      // IEEE tree in both engines (the moments discipline), rx only at
      // the boundary. Pairs are n·7 per type, bounded by the window.
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("d",
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast("long"))
          .groupBy("event_type", "d").agg(sum("xc").as("x"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("d")).cast("long"))
        val stats = daily.groupBy("event_type").agg(
          count(lit(1)).as("n"), sum("x").as("s1"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("s2"))
        val ks = (1 to 7).map(_.toLong).toDF("k")
        val lagged = daily.as("a").crossJoin(broadcast(ks))
          .join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("b.rn") === col("a.rn") + col("k"))
          .groupBy(col("a.event_type").as("event_type"), col("k"))
          .agg(sum(col("a.x").cast("decimal(38,0)") * col("b.x")).as("cross"),
            sum(col("a.x")).as("sh"), sum(col("b.x")).as("st"),
            count(lit(1)).as("m"))
        val mu = col("s1").cast("double") / col("n").cast("double")
        val num = col("cross").cast("double") - mu * col("sh").cast("double") -
          mu * col("st").cast("double") +
          col("m").cast("double") * mu * mu
        val den = col("s2").cast("double") -
          mu * col("s1").cast("double")
        lagged.join(stats, "event_type")
          .select(col("event_type"), col("k"), col("n").as("n_days"),
            col("m").as("n_pairs"), rx(num / den, 6).as("r_k"))
          .orderBy("event_type", "k")
      },
      Some(s"""WITH daily AS (
          SELECT event_type,
                 CAST(date_diff('day', DATE '2024-01-01',
                                CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        pos AS (
          SELECT event_type, x,
                 CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS rn
          FROM daily),
        stats AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS s1,
                 sum(CAST(x AS HUGEINT) * x) AS s2
          FROM pos GROUP BY 1),
        ks AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS k),
        lagged AS (
          SELECT a.event_type, ks.k,
                 sum(CAST(a.x AS HUGEINT) * b.x) AS cross_,
                 CAST(sum(a.x) AS BIGINT) AS sh,
                 CAST(sum(b.x) AS BIGINT) AS st,
                 CAST(count(*) AS BIGINT) AS m
          FROM pos a CROSS JOIN ks
          JOIN pos b ON b.event_type = a.event_type AND b.rn = a.rn + ks.k
          GROUP BY 1, 2),
        j AS (
          SELECT l.event_type, l.k, s.n, l.m,
                 CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE) AS mu,
                 CAST(l.cross_ AS DOUBLE) AS crossd,
                 CAST(l.sh AS DOUBLE) AS shd, CAST(l.st AS DOUBLE) AS std_,
                 CAST(s.s2 AS DOUBLE) AS s2d, CAST(s.s1 AS DOUBLE) AS s1d,
                 CAST(l.m AS DOUBLE) AS md
          FROM lagged l JOIN stats s ON s.event_type = l.event_type)
        SELECT event_type, k, n AS n_days, m AS n_pairs,
               ${rxSql("(crossd - mu * shd - mu * std_ + md * mu * mu) / (s2d - mu * s1d)", 6)} AS r_k
        FROM j ORDER BY event_type, k"""),
    ),

    QDef("agg_cuped_adjust",
      // CUPED variance reduction (Deng et al., WSDM'13) per event
      // type — the experimentation-platform companion to
      // sample_srm_check: using each user's PRE-period value (first
      // half-month) as the covariate, the adjusted post-period metric
      // Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X) cuts metric
      // variance by exactly ρ² — often the difference between a
      // two-week and a two-day experiment. Everything derives from ONE
      // map-side aggregate of exact per-user integer sums (Σx, Σy,
      // Σxy, Σx², Σy² — the cross/square sums ride DECIMAL(38,0) ≙
      // HUGEINT, int64 overflows past ~sf0.1); θ, ρ² and the variance
      // pair are the same fixed IEEE tree in both engines, rx'd at the
      // boundary. Users absent from a half carry 0 — the standard
      // missing-pre-period convention, stated not hidden.
      (s, dir) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val perU = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .groupBy("event_type", "user_id")
          .agg(sum(when(col("ts") < cut, col("xc")).otherwise(0L)).as("x"),
            sum(when(col("ts") >= cut, col("xc")).otherwise(0L)).as("y"))
        val st = perU.groupBy("event_type").agg(
          count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sx2"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("sy2"))
        val nd = col("n").cast("double")
        val mx = col("sx").cast("double") / nd
        val my = col("sy").cast("double") / nd
        val varX = col("sx2").cast("double") / nd - mx * mx
        val varY = col("sy2").cast("double") / nd - my * my
        val cov = col("sxy").cast("double") / nd - mx * my
        val theta = cov / varX
        val rho2 = cov * cov / (varX * varY)
        st.select(col("event_type"), col("n").as("n_users"),
            rx(theta, 6).as("theta"),
            rx(varY, 2).as("var_y"),
            rx(varY * (lit(1.0) - rho2), 2).as("var_y_adj"),
            floor(rho2 * 1000000.0).cast("long").as("var_reduction_ppm"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
          SELECT event_type, user_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc,
                 CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' AS pre
          FROM events),
        per_u AS (
          SELECT event_type, user_id,
                 CAST(sum(CASE WHEN pre THEN xc ELSE 0 END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN pre THEN 0 ELSE xc END) AS BIGINT) AS y
          FROM ev GROUP BY 1, 2),
        st AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 sum(CAST(x AS HUGEINT) * y) AS sxy,
                 sum(CAST(x AS HUGEINT) * x) AS sx2,
                 sum(CAST(y AS HUGEINT) * y) AS sy2
          FROM per_u GROUP BY 1),
        m AS (
          SELECT event_type, n,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
                 CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
                 CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) AS rxy,
                 CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE) AS rx2,
                 CAST(sy2 AS DOUBLE) / CAST(n AS DOUBLE) AS ry2
          FROM st),
        c AS (
          SELECT event_type, n,
                 rx2 - mx * mx AS var_x,
                 ry2 - my * my AS var_y,
                 rxy - mx * my AS cov
          FROM m)
        SELECT event_type, n AS n_users,
               ${rxSql("cov / var_x", 6)} AS theta,
               ${rxSql("var_y", 2)} AS var_y,
               ${rxSql("var_y * (1.0 - cov * cov / (var_x * var_y))", 2)} AS var_y_adj,
               CAST(floor(cov * cov / (var_x * var_y) * 1000000.0) AS BIGINT) AS var_reduction_ppm
        FROM c ORDER BY event_type"""),
    ),

    QDef("agg_mann_whitney",
      // Mann-Whitney U (Wilcoxon rank-sum) per event type — the
      // nonparametric LOCATION test between the half-month samples,
      // completing the family: Welch assumes normal-ish means, KS is
      // sensitive to any shape difference, U asks specifically "does
      // one half stochastically dominate?". Ties (guaranteed — cents
      // quantize) use MIDRANKS computed from per-value cumulative
      // counts; every midrank is an integer or integer+0.5, so the
      // rank-sum is a sum of DYADIC doubles — exact at any fold order
      // below 2^52, no decimal detour needed (and stated, not
      // assumed). The normal approximation carries the full tie
      // correction Σ(t³−t); the z gate is a fixed IEEE tree with 1.96
      // as the only constant. Same scale shape as agg_ks_test: one
      // map-side aggregate to value cells (bounded by the cent
      // domain), one per-type cumsum window.
      (s, dir) => {
        val cells = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("h",
            col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
          .groupBy("event_type", "xc")
          .agg(sum(when(col("h"), 1L).otherwise(0L)).as("c1"),
            sum(when(col("h"), 0L).otherwise(1L)).as("c2"))
          .withColumn("cnt", col("c1") + col("c2"))
        val w = Window.partitionBy("event_type").orderBy("xc")
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranked = cells
          .withColumn("before", coalesce(sum("cnt").over(w), lit(0L)))
          .withColumn("midrank",
            col("before").cast("double") +
              (col("cnt").cast("double") + 1.0) / 2.0)
        val st = ranked.groupBy("event_type").agg(
          sum("c1").as("n1"), sum("c2").as("n2"),
          sum(col("c1").cast("double") * col("midrank")).as("r1"),
          // Σ(t³−t) rides DECIMAL(38,0) ≙ HUGEINT like the power sums
          // above: a single cent cell past ~2.1M rows cubes beyond
          // 2^63, where non-ANSI int64 wraps silently while the oracle
          // raises — the worst mismatch class (wrong vs crash).
          sum(col("cnt").cast("decimal(38,0)") * col("cnt") * col("cnt")
            - col("cnt")).as("tie_t"))
        val n1d = col("n1").cast("double")
        val n2d = col("n2").cast("double")
        val nd = n1d + n2d
        val u1 = col("r1") - n1d * (n1d + 1.0) / 2.0
        val varU = (n1d * n2d / 12.0) *
          ((nd + 1.0) - col("tie_t").cast("double") / (nd * (nd - 1.0)))
        val z = (u1 - n1d * n2d / 2.0) / sqrt(varU)
        st.select(col("event_type"), col("n1"), col("n2"),
            rx(u1, 1).as("u1"), rx(z, 4).as("z"),
            (abs(z) > 1.96).as("reject_h0"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc,
                 CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' AS h
          FROM events),
        cells AS (
          SELECT event_type, xc,
                 CAST(sum(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN h THEN 0 ELSE 1 END) AS BIGINT) AS c2
          FROM ev GROUP BY 1, 2),
        ranked AS (
          SELECT event_type, c1, c2, c1 + c2 AS cnt,
                 CAST(COALESCE(sum(c1 + c2) OVER (PARTITION BY event_type
                   ORDER BY xc ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS DOUBLE) +
                 (CAST(c1 + c2 AS DOUBLE) + 1.0) / 2.0 AS midrank
          FROM cells),
        st AS (
          SELECT event_type,
                 CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c2) AS BIGINT) AS n2,
                 sum(CAST(c1 AS DOUBLE) * midrank) AS r1,
                 sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_t
          FROM ranked GROUP BY 1),
        m AS (
          SELECT event_type, n1, n2,
                 CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
                 CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nd,
                 r1, CAST(tie_t AS DOUBLE) AS td
          FROM st),
        c AS (
          SELECT event_type, n1, n2,
                 r1 - n1d * (n1d + 1.0) / 2.0 AS u1,
                 (r1 - n1d * (n1d + 1.0) / 2.0 - n1d * n2d / 2.0) /
                   sqrt((n1d * n2d / 12.0) *
                        ((nd + 1.0) - td / (nd * (nd - 1.0)))) AS z
          FROM m)
        SELECT event_type, n1, n2,
               ${rxSql("u1", 1)} AS u1, ${rxSql("z", 4)} AS z,
               abs(z) > 1.96 AS reject_h0
        FROM c ORDER BY event_type"""),
    ),

    QDef("agg_anova_f",
      // One-way ANOVA F across order priorities — "does priority shift
      // mean order value?", the k-sample extension of agg_welch_ttest
      // (which only compares two). Sufficient statistics discipline
      // (agg_corr_decimal's): per-group n / Σy / Σy² ride exact
      // DECIMAL through the only corpus-sized aggregate, so the scan
      // is one map-side-combined pass and everything after runs on k=5
      // rows. The between-group sum Σ s_g²/n_g is a sum of DOUBLES
      // over groups whose magnitude (~(Σy)²/n) overflows every
      // integer-grid trick (rx's floor·10⁶ exceeds int64 already at
      // sf0.001) — so it rides the file's OTHER exactness tool: an
      // IN-ORDER fold (aggregate over the pri-sorted k-array ≙ DuckDB
      // list_reduce over list(… ORDER BY pri)), bit-identical in both
      // engines at any magnitude. The final F is a fixed IEEE tree;
      // the rejection gate compares the rx'd F to F(4,∞)'s 95th
      // percentile as a shared literal.
      (s, dir) => {
        val wide = org.apache.spark.sql.types.DecimalType(38, 4)
        val g = t(s, dir, "orders")
          .select(col("o_orderpriority").as("pri"),
            money(col("o_totalprice")).as("y"))
          .groupBy("pri")
          .agg(count(lit(1)).as("n_g"), sum("y").as("sg_dec"),
            sum((col("y") * col("y")).cast(wide)).as("qg_dec"))
          .withColumn("sg", col("sg_dec").cast("double"))
          .withColumn("bterm",
            col("sg") * col("sg") / col("n_g").cast("double"))
        val tot = g.agg(count(lit(1)).as("k"), sum("n_g").as("nn"),
            sum("sg_dec").as("s_dec"), sum("qg_dec").as("q_dec"),
            expr("""aggregate(
              transform(array_sort(collect_list(struct(pri, bterm))),
                x -> x.bterm),
              cast(0.0 as double), (a, x) -> a + x)""").as("bsum"))
          .select(col("k"), col("nn"),
            col("s_dec").cast("double").as("ss"),
            col("q_dec").cast("double").as("qq"), col("bsum"))
        val ssb = col("bsum") - col("ss") * col("ss") / col("nn").cast("double")
        val ssw = col("qq") - col("bsum")
        val f = (ssb / (col("k") - 1).cast("double")) /
          (ssw / (col("nn") - col("k")).cast("double"))
        g.crossJoin(broadcast(tot))
          .select(col("pri"), col("n_g"),
            rx(col("sg") / col("n_g").cast("double"), 6).as("mean_price"),
            (col("k") - 1).as("df_between"),
            (col("nn") - col("k")).as("df_within"),
            rx(f, 4).as("f_stat"),
            (rx(f, 4) > 2.372).as("reject_h0"))
          .orderBy("pri")
      },
      Some(s"""WITH base AS (
          SELECT o_orderpriority AS pri,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS y
          FROM orders),
        g0 AS (SELECT pri, CAST(count(*) AS BIGINT) AS n_g,
                 sum(y) AS sg_dec,
                 sum(CAST(y * y AS DECIMAL(38,4))) AS qg_dec
               FROM base GROUP BY 1),
        g AS (SELECT pri, n_g, sg_dec, qg_dec,
                CAST(sg_dec AS DOUBLE) AS sg,
                CAST(sg_dec AS DOUBLE) * CAST(sg_dec AS DOUBLE) /
                  CAST(n_g AS DOUBLE) AS bterm
              FROM g0),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n_g) AS BIGINT) AS nn,
                 CAST(sum(sg_dec) AS DOUBLE) AS ss,
                 CAST(sum(qg_dec) AS DOUBLE) AS qq,
                 list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                     list(bterm ORDER BY pri)),
                   (a, x) -> a + x) AS bsum
                FROM g),
        m AS (SELECT g.pri, g.n_g, g.sg, tot.k, tot.nn,
                (tot.bsum - tot.ss * tot.ss / CAST(tot.nn AS DOUBLE)) /
                  CAST(tot.k - 1 AS DOUBLE) /
                  ((tot.qq - tot.bsum) / CAST(tot.nn - tot.k AS DOUBLE)) AS f
              FROM g CROSS JOIN tot)
        SELECT pri, n_g,
          ${rxSql("sg / CAST(n_g AS DOUBLE)", 6)} AS mean_price,
          CAST(k - 1 AS BIGINT) AS df_between,
          CAST(nn - k AS BIGINT) AS df_within,
          ${rxSql("f", 4)} AS f_stat,
          ${rxSql("f", 4)} > 2.372 AS reject_h0
        FROM m ORDER BY pri""")),

    QDef("agg_spearman",
      // Spearman rank correlation between event value and event day,
      // per type — the rank-robust companion of agg_ols_trend: "is the
      // metric drifting over time?" without assuming linearity in the
      // VALUES, only in the ranks. Midranks come from per-value-cell
      // cumulative counts (agg_mann_whitney's shape) but DOUBLED so
      // they stay integers: mr2 = 2·before + cnt + 1. Pearson over the
      // doubled ranks equals Spearman (correlation is affine-
      // invariant) and all five sufficient sums ride DECIMAL(38,0) ≙
      // HUGEINT — exact at any corpus size, where raw dyadic-double
      // rank sums quietly lose bits past 2^52. Scale: two cell-sized
      // cumsums (cent/day domains, partitioned by type) + one
      // map-side-combined aggregate over (type, value-cell, day-cell)
      // pairs; the corpus is scanned once.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type").as("et"),
            floor(col("value") * 100 + 0.5).cast("long").as("xc"),
            datediff(col("ts").cast("date"),
              lit("2024-01-01").cast("date")).cast("long").as("yd"))
        def mr2(keyCol: String, out: String) = {
          val w = Window.partitionBy("et").orderBy(keyCol)
            .rowsBetween(Window.unboundedPreceding, -1)
          ev.groupBy("et", keyCol).agg(count(lit(1)).as("cnt"))
            .withColumn("before", coalesce(sum("cnt").over(w), lit(0L)))
            .select(col("et"), col(keyCol),
              (col("before") * 2 + col("cnt") + 1).as(out))
        }
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val st = ev.groupBy("et", "xc", "yd").agg(count(lit(1)).as("pc"))
          .join(mr2("xc", "mx"), Seq("et", "xc"))
          .join(mr2("yd", "my"), Seq("et", "yd"))
          .groupBy("et").agg(
            sum("pc").as("n"),
            sum(col("pc").cast(dec) * col("mx")).as("sx"),
            sum(col("pc").cast(dec) * col("my")).as("sy"),
            sum((col("pc").cast(dec) * col("mx") * col("mx"))).as("sxx"),
            sum((col("pc").cast(dec) * col("my") * col("my"))).as("syy"),
            sum((col("pc").cast(dec) * col("mx") * col("my"))).as("sxy"))
        val nd = col("n").cast("double")
        def d(c: String) = col(c).cast("double")
        st.select(col("et").as("event_type"), col("n").as("n_rows"),
            rx((nd * d("sxy") - d("sx") * d("sy")) /
              (sqrt(nd * d("sxx") - d("sx") * d("sx")) *
                sqrt(nd * d("syy") - d("sy") * d("sy"))), 6)
              .as("spearman_rho"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
          SELECT event_type AS et,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc,
                 date_diff('day', DATE '2024-01-01',
                   CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS yd
          FROM events),
        mx AS (
          SELECT et, xc, 2 * COALESCE(sum(cnt) OVER (PARTITION BY et
              ORDER BY xc ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + cnt + 1 AS mx
          FROM (SELECT et, xc, CAST(count(*) AS BIGINT) AS cnt
                FROM ev GROUP BY 1, 2)),
        my AS (
          SELECT et, yd, 2 * COALESCE(sum(cnt) OVER (PARTITION BY et
              ORDER BY yd ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + cnt + 1 AS my
          FROM (SELECT et, yd, CAST(count(*) AS BIGINT) AS cnt
                FROM ev GROUP BY 1, 2)),
        pairs AS (SELECT et, xc, yd, CAST(count(*) AS BIGINT) AS pc
                  FROM ev GROUP BY 1, 2, 3),
        st AS (
          SELECT p.et, CAST(sum(pc) AS BIGINT) AS n,
                 CAST(sum(CAST(pc AS HUGEINT) * mx) AS DOUBLE) AS sx,
                 CAST(sum(CAST(pc AS HUGEINT) * my) AS DOUBLE) AS sy,
                 CAST(sum(CAST(pc AS HUGEINT) * mx * mx) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(pc AS HUGEINT) * my * my) AS DOUBLE) AS syy,
                 CAST(sum(CAST(pc AS HUGEINT) * mx * my) AS DOUBLE) AS sxy
          FROM pairs p
          JOIN mx ON mx.et = p.et AND mx.xc = p.xc
          JOIN my ON my.et = p.et AND my.yd = p.yd
          GROUP BY 1)
        SELECT et AS event_type, n AS n_rows,
          ${rxSql(
            """(CAST(n AS DOUBLE) * sxy - sx * sy) /
              (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
               sqrt(CAST(n AS DOUBLE) * syy - sy * sy))""", 6)}
            AS spearman_rho
        FROM st ORDER BY event_type""")),

    QDef("agg_cohens_d",
      // Cohen's d effect sizes between every pair of market segments
      // on account balance — the "is the difference LARGE, not just
      // significant" report that accompanies any t-test at corpus
      // scale (with n in the millions everything is significant;
      // effect size is what decides action). One exact-DECIMAL
      // sufficient-statistics pass over customers collapses to k=5
      // rows; the k(k-1)/2 pairing is a self cross join on that tiny
      // aggregate, never on data. Pooled variance and d are fixed IEEE
      // trees on exact inputs, rx(6) before compare.
      (s, dir) => {
        val wide = org.apache.spark.sql.types.DecimalType(38, 4)
        val g = t(s, dir, "customer")
          .select(col("c_mktsegment").as("seg"),
            money(col("c_acctbal")).as("y"))
          .groupBy("seg")
          .agg(count(lit(1)).as("n"),
            sum("y").cast("double").as("sg"),
            sum((col("y") * col("y")).cast(wide)).cast("double").as("qg"))
        def v(n: org.apache.spark.sql.Column, sg: org.apache.spark.sql.Column,
            qg: org.apache.spark.sql.Column) =
          (qg - sg * sg / n) / (n - 1.0)
        val a = g.select(col("seg").as("seg_a"), col("n").as("n_a"),
          col("sg").as("s_a"), col("qg").as("q_a"))
        val b = g.select(col("seg").as("seg_b"), col("n").as("n_b"),
          col("sg").as("s_b"), col("qg").as("q_b"))
        val na = col("n_a").cast("double")
        val nb = col("n_b").cast("double")
        val s2p = ((na - 1.0) * v(na, col("s_a"), col("q_a")) +
          (nb - 1.0) * v(nb, col("s_b"), col("q_b"))) / (na + nb - 2.0)
        a.crossJoin(b).filter(col("seg_a") < col("seg_b"))
          .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
            rx(col("s_a") / na, 6).as("mean_a"),
            rx(col("s_b") / nb, 6).as("mean_b"),
            rx((col("s_a") / na - col("s_b") / nb) / sqrt(s2p), 6)
              .as("cohens_d"))
          .orderBy("seg_a", "seg_b")
      },
      Some(s"""WITH base AS (
          SELECT c_mktsegment AS seg, CAST(c_acctbal AS DECIMAL(18,2)) AS y
          FROM customer),
        g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(y) AS DOUBLE) AS sg,
                CAST(sum(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE) AS qg
              FROM base GROUP BY 1),
        p AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
                a.n AS n_a, b.n AS n_b,
                CAST(a.n AS DOUBLE) AS na, CAST(b.n AS DOUBLE) AS nb,
                a.sg AS s_a, b.sg AS s_b, a.qg AS q_a, b.qg AS q_b
              FROM g a CROSS JOIN g b WHERE a.seg < b.seg)
        SELECT seg_a, seg_b, n_a, n_b,
          ${rxSql("s_a / na", 6)} AS mean_a,
          ${rxSql("s_b / nb", 6)} AS mean_b,
          ${rxSql(
            """(s_a / na - s_b / nb) /
              sqrt(((na - 1.0) * ((q_a - s_a * s_a / na) / (na - 1.0)) +
                    (nb - 1.0) * ((q_b - s_b * s_b / nb) / (nb - 1.0))) /
                   (na + nb - 2.0))""", 6)} AS cohens_d
        FROM p ORDER BY seg_a, seg_b""")),

    QDef("agg_kendall_tau",
      // Kendall's τ-b between order date and order value, per
      // priority, on a BOUNDED audit sample — the concordance view of
      // the same drift question agg_spearman answers in ranks.
      // Kendall is inherently pairwise (O(n²) naively, O(n log n) with
      // a merge-count); here it runs as the bounded-audit pattern the
      // dedup calibration queries use: the first 200 orders per group
      // by key (a partitioned-window top-N — fixed work per group at
      // ANY corpus size), then the ≤19,900 intra-group pairs. All
      // concordance/discordance/tie counts are integers; τ-b's tie
      // correction uses pair counts directly (n1 = tied-x pairs, n2 =
      // tied-y pairs), and only the final ratio runs in doubles.
      (s, dir) => {
        val base = t(s, dir, "orders")
          .select(col("o_orderpriority").as("pri"),
            col("o_orderkey").as("k"),
            datediff(col("o_orderdate").cast("date"),
              lit("1992-01-01").cast("date")).cast("long").as("x"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("y"))
        val w = Window.partitionBy("pri").orderBy("k")
        val samp = base.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 200).drop("rn")
        val pr = samp.as("a").join(samp.as("b"),
          col("a.pri") === col("b.pri") && col("a.k") < col("b.k"))
        val dx = col("a.x") - col("b.x")
        val dy = col("a.y") - col("b.y")
        val st = pr.groupBy(col("a.pri").as("pri")).agg(
          count(lit(1)).as("n0"),
          sum(when(dx * dy > 0, 1L).otherwise(0L)).as("n_c"),
          sum(when(dx * dy < 0, 1L).otherwise(0L)).as("n_d"),
          sum(when(dx === 0, 1L).otherwise(0L)).as("t_x"),
          sum(when(dy === 0, 1L).otherwise(0L)).as("t_y"))
        st.select(col("pri"), col("n0"), col("n_c"), col("n_d"),
            rx((col("n_c") - col("n_d")).cast("double") /
              sqrt((col("n0") - col("t_x")).cast("double") *
                (col("n0") - col("t_y")).cast("double")), 6).as("tau_b"))
          .orderBy("pri")
      },
      Some(s"""WITH base AS (
          SELECT o_orderpriority AS pri, o_orderkey AS k,
                 date_diff('day', DATE '1992-01-01',
                   CAST(o_orderdate AS DATE)) AS x,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
          FROM orders),
        samp AS (SELECT pri, k, x, y FROM (
            SELECT *, row_number() OVER (PARTITION BY pri ORDER BY k) AS rn
            FROM base) WHERE rn <= 200),
        pr AS (SELECT a.pri, a.x - b.x AS dx, a.y - b.y AS dy
               FROM samp a JOIN samp b ON a.pri = b.pri AND a.k < b.k),
        st AS (SELECT pri, CAST(count(*) AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
                 CAST(sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
                 CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_x,
                 CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_y
               FROM pr GROUP BY 1)
        SELECT pri, n0, n_c, n_d,
          ${rxSql(
            """CAST(n_c - n_d AS DOUBLE) /
              sqrt(CAST(n0 - t_x AS DOUBLE) * CAST(n0 - t_y AS DOUBLE))""",
            6)} AS tau_b
        FROM st ORDER BY pri""")),

    QDef("profile_freshness_lag",
      // Per-source freshness monitoring — the first page of any
      // ingestion dashboard: how far behind the newest data is each
      // event type, in seconds, against the newest event anywhere.
      // Exact integer end-to-end: timestamps compare as epoch MICROS
      // (unix_micros ≙ epoch_us — no double epoch()), the lag is one
      // bigint subtraction, and the SLA gate is an integer compare.
      // One map-side-combined max per type + one broadcast scalar
      // attach; the corpus is scanned once and nothing else scales.
      (s, dir) => {
        val perType = t(s, dir, "events")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            max(unix_micros(col("ts"))).as("last_us"))
        val gmax = perType.agg(max("last_us").as("g_us"))
        perType.crossJoin(broadcast(gmax))
          .select(col("event_type"), col("n_events"), col("last_us"),
            expr("(g_us - last_us) div 1000000").as("lag_sec"),
            (col("g_us") - col("last_us") <= 3600L * 1000000L)
              .as("within_sla"))
          .orderBy("event_type")
      },
      Some("""WITH pt AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS last_us
          FROM events GROUP BY 1),
        g AS (SELECT max(last_us) AS g_us FROM pt)
        SELECT event_type, n_events, last_us,
               CAST((g_us - last_us) // 1000000 AS BIGINT) AS lag_sec,
               g_us - last_us <= 3600000000 AS within_sla
        FROM pt CROSS JOIN g ORDER BY event_type"""),
    ),

    QDef("profile_fk_inference",
      // Foreign-key DISCOVERY by containment profiling — the schema-
      // inference pass a catalog tool runs over an undocumented lake:
      // for each candidate (child column → parent column) pair, what
      // fraction of the child's distinct values exists in the parent?
      // Containment ≈ 1 infers an FK; the candidate list deliberately
      // includes a WRONG pair (supplier nationkey → part partkey) so
      // the rejection arm is live — an inferrer that can only say
      // "yes" catches nothing (first attempt used supplier nationkey →
      // part partkey, which is fully CONTAINED — 25 small ints subset
      // any dense key range; the probe must leave the parent's
      // domain). Distinct from pipeline_contract_check:
      // that VERIFIES declared contracts, this DISCOVERS undeclared
      // ones. Per pair: one distinct on the child key + one left semi
      // join against the parent key — never a row-level join; cost is
      // distinct-key-sized per candidate.
      (s, dir) => {
        def cand(name: String, child: org.apache.spark.sql.DataFrame,
            childCol: String, parent: org.apache.spark.sql.DataFrame,
            parentCol: String) = {
          // One left join + one conditional aggregate per candidate:
          // the parent key set is distinct, so the left join emits
          // exactly one row per distinct child key (count(*) =
          // n_child) and a non-null parent key marks containment —
          // the old ck.agg + semi-join pair scanned and distinct'd
          // the fact-sized child column TWICE per candidate (r18:
          // ~7 -> ~3 exchanges per candidate, and the join reuses
          // both distincts' hash partitioning).
          val ck = child.select(col(childCol).as("k")).distinct()
          val pk = parent.select(col(parentCol).as("__pk")).distinct()
          ck.join(pk, col("k") === col("__pk"), "left")
            .agg(count(lit(1)).as("n_child"),
              sum(when(col("__pk").isNotNull, 1L).otherwise(0L))
                .as("n_contained"))
            .select(lit(name).as("candidate"), col("n_child"),
              col("n_contained"),
              expr("(n_contained * 1000000) div n_child").as("containment_ppm"),
              (col("n_contained") * 1000L >= col("n_child") * 999L)
                .as("inferred_fk"))
        }
        val li = t(s, dir, "lineitem")
        cand("lineitem.l_orderkey->orders.o_orderkey",
            li, "l_orderkey", t(s, dir, "orders"), "o_orderkey")
          .unionAll(cand("lineitem.l_partkey->part.p_partkey",
            li, "l_partkey", t(s, dir, "part"), "p_partkey"))
          .unionAll(cand("orders.o_custkey->customer.c_custkey",
            t(s, dir, "orders"), "o_custkey",
            t(s, dir, "customer"), "c_custkey"))
          .unionAll(cand("customer.c_nationkey->nation.n_nationkey",
            t(s, dir, "customer"), "c_nationkey",
            t(s, dir, "nation"), "n_nationkey"))
          .unionAll(cand("part.p_partkey->nation.n_nationkey",
            t(s, dir, "part"), "p_partkey",
            t(s, dir, "nation"), "n_nationkey"))
          .unionAll(cand("lineitem.l_suppkey->nation.n_nationkey",
            li, "l_suppkey", t(s, dir, "nation"), "n_nationkey"))
          .orderBy("candidate")
      }, {
        def c(name: String, ct: String, cc: String, pt: String, pc: String) =
          s"""SELECT '$name' AS candidate,
               (SELECT count(DISTINCT $cc) FROM $ct) AS n_child,
               (SELECT count(*) FROM (SELECT DISTINCT $cc AS k FROM $ct)
                WHERE k IN (SELECT $pc FROM $pt)) AS n_contained"""
        Some(s"""WITH rows_ AS (
            ${c("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey")}
            UNION ALL
            ${c("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey")}
            UNION ALL
            ${c("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey")}
            UNION ALL
            ${c("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey")}
            UNION ALL
            ${c("part.p_partkey->nation.n_nationkey", "part", "p_partkey", "nation", "n_nationkey")}
            UNION ALL
            ${c("lineitem.l_suppkey->nation.n_nationkey", "lineitem", "l_suppkey", "nation", "n_nationkey")})
          SELECT candidate, CAST(n_child AS BIGINT) AS n_child,
                 CAST(n_contained AS BIGINT) AS n_contained,
                 CAST((n_contained * 1000000) // n_child AS BIGINT) AS containment_ppm,
                 n_contained * 1000 >= n_child * 999 AS inferred_fk
          FROM rows_ ORDER BY candidate""")
      }),

    QDef("profile_pk_inference",
      // Primary-key DISCOVERY — profile_fk_inference's other half:
      // which columns are unique enough to BE keys? Per candidate
      // column: row count, distinct count, uniqueness in integer ppm,
      // and the inference verdict (exactly distinct == rows — a key is
      // unique, not 99.9% unique). The candidate list mixes true keys
      // (event_id, o_orderkey, doc_id, vec_id) with high-cardinality
      // NON-keys (l_orderkey repeats per line, user_id repeats per
      // event) so the rejection arm is live. Each candidate is one
      // count + count-distinct aggregate over its own table — the
      // exact uniqueness check a catalog runs before trusting a merge
      // key; at 100 TB the approx variant (HLL) prefilters and this
      // exact pass confirms survivors.
      (s, dir) => {
        def cand(name: String, df: org.apache.spark.sql.DataFrame,
            c: String) =
          df.agg(count(lit(1)).as("n_rows"),
            countDistinct(col(c)).as("n_distinct"))
            .select(lit(name).as("candidate"), col("n_rows"),
              col("n_distinct"),
              expr("(n_distinct * 1000000) div n_rows").as("uniqueness_ppm"),
              (col("n_distinct") === col("n_rows")).as("inferred_pk"))
        cand("documents.doc_id", t(s, dir, "documents"), "doc_id")
          .unionAll(cand("embeddings.vec_id", t(s, dir, "embeddings"), "vec_id"))
          .unionAll(cand("events.event_id", t(s, dir, "events"), "event_id"))
          .unionAll(cand("events.user_id", t(s, dir, "events"), "user_id"))
          .unionAll(cand("lineitem.l_orderkey", t(s, dir, "lineitem"), "l_orderkey"))
          .unionAll(cand("orders.o_orderkey", t(s, dir, "orders"), "o_orderkey"))
          .orderBy("candidate")
      }, {
        def c(name: String, tb: String, cc: String) =
          s"""SELECT '$name' AS candidate,
               (SELECT count(*) FROM $tb) AS n_rows,
               (SELECT count(DISTINCT $cc) FROM $tb) AS n_distinct"""
        Some(s"""WITH rows_ AS (
            ${c("documents.doc_id", "documents", "doc_id")}
            UNION ALL
            ${c("embeddings.vec_id", "embeddings", "vec_id")}
            UNION ALL
            ${c("events.event_id", "events", "event_id")}
            UNION ALL
            ${c("events.user_id", "events", "user_id")}
            UNION ALL
            ${c("lineitem.l_orderkey", "lineitem", "l_orderkey")}
            UNION ALL
            ${c("orders.o_orderkey", "orders", "o_orderkey")})
          SELECT candidate, CAST(n_rows AS BIGINT) AS n_rows,
                 CAST(n_distinct AS BIGINT) AS n_distinct,
                 CAST((n_distinct * 1000000) // n_rows AS BIGINT) AS uniqueness_ppm,
                 n_distinct = n_rows AS inferred_pk
          FROM rows_ ORDER BY candidate""")
      }),

    QDef("agg_winsorized_mean",
      // Winsorized mean per event type — the robust central tendency a
      // metrics platform reports when a few whale values would swing
      // the plain mean: values are CLAMPED (not dropped — that would be
      // trimming) to the exact positional p5/p95 cent values, then
      // averaged. Everything is deterministic integer work: ranks under
      // a (value, event_id) total order, the clip bounds are the cents
      // AT positions ⌈0.05n⌉/⌈0.95n⌉ (ceil in integer arithmetic),
      // clamping is min/max on int64, and the mean divides an exact
      // DECIMAL sum — no percentile interpolation, no FP threshold.
      // Two window passes over the per-type partitioning plus one
      // aggregate; reports both means and the clipped-row count so the
      // robustness delta is visible.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
        val w = Window.partitionBy("event_type").orderBy("xc", "event_id")
        val ranked = ev.withColumn("rk", row_number().over(w).cast("long"))
        val tot = ranked.groupBy("event_type").agg(count(lit(1)).as("n"))
        val withK = ranked.join(tot, "event_type")
          .withColumn("klo", greatest(lit(1L), expr("(n * 5 + 99) div 100")))
          .withColumn("khi", expr("(n * 95 + 99) div 100"))
        val bounds = withK.groupBy("event_type", "n")
          .agg(max(when(col("rk") === col("klo"), col("xc"))).as("lo"),
            max(when(col("rk") === col("khi"), col("xc"))).as("hi"))
        withK.join(bounds.drop("n"), "event_type")
          .withColumn("wx", greatest(col("lo"), least(col("hi"), col("xc"))))
          .groupBy("event_type", "n", "lo", "hi")
          .agg(sum(col("xc").cast("decimal(38,0)")).as("sraw"),
            sum(col("wx").cast("decimal(38,0)")).as("swin"),
            sum(when(col("wx") =!= col("xc"), 1L).otherwise(0L)).as("n_clipped"))
          .select(col("event_type"), col("n"), col("lo").as("p5_cents"),
            col("hi").as("p95_cents"), col("n_clipped"),
            rx(col("sraw").cast("double") / col("n").cast("double") / 100.0, 4)
              .as("mean_raw"),
            rx(col("swin").cast("double") / col("n").cast("double") / 100.0, 4)
              .as("mean_winsorized"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
          SELECT event_type, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc
          FROM events),
        ranked AS (
          SELECT event_type, xc,
                 CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY xc, event_id) AS BIGINT) AS rk,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
          FROM ev),
        bounds AS (
          SELECT event_type, n,
                 max(CASE WHEN rk = greatest(1, (n * 5 + 99) // 100)
                          THEN xc END) AS lo,
                 max(CASE WHEN rk = (n * 95 + 99) // 100 THEN xc END) AS hi
          FROM ranked GROUP BY 1, 2),
        clipped AS (
          SELECT r.event_type, b.n, b.lo, b.hi, r.xc,
                 greatest(b.lo, least(b.hi, r.xc)) AS wx
          FROM ranked r JOIN bounds b ON b.event_type = r.event_type)
        SELECT event_type, n, CAST(lo AS BIGINT) AS p5_cents,
               CAST(hi AS BIGINT) AS p95_cents,
               CAST(sum(CASE WHEN wx <> xc THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
               ${rxSql("CAST(sum(CAST(xc AS HUGEINT)) AS DOUBLE) / CAST(n AS DOUBLE) / 100.0", 4)} AS mean_raw,
               ${rxSql("CAST(sum(CAST(wx AS HUGEINT)) AS DOUBLE) / CAST(n AS DOUBLE) / 100.0", 4)} AS mean_winsorized
        FROM clipped GROUP BY 1, 2, 3, 4 ORDER BY event_type"""),
    ),

    QDef("win_bollinger_bands", {
      // Bollinger-band anomaly monitor: each reading against the
      // trailing-20 rolling mean ± 2σ of its event type. Both window
      // sums (Σcents, Σcents²) are exact int64 over a ROWS frame, and
      // the ALERT DECISION is pure integer algebra — |x−S/n| > 2σ
      // rewritten as (n·x − S)² > 4·(n·Q − S²) — so the flag needs no
      // rounding guard at all; only the DISPLAYED mean/σ are IEEE (and
      // rx-rounded). The rolling version of agg_zscore_standardize's
      // global standardization: two window aggregates per row, one
      // shuffle on the type key, embarrassingly parallel per type.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type")
          .orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
        t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sc", sum("xc").over(w))
          .withColumn("qc", sum(col("xc") * col("xc")).over(w))
          .select(col("event_id"), col("event_type"), col("value"),
            col("n"),
            rx(col("sc").cast("double") / col("n").cast("double") / 100.0, 4)
              .as("roll_mean"),
            rx(sqrt((col("n") * col("qc") - col("sc") * col("sc")).cast("double") /
              (col("n") * col("n")).cast("double")) / 100.0, 4).as("roll_sigma"),
            ((col("n") * col("xc") - col("sc")) * (col("n") * col("xc") - col("sc")) >
              lit(4L) * (col("n") * col("qc") - col("sc") * col("sc")))
              .as("alert"))
          .orderBy("event_id")
      }
    }, Some(s"""WITH ev AS (
          SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc
          FROM events),
        r AS (
          SELECT event_id, event_type, value, xc,
            count(*) OVER w AS n,
            CAST(sum(xc) OVER w AS BIGINT) AS sc,
            CAST(sum(xc * xc) OVER w AS BIGINT) AS qc
          FROM ev
          WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        SELECT event_id, event_type, value, n,
               ${rxSql("CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0", 4)} AS roll_mean,
               ${rxSql("sqrt(CAST(n * qc - sc * sc AS DOUBLE) / CAST(n * n AS DOUBLE)) / 100.0", 4)} AS roll_sigma,
               (n * xc - sc) * (n * xc - sc) > 4 * (n * qc - sc * sc) AS alert
        FROM r ORDER BY event_id""")),

    QDef("agg_gini_inequality",
      // Gini coefficient of the value distribution per event type —
      // the inequality scalar a data-balance monitor tracks next to
      // the HHI (concentration over CATEGORIES) — from the rank
      // formula G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over
      // ascending-sorted exact cents: one rank window + one aggregate,
      // ALL integer until the final basis-point floor-division, so the
      // result is hash-exact with no FP anywhere. Ties share a value,
      // so rank assignment among them cannot change Σi·xᵢ — the
      // event_id tie-break is for determinism of the window, not the
      // result. (int64 holds 2e4·Σi·xᵢ here; past ~sf1 the same
      // sums ride DECIMAL(38,0).)
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type")
          .orderBy(col("xc"), col("event_id"))
        t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("i", row_number().over(w).cast("long"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("xc").as("s"),
            sum(col("i") * col("xc")).as("a"))
          .select(col("event_type"), col("n"),
            (col("s").cast("double") / 100.0).as("total_value"),
            expr("((2 * a - (n + 1) * s) * 10000) div (n * s)").as("gini_bp"))
          .orderBy("event_type")
      },
      Some("""WITH r AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc,
                 CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT), event_id)
                   AS BIGINT) AS i
          FROM events),
        st AS (
          SELECT event_type, count(*) AS n, CAST(sum(xc) AS BIGINT) AS s,
                 CAST(sum(i * xc) AS BIGINT) AS a
          FROM r GROUP BY 1)
        SELECT event_type, n, CAST(s AS DOUBLE) / 100.0 AS total_value,
               CAST(((2 * a - (n + 1) * s) * 10000) // (n * s) AS BIGINT) AS gini_bp
        FROM st ORDER BY event_type"""),
    ),

    QDef("win_cusum_alert",
      // CUSUM changepoint monitor over each event_type's value stream,
      // entirely in exact integer cents. The one-sided CUSUM recursion
      // S_i = max(0, S_{i-1} + d_i) is not a window sum — but its
      // closed form IS: S_i = C_i - min(0, min_{j<=i} C_j) with C the
      // running sum of deviations, so two stock window frames replace
      // the sequential recursion and the monitor parallelizes per
      // partition (the reformulation that makes CUSUM runnable as a
      // Spark window at all). Deviations are measured against a
      // calibration-week mean set 20% low, so S trends upward and the
      // alert arm (top quartile of each type's peak) is structurally
      // live at every SF.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .filter(pmod(col("user_id"), lit(3L)) === 0)
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
        val cal = ev.filter(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"))
          .groupBy("event_type")
          .agg(sum("xc").as("sx"), count(lit(1)).as("cnt"))
          // `div`, not `/`: Column `/` on longs is double division, and
          // truncating its correctly-rounded result can land one above
          // the exact integer quotient.
          .select(col("event_type"), expr("(sx * 8) div (cnt * 10)").as("target"))
        val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        val wAll = Window.partitionBy("event_type")
        ev.join(broadcast(cal), "event_type")
          .withColumn("c", sum(col("xc") - col("target")).over(w))
          .withColumn("s",
            col("c") - least(lit(0L), min("c").over(w)))
          .withColumn("peak", max("s").over(wAll))
          .select(col("event_id"), col("event_type"), col("value"),
            col("s").as("cusum_cents"),
            (col("s") > col("peak") / 4L).as("alert"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
          SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc
          FROM events WHERE user_id % 3 = 0),
        cal AS (
          SELECT event_type, CAST((sum(xc) * 8) // (count(*) * 10) AS BIGINT) AS target
          FROM ev WHERE ts < TIMESTAMP '2024-01-08 00:00:00' GROUP BY 1),
        c AS (
          SELECT e.event_id, e.event_type, e.value, e.ts,
                 sum(e.xc - cal.target) OVER (PARTITION BY e.event_type ORDER BY e.ts, e.event_id) AS c
          FROM ev e JOIN cal USING (event_type)),
        sgl AS (
          SELECT event_id, event_type, value,
                 c - least(0, min(c) OVER (PARTITION BY event_type ORDER BY ts, event_id)) AS s
          FROM c)
        SELECT event_id, event_type, value, CAST(s AS BIGINT) AS cusum_cents,
               s > CAST(max(s) OVER (PARTITION BY event_type) AS BIGINT) // 4 AS alert
        FROM sgl ORDER BY event_id"""),
    ),

    QDef("win_interpolate_linear",
      // Linear interpolation of missing days in each user's daily mean
      // series — the time-series repair step between gap detection
      // (win_gap_fill) and any windowed model. Neighbors come from two
      // IGNORE NULLS window scans (last non-null before, first after);
      // the interpolated value is exact integer arithmetic in cents —
      // as sign × magnitude-div, because the slope numerator (nv − pv)
      // goes NEGATIVE on declining series and Spark's `div` truncates
      // toward zero while DuckDB's `//` floors (the zipf/cohens_kappa
      // divergence class: every negative non-exact quotient differs by
      // 1; a nonnegative numerator makes the semantics coincide) —
      // so edge rows fall back to nearest-neighbor and every emitted
      // value hash-compares. At 100 TB: the spine is users x days,
      // windows partition per user — no shuffle beyond the daily
      // aggregate's.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .filter(pmod(col("user_id"), lit(4L)) === 0)
          .withColumn("d", to_date(col("ts")))
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
        val span = ev.agg(min("d").as("d0"), max("d").as("d1"))
        val daily = ev.groupBy("user_id", "d")
          .agg(expr("sum(xc) div count(1)").as("vc"))
        val w = Window.partitionBy("user_id").orderBy("d")
        val grid = ev.select("user_id").distinct()
          .crossJoin(span)
          .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("d"))
          .join(daily, Seq("user_id", "d"), "left")
          .withColumn("pv", last("vc", ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("pd", last(when(col("vc").isNotNull, col("d")), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("nv", first("vc", ignoreNulls = true)
            .over(w.rowsBetween(0, Window.unboundedFollowing)))
          .withColumn("nd", first(when(col("vc").isNotNull, col("d")), ignoreNulls = true)
            .over(w.rowsBetween(0, Window.unboundedFollowing)))
        grid.select(col("user_id"), col("d"), col("vc").isNull.as("interpolated"),
          when(col("vc").isNotNull, col("vc"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + expr(
                """CAST(sign(nv - pv) AS BIGINT) *
                   ((abs(nv - pv) * datediff(d, pd)) div datediff(nd, pd))"""))
            .when(col("pv").isNotNull, col("pv"))
            .otherwise(col("nv")).as("vc_filled"))
          .withColumn("v_filled", col("vc_filled").cast("double") / 100.0)
          .orderBy("user_id", "d")
      },
      Some("""WITH ev AS (
          SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc
          FROM events WHERE user_id % 4 = 0),
        span AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
        daily AS (
          SELECT user_id, d, CAST(sum(xc) // count(*) AS BIGINT) AS vc
          FROM ev GROUP BY 1, 2),
        spine AS (
          SELECT u.user_id,
                 CAST(unnest(generate_series(CAST(s.d0 AS TIMESTAMP), CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
          FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN span s),
        g AS (
          SELECT s.user_id, s.d, dl.vc,
            last_value(dl.vc IGNORE NULLS) OVER
              (PARTITION BY s.user_id ORDER BY s.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
            last_value(CASE WHEN dl.vc IS NOT NULL THEN s.d END IGNORE NULLS) OVER
              (PARTITION BY s.user_id ORDER BY s.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
            first_value(dl.vc IGNORE NULLS) OVER
              (PARTITION BY s.user_id ORDER BY s.d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
            first_value(CASE WHEN dl.vc IS NOT NULL THEN s.d END IGNORE NULLS) OVER
              (PARTITION BY s.user_id ORDER BY s.d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
          FROM spine s LEFT JOIN daily dl ON dl.user_id = s.user_id AND dl.d = s.d)
        SELECT user_id, d, vc IS NULL AS interpolated,
               CAST(CASE WHEN vc IS NOT NULL THEN vc
                    WHEN pv IS NOT NULL AND nv IS NOT NULL
                      THEN pv + CAST(sign(nv - pv) AS BIGINT) * ((abs(nv - pv) * datediff('day', pd, d)) // datediff('day', pd, nd))
                    WHEN pv IS NOT NULL THEN pv ELSE nv END AS BIGINT) AS vc_filled,
               CAST(CASE WHEN vc IS NOT NULL THEN vc
                    WHEN pv IS NOT NULL AND nv IS NOT NULL
                      THEN pv + CAST(sign(nv - pv) AS BIGINT) * ((abs(nv - pv) * datediff('day', pd, d)) // datediff('day', pd, nd))
                    WHEN pv IS NOT NULL THEN pv ELSE nv END AS DOUBLE) / 100.0 AS v_filled
        FROM g ORDER BY user_id, d"""),
    ),

    QDef("pipeline_partial_agg_merge",
      // Incremental view maintenance with ALGEBRAIC aggregate state:
      // yesterday's per-(type, day) partials (sum_cents, n) merge with
      // today's delta rows by ADDING STATES — the base data is never
      // rescanned, which is the entire economics of a daily metric at
      // 100 TB (the batch analog of streaming state, and exactly why
      // avg must travel as sum+count, never as avg). The cut is noon
      // mid-corpus so the straddling day exercises a true merge (both
      // arms contribute to one key) at every SF. Output proves state
      // merge == recompute: final avg from merged partials.
      (s, dir) => {
        val cut = lit("2024-01-16 12:00:00").cast("timestamp")
        val ev = t(s, dir, "events")
          .withColumn("day", to_date(col("ts")))
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("event_type", "day")
            .agg(sum("xc").as("sum_c"), count(lit(1)).as("n"))
        val base = partial(ev.filter(col("ts") < cut))
        val delta = partial(ev.filter(col("ts") >= cut))
        base.unionByName(delta)
          .groupBy("event_type", "day")
          .agg(sum("sum_c").as("sum_c"), sum("n").as("n"))
          .select(col("event_type"), col("day"), col("sum_c"), col("n"),
            (col("sum_c").cast("double") / col("n").cast("double") / 100.0)
              .as("avg_v"))
          .orderBy("event_type", "day")
      },
      Some("""WITH ev AS (
          SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc,
                 CAST(ts AS TIMESTAMP) AS t
          FROM events),
        base AS (
          SELECT event_type, day, sum(xc) AS sum_c, count(*) AS n FROM ev
          WHERE t < TIMESTAMP '2024-01-16 12:00:00' GROUP BY 1, 2),
        delta AS (
          SELECT event_type, day, sum(xc) AS sum_c, count(*) AS n FROM ev
          WHERE t >= TIMESTAMP '2024-01-16 12:00:00' GROUP BY 1, 2),
        u AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
        SELECT event_type, day, CAST(sum(sum_c) AS BIGINT) AS sum_c,
               CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(sum_c) AS DOUBLE) / CAST(sum(n) AS DOUBLE) / 100.0 AS avg_v
        FROM u GROUP BY 1, 2 ORDER BY 1, 2"""),
    ),

    QDef("join_temporal_scd2",
      // Point-in-interval consumption of an SCD2 dimension — the query
      // every versioned-dim warehouse runs: each purchase resolves the
      // signup version active AT ITS TIMESTAMP (half-open validity, so
      // boundary instants match exactly one version). The SCALABLE plan
      // is the equi-join on the entity key with the interval predicate
      // as a join filter — co-partitions on user_id (versions per user
      // are few), NOT a broadcast range join (the dim grows with the
      // data) and NOT a BNL. Pre-signup purchases keep the left arm
      // live with version 0.
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val dim = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("valid_from"), col("event_id"))
          .withColumn("version", row_number().over(
            Window.partitionBy("user_id").orderBy("valid_from", "event_id"))
            .cast("long"))
          .withColumn("valid_to",
            lead("valid_from", 1).over(
              Window.partitionBy("user_id").orderBy("valid_from", "event_id")))
        val fact = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        fact.join(dim,
            fact("user_id") === dim("user_id") &&
              fact("ts") >= dim("valid_from") &&
              (dim("valid_to").isNull || fact("ts") < dim("valid_to")),
            "left")
          .select(fact("event_id"), fact("user_id"), fact("value"),
            coalesce(col("version"), lit(0L)).as("version"),
            coalesce(datediff(to_date(fact("ts")), to_date(col("valid_from"))),
              lit(-1)).cast("long").as("days_since_signup"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
          SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
          FROM events),
        dim AS (
          SELECT user_id, ts AS valid_from,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
                 lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
          FROM ev WHERE event_type = 'signup'),
        fact AS (
          SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase')
        SELECT f.event_id, f.user_id, f.value,
               CAST(COALESCE(d.version, 0) AS BIGINT) AS version,
               CAST(COALESCE(datediff('day', CAST(d.valid_from AS DATE), CAST(f.ts AS DATE)), -1) AS BIGINT)
                 AS days_since_signup
        FROM fact f LEFT JOIN dim d
          ON d.user_id = f.user_id AND f.ts >= d.valid_from
             AND (d.valid_to IS NULL OR f.ts < d.valid_to)
        ORDER BY f.event_id"""),
    ),

    QDef("win_rolling_distinct",
      // Trailing-7-day DISTINCT users per event_type — the windowed
      // distinct no window frame can compute (distinct does not
      // decompose over sliding frames). The scalable rewrite: each
      // distinct (type, user, day) activity CONTRIBUTES itself to the
      // 7 window endpoints it falls inside (a bounded x7 explode —
      // cost is multiplier x distinct activity, independent of raw
      // event volume), then one count-distinct per (type, endpoint).
      // The naive per-day self-join over the trailing week shuffles
      // the fact 7 times; this shuffles the (already tiny) distinct
      // activity set once.
      (s, dir) => {
        val acts = t(s, dir, "events")
          .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val span = acts.agg(max("day").as("d1"))
        acts.crossJoin(span)
          .select(col("event_type"), col("user_id"),
            explode(sequence(col("day"),
              least(date_add(col("day"), 6), col("d1")))).as("d"))
          .groupBy("event_type", "d")
          .agg(countDistinct("user_id").as("u7"))
          .orderBy("event_type", "d")
      },
      Some("""WITH acts AS (
          SELECT DISTINCT event_type, user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
          FROM events),
        span AS (SELECT max(day) AS d1 FROM acts),
        contrib AS (
          SELECT a.event_type, a.user_id,
                 CAST(unnest(generate_series(CAST(a.day AS TIMESTAMP),
                   CAST(least(a.day + 6, s.d1) AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
          FROM acts a CROSS JOIN span s)
        SELECT event_type, d, count(DISTINCT user_id) AS u7
        FROM contrib GROUP BY 1, 2 ORDER BY 1, 2"""),
    ),

    QDef("profile_content_digest",
      // Content-addressed dataset versioning: per-source row count +
      // ORDER-FREE content digest (sum of row fingerprints mod 2^31 —
      // commutative, so any shuffle/partitioning yields the same
      // digest, which is the whole trick; a concat-then-hash digest
      // would need a total sort first). The regression check every
      // pipeline re-run wants: same digest = bit-identical content,
      // no row-by-row diff. Per-group row counts here stay far under
      // the int64 headroom; a 100 TB run aggregates the same mod-2^31
      // terms through DECIMAL(38,0) instead.
      (s, dir) => {
        t(s, dir, "documents")
          .select(col("source"),
            pmod(Text.md5Hash32(concat_ws("\u0001",
              col("doc_id").cast("string"), col("text"), col("lang"))),
              lit(2147483648L)).as("h"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_rows"),
            pmod(sum("h"), lit(2147483648L)).as("content_digest"))
          .orderBy("source")
      },
      Some("""WITH h AS (
          SELECT source,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(1) || text || chr(1) || lang), 1, 8)) AS BIGINT) % 2147483648 AS h
          FROM documents)
        SELECT source, count(*) AS n_rows,
               CAST(sum(h) % 2147483648 AS BIGINT) AS content_digest
        FROM h GROUP BY source ORDER BY source"""),
    ),

    QDef("join_interval_overlap",
      // Interval x interval overlap join — the shape point-in-interval
      // (join_temporal_scd2) cannot cover: user activity sessions vs
      // overlapping 5-day campaign windows. The scalable plan is DAY
      // BINNING: each interval explodes to the days it touches, the
      // join is an equi-join on the bin, and the exact overlap
      // predicate verifies each binned candidate once (distinct) — no
      // BNL, no theta join, cost = interval-days + bin-local pairs.
      // Overlap is reported in exact epoch minutes.
      (s, dir) => {
        val wUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = t(s, dir, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(wUser))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) >= 3600000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id",
            sum(col("new_sess")).over(wUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(min("ts").as("s_start"), max("ts").as("s_end"))
        val camp = t(s, dir, "events").agg(to_date(min("ts")).as("d0"))
          .select(explode(sequence(lit(0L), lit(4L))).as("campaign_id"), col("d0"))
          .select(col("campaign_id"),
            date_add(col("d0"), (col("campaign_id") * 7).cast("int"))
              .cast("timestamp").as("c_start"),
            date_add(col("d0"), (col("campaign_id") * 7 + 5).cast("int"))
              .cast("timestamp").as("c_end"))
        val sessDays = sess.select(col("user_id"), col("session_id"),
          col("s_start"), col("s_end"),
          explode(sequence(to_date(col("s_start")), to_date(col("s_end")))).as("day"))
        val campDays = camp.select(col("campaign_id"), col("c_start"), col("c_end"),
          explode(sequence(to_date(col("c_start")),
            date_sub(to_date(col("c_end")), 1))).as("day"))
        sessDays.join(campDays, "day")
          .filter(col("s_start") < col("c_end") && col("c_start") <= col("s_end"))
          .withColumn("omicro",
            least(unix_micros(col("s_end")), unix_micros(col("c_end"))) -
              greatest(unix_micros(col("s_start")), unix_micros(col("c_start"))))
          .select(col("user_id"), col("session_id"),
            col("campaign_id").cast("long").as("campaign_id"),
            expr("omicro div 60000000").as("overlap_min"))
          .distinct()
          .orderBy("user_id", "session_id", "campaign_id")
      },
      Some("""WITH ev AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        marked AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 3600000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM ev),
        sess AS (
          SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end FROM (
            SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
            FROM marked)
          GROUP BY 1, 2),
        d0 AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM ev),
        camp AS (
          SELECT k AS campaign_id,
                 CAST(d0.d0 + CAST(k * 7 AS INT) AS TIMESTAMP) AS c_start,
                 CAST(d0.d0 + CAST(k * 7 + 5 AS INT) AS TIMESTAMP) AS c_end
          FROM d0, (SELECT unnest(range(5)) AS k)),
        sdays AS (
          SELECT user_id, session_id, s_start, s_end,
                 CAST(unnest(generate_series(CAST(CAST(s_start AS DATE) AS TIMESTAMP),
                   CAST(CAST(s_end AS DATE) AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
          FROM sess),
        cdays AS (
          SELECT campaign_id, c_start, c_end,
                 CAST(unnest(generate_series(CAST(CAST(c_start AS DATE) AS TIMESTAMP),
                   CAST(CAST(c_end AS DATE) - 1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
          FROM camp)
        SELECT DISTINCT s.user_id, CAST(s.session_id AS BIGINT) AS session_id,
               CAST(c.campaign_id AS BIGINT) AS campaign_id,
               CAST((least(epoch_us(s.s_end), epoch_us(c.c_end)) -
                     greatest(epoch_us(s.s_start), epoch_us(c.c_start))) // 60000000 AS BIGINT)
                 AS overlap_min
        FROM sdays s JOIN cdays c USING (day)
        WHERE s.s_start < c.c_end AND c.c_start <= s.s_end
        ORDER BY user_id, session_id, campaign_id"""),
    ),

    QDef("agg_quantile_merge",
      // Mergeable-quantile state: per-(type, day) partial histograms
      // (10 fixed cent buckets) merged by ADDING COUNTS — the quantile
      // analog of pipeline_partial_agg_merge, and why approximate
      // quantiles at scale travel as histograms/sketches, never as raw
      // values. The merged histogram answers p50 as the first bucket
      // whose cumulative count crosses N/2 (pure integers), reported
      // next to the EXACT rank-based median so the bucket-resolution
      // error is visible and bounded by construction.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("b", least(floor(col("xc") / 5000).cast("long"), lit(9L)))
        val partials = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"), col("b"))
          .agg(count(lit(1)).as("n"))
        val merged = partials.groupBy("event_type", "b")
          .agg(sum("n").as("n"))
          .withColumn("cum", sum("n").over(
            Window.partitionBy("event_type").orderBy("b")))
          .withColumn("total", sum("n").over(Window.partitionBy("event_type")))
        val estP50 = merged.filter(col("cum") * 2 >= col("total"))
          .groupBy("event_type").agg(min("b").as("p50_bucket"))
          .withColumn("p50_upper_v", ((col("p50_bucket") + 1) * 5000).cast("double") / 100.0)
        val wRank = Window.partitionBy("event_type").orderBy("xc", "event_id")
        val exact = ev.withColumn("rn", row_number().over(wRank))
          .withColumn("total", count(lit(1)).over(Window.partitionBy("event_type")))
          .filter(col("rn") * 2 === col("total") || col("rn") * 2 === col("total") + 1)
          .groupBy("event_type").agg(min("xc").as("exact_p50_c"))
          .withColumn("exact_p50_v", col("exact_p50_c").cast("double") / 100.0)
        estP50.join(exact, "event_type")
          .select(col("event_type"), col("p50_bucket"), col("p50_upper_v"),
            col("exact_p50_v"))
          .withColumn("within_bucket",
            col("exact_p50_v") <= col("p50_upper_v") &&
              col("exact_p50_v") > col("p50_upper_v") - 50.0)
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
          SELECT event_type, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc,
                 least(CAST(floor(CAST(floor(value * 100 + 0.5) AS BIGINT) / 5000) AS BIGINT), 9) AS b,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
          FROM events),
        partials AS (
          SELECT event_type, day, b, count(*) AS n FROM ev GROUP BY 1, 2, 3),
        merged AS (
          SELECT event_type, b, sum(n) AS n,
                 sum(sum(n)) OVER (PARTITION BY event_type ORDER BY b) AS cum,
                 sum(sum(n)) OVER (PARTITION BY event_type) AS total
          FROM partials GROUP BY 1, 2),
        est AS (
          SELECT event_type, min(b) AS p50_bucket,
                 CAST((min(b) + 1) * 5000 AS DOUBLE) / 100.0 AS p50_upper_v
          FROM merged WHERE cum * 2 >= total GROUP BY 1),
        ranked AS (
          SELECT event_type, xc,
                 row_number() OVER (PARTITION BY event_type ORDER BY xc, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS total
          FROM ev),
        exact AS (
          SELECT event_type, min(xc) AS exact_p50_c,
                 CAST(min(xc) AS DOUBLE) / 100.0 AS exact_p50_v
          FROM ranked WHERE rn * 2 = total OR rn * 2 = total + 1 GROUP BY 1)
        SELECT e.event_type, CAST(s.p50_bucket AS BIGINT) AS p50_bucket,
               s.p50_upper_v, e.exact_p50_v,
               e.exact_p50_v <= s.p50_upper_v AND e.exact_p50_v > s.p50_upper_v - 50.0
                 AS within_bucket
        FROM est s JOIN exact e USING (event_type)
        ORDER BY e.event_type"""),
    ),

    QDef("sample_balanced",
      // Class-balanced downsampling: every language downsampled to the
      // smallest class's count, selection deterministic by salted md5
      // rank (reproducible across runs/engines, no RNG state). The min
      // class size is one tiny aggregate broadcast by crossJoin; the
      // per-class rank is one window. At 100 TB the window sorts within
      // each class partition only — and for heavily skewed classes the
      // rank-k cutoff is exactly the bounded-heap top-k shape
      // (topk_per_group_native) if the sort ever dominates.
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("h", Text.md5Hash32(concat(lit("bal:"), col("doc_id").cast("string"))))
        val m = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
          .agg(min("cnt").as("m"))
        docs.withColumn("rn",
          row_number().over(Window.partitionBy("lang").orderBy("h", "doc_id")))
          .crossJoin(m)
          .filter(col("rn") <= col("m"))
          .select(col("doc_id"), col("lang"), col("rn"))
          .orderBy("doc_id")
      },
      Some("""WITH docs AS (
          SELECT doc_id, lang,
                 CAST(('0x' || substr(md5('bal:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
          FROM documents),
        m AS (SELECT min(cnt) AS m FROM (SELECT count(*) AS cnt FROM docs GROUP BY lang)),
        ranked AS (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
          FROM docs)
        SELECT r.doc_id, r.lang, CAST(r.rn AS INT) AS rn FROM ranked r CROSS JOIN m
        WHERE r.rn <= m.m ORDER BY r.doc_id"""),
    ),

    QDef("pipeline_snapshot_diff",
      // Dataset-versioning diff — profile_content_digest's counterpart
      // when the digests DISAGREE and you need to know why: two corpus
      // snapshots (synthesized deterministically: v1 drops ids
      // ≡3 mod 17, v2 drops ids ≡7 mod 19 and mutates text on ids
      // ≡5 mod 13, so added/removed/changed/unchanged are ALL live at
      // every SF) compared by per-row content digest, reported as
      // per-source status counts. The full-outer join keys on doc_id —
      // the sort-merge (or bucket-colocated) shape at scale — and
      // compares 32-char digests computed in the scan projection, never
      // full text; the status aggregate's key space is sources × 4.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val v1 = docs.filter(col("doc_id") % 17 =!= 3)
          .select(col("doc_id"), col("source").as("src1"),
            md5(col("text")).as("d1"))
        val v2 = docs.filter(col("doc_id") % 19 =!= 7)
          .select(col("doc_id"), col("source").as("src2"),
            md5(when(col("doc_id") % 13 === 5, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("d2"))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .select(coalesce(col("src1"), col("src2")).as("source"),
            when(col("d1").isNull, "added")
              .when(col("d2").isNull, "removed")
              .when(col("d1") =!= col("d2"), "changed")
              .otherwise("unchanged").as("status"))
          .groupBy("source", "status")
          .agg(count(lit(1)).as("n"))
          .orderBy("source", "status")
      },
      Some("""WITH v1 AS (
          SELECT doc_id, source AS src1, md5(text) AS d1
          FROM documents WHERE doc_id % 17 <> 3),
        v2 AS (
          SELECT doc_id, source AS src2,
                 md5(CASE WHEN doc_id % 13 = 5 THEN text || ' v2' ELSE text END) AS d2
          FROM documents WHERE doc_id % 19 <> 7),
        j AS (
          SELECT coalesce(src1, src2) AS source,
                 CASE WHEN d1 IS NULL THEN 'added'
                      WHEN d2 IS NULL THEN 'removed'
                      WHEN d1 <> d2 THEN 'changed'
                      ELSE 'unchanged' END AS status
          FROM v1 FULL OUTER JOIN v2 USING (doc_id))
        SELECT source, status, count(*) AS n FROM j
        GROUP BY source, status ORDER BY source, status""")),

    QDef("win_downsample_lttb",
      // Largest-Triangle-Three-Buckets downsampling (Steinarsson) —
      // what a metrics dashboard runs to draw a 100M-point series with
      // 20 points while keeping its visual shape (peaks and bends
      // survive; naive striding erases them): per series, time-range
      // buckets; each interior bucket keeps the point forming the
      // LARGEST TRIANGLE with its neighbor buckets; the first/last
      // buckets keep the series endpoints. This is the parallel
      // variant — the classic is sequential (each bucket's anchor is
      // the PREVIOUS bucket's pick), which serializes the scan; using
      // neighbor-bucket MEANS as anchors (the standard parallel
      // approximation) makes every bucket independent: two map-side
      // aggregates + two equi joins + one per-bucket argmax window —
      // no cross-bucket dependency, no global window. Exactness: the
      // triangle-area comparison is cleared of divisions by scaling
      // through np²·nn — |t1 − t2| on DECIMAL(38,0) ≙ HUGEINT products
      // of rebased-micro×cent integers (≤10²⁷, exact in both) — so the
      // argmax is bit-identical cross-engine with (x, event_id)
      // tie-breaks; a bucket with an EMPTY neighbor emits nothing,
      // identically, via inner neighbor joins.
      (s, dir) => {
        val B = 20
        val ev = t(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            unix_micros(col("ts")).as("tu"),
            floor(col("value") * 100 + 0.5).cast("long").as("yc"))
        // bounds is referenced by all three pts consumers and bs by
        // three frames (two interior neighbor joins + bmax); Spark
        // shares no common subtrees, so unpinned each reference re-ran
        // the events scan+aggregate chain (~6 corpus passes per run).
        // Both are BOUNDED (types / types x B rows) — the bfs eager-
        // checkpoint rule, never a corpus-sized cache (pts itself stays
        // recomputed-from-scan, the scale-right choice).
        val bounds = ev.groupBy("event_type")
          .agg(min("tu").as("mn"), max("tu").as("mx"))
          .transform(d => graft.pipeline.Lineage.checkpoint(d))
        val pts = ev.join(broadcast(bounds), "event_type")
          .withColumn("x", col("tu") - col("mn"))
          .withColumn("b", expr(s"(x * $B) div (mx - mn + 1)"))
          .select("event_type", "event_id", "x", "yc", "b")
        val bs = pts.groupBy("event_type", "b")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("yc").as("sy"))
          .transform(d => graft.pipeline.Lineage.checkpoint(d))
        val bmax = bs.groupBy("event_type").agg(max("b").as("bmax"))
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val t1 = (dec(col("sxp")) * col("np2") - dec(col("sxn")) * col("np1")) *
          (dec(col("yc")) * col("np1") - dec(col("syp")))
        val t2 = (dec(col("sxp")) - dec(col("x")) * col("np1")) *
          (dec(col("syn")) * col("np1") - dec(col("syp")) * col("np2"))
        val wA = Window.partitionBy("event_type", "b")
          .orderBy(col("area").desc, col("x").asc, col("event_id").asc)
        val interior = pts
          .join(bs.select(col("event_type"), (col("b") + 1).as("b"),
            col("n").as("np1"), col("sx").as("sxp"), col("sy").as("syp")),
            Seq("event_type", "b"))
          .join(bs.select(col("event_type"), (col("b") - 1).as("b"),
            col("n").as("np2"), col("sx").as("sxn"), col("sy").as("syn")),
            Seq("event_type", "b"))
          .withColumn("area", abs(t1 - t2))
          .withColumn("rk", row_number().over(wA))
          .filter(col("rk") === 1)
          .select("event_type", "b", "event_id", "x", "yc")
        val wE = Window.partitionBy("event_type", "b")
          .orderBy(col("pos").asc, col("event_id").asc)
        val endpoints = pts.join(broadcast(bmax), "event_type")
          .filter(col("b") === 0 || col("b") === col("bmax"))
          .withColumn("pos", when(col("b") === 0, col("x"))
            .otherwise(-col("x")))
          .withColumn("rk", row_number().over(wE))
          .filter(col("rk") === 1)
          .select("event_type", "b", "event_id", "x", "yc")
        interior
          .join(broadcast(bmax), "event_type")
          .filter(col("b") =!= 0 && col("b") =!= col("bmax"))
          .select("event_type", "b", "event_id", "x", "yc")
          .unionByName(endpoints)
          .select(col("event_type"), col("b"), col("event_id"),
            col("x").as("x_us"), col("yc").as("y_cents"))
          .orderBy("event_type", "b")
      },
      Some(s"""WITH ev AS (
          SELECT event_type, event_id,
                 CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS tu,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS yc
          FROM events),
        bounds AS (
          SELECT event_type, CAST(min(tu) AS BIGINT) AS mn,
                 CAST(max(tu) AS BIGINT) AS mx
          FROM ev GROUP BY 1),
        pts AS (
          SELECT ev.event_type, event_id, tu - mn AS x, yc,
                 ((tu - mn) * 20) // (mx - mn + 1) AS b
          FROM ev JOIN bounds ON ev.event_type = bounds.event_type),
        bs AS (
          SELECT event_type, b, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy
          FROM pts GROUP BY 1, 2),
        bm AS (SELECT event_type, CAST(max(b) AS BIGINT) AS bmax
               FROM bs GROUP BY 1),
        inter AS (
          SELECT p.event_type, p.b, p.event_id, p.x, p.yc,
                 row_number() OVER (PARTITION BY p.event_type, p.b ORDER BY
                   abs((CAST(pb.sx AS HUGEINT) * nb.n
                          - CAST(nb.sx AS HUGEINT) * pb.n) *
                       (CAST(p.yc AS HUGEINT) * pb.n - pb.sy)
                     - (CAST(pb.sx AS HUGEINT) - CAST(p.x AS HUGEINT) * pb.n) *
                       (CAST(nb.sy AS HUGEINT) * pb.n
                          - CAST(pb.sy AS HUGEINT) * nb.n)) DESC,
                   p.x, p.event_id) AS rk
          FROM pts p
          JOIN bs pb ON pb.event_type = p.event_type AND pb.b = p.b - 1
          JOIN bs nb ON nb.event_type = p.event_type AND nb.b = p.b + 1),
        ends AS (
          SELECT event_type, b, event_id, x, yc,
                 row_number() OVER (PARTITION BY event_type, b ORDER BY
                   CASE WHEN b = 0 THEN x ELSE -x END, event_id) AS rk
          FROM pts JOIN bm USING (event_type)
          WHERE b = 0 OR b = bmax)
        SELECT event_type, b, event_id, x AS x_us, yc AS y_cents
        FROM (
          SELECT i.event_type, i.b, i.event_id, i.x, i.yc
          FROM inter i JOIN bm ON bm.event_type = i.event_type
          WHERE rk = 1 AND i.b <> 0 AND i.b <> bmax
          UNION ALL
          SELECT event_type, b, event_id, x, yc FROM ends WHERE rk = 1)
        ORDER BY event_type, b""")),

    QDef("win_seasonal_baseline",
      // Seasonality-adjusted anomaly detection — win_anomaly_mad's
      // counterpart when the signal has a KNOWN period: each
      // (event_type, date, hour) bucket compares against its
      // hour-of-day baseline across all days (the diurnal profile), and
      // flags buckets above 1.5x their seasonal mean. The comparison is
      // pure integers — cnt·n_days·100 > total·150 is exactly
      // cnt > 1.5·mean with no division — so the flag is bit-identical
      // in any engine and under any partitioning. Two map-side-combined
      // aggregates (bucket counts, then the 24·types baseline) + one
      // equi join back; the baseline side is dimension-sized and
      // broadcasts.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"), to_date(col("ts")).as("d"),
            hour(col("ts")).as("h"))
        val cnts = ev.groupBy("event_type", "d", "h")
          .agg(count(lit(1)).as("cnt"))
        val base = cnts.groupBy("event_type", "h")
          .agg(sum("cnt").as("tot"), count(lit(1)).as("n_days"))
        cnts.join(broadcast(base), Seq("event_type", "h"))
          .select(col("event_type"), col("d"), col("h").cast("long").as("h"),
            col("cnt"), col("tot"), col("n_days"),
            (col("cnt") * col("n_days") * 100 > col("tot") * 150).as("anomaly"))
          .orderBy("event_type", "d", "h")
      },
      Some("""WITH e AS (
          SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
                 hour(CAST(ts AS TIMESTAMP)) AS h
          FROM events),
        c AS (
          SELECT event_type, d, h, count(*) AS cnt
          FROM e GROUP BY event_type, d, h),
        b AS (
          SELECT event_type, h, CAST(sum(cnt) AS BIGINT) AS tot,
                 count(*) AS n_days
          FROM c GROUP BY event_type, h)
        SELECT event_type, d, CAST(h AS BIGINT) AS h, cnt, tot, n_days,
               (cnt * n_days * 100 > tot * 150) AS anomaly
        FROM c JOIN b USING (event_type, h)
        ORDER BY event_type, d, h""")),

    QDef("win_rolling_median7",
      // Sliding robust center — the rolling MEDIAN the ewma/MAD family
      // lacks: per event type, the 7-day trailing lower median of the
      // exact daily value mass. The median is SELECTED, never
      // interpolated — the frame's values sort and the (n+1)/2-th
      // element is taken, so with DECIMAL daily sums every compared
      // value is exact and both engines pick the identical element
      // (percentile interpolation would put an engine-variant double
      // between two rows). The frame is BOUNDED (7 rows), so the
      // collect-sort per row is O(7 log 7) — the window shape that
      // stays cheap at any scale because the daily aggregate beneath
      // it has already collapsed the fact table; one shuffle for the
      // aggregate, the type-keyed window reuses it.
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(sum(money(col("value"))).as("v"))
        val w = Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(-6, Window.currentRow)
        daily
          .withColumn("vals", collect_list(col("v")).over(w))
          .select(col("event_type"), col("d"),
            col("v").cast("double").as("daily_value"),
            size(col("vals")).cast("long").as("n_win"),
            element_at(sort_array(col("vals")),
              expr("(size(vals) + 1) div 2").cast("int"))
              .cast("double").as("med7"))
          .orderBy("event_type", "d")
      },
      Some("""WITH daily AS (
          SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
                 sum(CAST(value AS DECIMAL(18,2))) AS v
          FROM events GROUP BY event_type, d),
        win AS (
          SELECT event_type, d, v,
                 list(v) OVER (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS vals
          FROM daily)
        SELECT event_type, d, CAST(v AS DOUBLE) AS daily_value,
               CAST(len(vals) AS BIGINT) AS n_win,
               CAST((list_sort(vals))[(len(vals) + 1) // 2] AS DOUBLE) AS med7
        FROM win ORDER BY event_type, d""")),

    QDef("win_collapse_runs",
      // State-stream compression: consecutive same-state events per
      // user collapse to one run carrying (start, length) — the
      // run-length encoding a sessionized event log applies before
      // storage or state-machine analysis (repeated 'view view view'
      // is one dwell, not three transitions). One gaps-and-islands
      // pass: change flags via lag, prefix-sum run ids, one aggregate
      // per run — all over a SINGLE (user_id; ts, event_id) window
      // partitioning that the aggregate's shuffle then reuses. Run ids
      // and lengths are exact integers; tie-broken ordering makes the
      // run segmentation bit-identical in both engines.
      (s, dir) => {
        val wo = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val prior = lag(col("event_type"), 1).over(wo)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("chg",
            when(prior.isNull || prior =!= col("event_type"), 1L).otherwise(0L))
          .withColumn("run_id", sum(col("chg")).over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "run_id")
          .agg(min(col("event_type")).as("state"),
            min(col("ts")).as("run_start"),
            count(lit(1)).as("run_len"))
          .orderBy("user_id", "run_id")
      },
      Some("""WITH e AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events),
        c AS (
          SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                           OR lag(event_type) OVER w <> event_type
                         THEN 1 ELSE 0 END AS chg
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        r AS (
          SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS run_id
          FROM c)
        SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
               min(event_type) AS state, min(ts) AS run_start,
               count(*) AS run_len
        FROM r GROUP BY user_id, run_id
        ORDER BY user_id, run_id""")),

    QDef("agg_weighted_median",
      // Exact weighted lower median — the unweighted percentile
      // family's counterpart for importance-weighted data (price
      // weighted by shipped quantity per flag): weights pre-aggregate
      // onto DISTINCT values (collapsing the fact table and making the
      // cumulative order unique without any row tie-break), then a
      // TWO-LEVEL selection finds the first value where 2·cum >= total
      // without ever sorting a whole group through one reducer:
      // (1) values quantize to $1000 price BUCKETS, per-(group,
      // bucket) weights aggregate in parallel, and a cumulative over
      // the ≤~100-bucket-per-group table picks the bucket b* where the
      // crossing occurs (cum(v) at b*'s end ≥ tw/2, every earlier
      // bucket's cum < tw/2 — the crossing value is in b* by
      // construction); (2) only b*'s slice of the value table (one
      // bucket's share of the domain) is sorted, offset by the
      // cumulative below b*. Everything up to the final cast is
      // DECIMAL — exact, order-independent under any shuffle — and the
      // median is a data value, never an interpolation. At 100 TB the
      // round-11 single window meant per-group one-reducer sorts of
      // the whole price domain; recursing on the bucket split bounds
      // any sort to domain/buckets.
      (s, dir) => {
        // Staged (memoized persist): tw, the bucket cumulative, and the
        // in-bucket pass all read the collapsed value table — column
        // pruning makes their three agg subtrees non-identical, so
        // exchange reuse alone re-ran the corpus aggregate 3×.
        // The group key KEEPS its source name l_returnflag end to end:
        // BroadcastHintGuardSpec certifies the broadcast `sel` side by
        // the rk = 1 row_number cap per domain-bounded partition key,
        // and the domain bound is recognized by column name — a `g`
        // alias would sever it at the staged artifact's read-back.
        val perV = graft.pipeline.Staged.disk(s, dir, "wmedian_perv") {
          t(s, dir, "lineitem")
            .select(col("l_returnflag"),
              money(col("l_extendedprice")).as("v"),
              money(col("l_quantity")).as("w"))
            .groupBy("l_returnflag", "v").agg(sum(col("w")).as("wv"))
            .withColumn("b", expr("CAST(v * 100 AS BIGINT) div 100000"))
        }
        val wob = Window.partitionBy("l_returnflag").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // tw folds into the SAME bucket-table pass as the cumulative
        // (a whole-partition sum over the bounded ≤~100-buckets-per-
        // group table) — a separate groupBy aggregate re-read the
        // staged value table and paid one more broadcast join for a
        // number the window pass already has in hand.
        val sel = perV.groupBy("l_returnflag", "b").agg(sum("wv").as("bwv"))
          .withColumn("bcum", sum(col("bwv")).over(wob))
          .withColumn("tw",
            sum(col("bwv")).over(Window.partitionBy("l_returnflag")))
          .filter(col("bcum") * 2 >= col("tw"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("l_returnflag").orderBy("b")))
          .filter(col("rk") === 1)
          .select(col("l_returnflag"), col("b"),
            (col("bcum") - col("bwv")).as("cum_below"), col("tw"))
        val wo = Window.partitionBy("l_returnflag").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        perV.join(broadcast(sel), Seq("l_returnflag", "b"))
          .withColumn("cum", sum(col("wv")).over(wo) + col("cum_below"))
          .filter(col("cum") * 2 >= col("tw"))
          .groupBy("l_returnflag")
          .agg(min(col("v")).cast("double").as("weighted_median"),
            max(col("tw")).cast("double").as("total_weight"))
          .orderBy("l_returnflag")
      },
      Some("""WITH perv AS (
          SELECT l_returnflag AS g, CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS wv
          FROM lineitem GROUP BY g, v),
        c AS (
          SELECT g, v, wv,
                 sum(wv) OVER (PARTITION BY g ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(wv) OVER (PARTITION BY g) AS tw
          FROM perv)
        SELECT g AS l_returnflag,
               CAST(min(v) AS DOUBLE) AS weighted_median,
               CAST(max(tw) AS DOUBLE) AS total_weight
        FROM c WHERE cum * 2 >= tw
        GROUP BY g ORDER BY l_returnflag""")),
  )
}
