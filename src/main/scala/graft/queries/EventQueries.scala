package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Asof, Funnel, Sessionize, ZOrder}

/** Event-stream analytics operators (as-of join, sessionization)
  * gate-checked over the driver's `events` table.
  *
  * Determinism conventions (TestdataAdapter rules): timestamps leave
  * the gate as epoch-MICROS BIGINTs (Spark TimestampType is tz-aware,
  * DuckDB TIMESTAMP is naive — raw timestamp columns hash-mismatch by
  * dtype); money sums go through integer cents (`round(value*100)` is
  * exact — the data is 2-decimal); every oracle runs a STRUCTURALLY
  * different algorithm (join+rank vs union+carry-forward; the same
  * window recurrence re-derived in SQL) over the same raw parquet.
  */
object EventQueries {

  private val TwoHoursUs = 2L * 3600 * 1000000
  private val ThirtyMinUs = 30L * 60 * 1000000

  /** The purchase→view as-of attribution oracle, single-sourced so the
    * batch gate (p32, 2 h tolerance) and the streaming-parity gate
    * (st03, no tolerance — [[graft.streaming.StreamingAsof]] binds to
    * the latest state with no window) can never drift apart. Join+rank
    * formulation — structurally different from BOTH engine plans
    * (union+carry-forward batch, ring-state fold streaming).
    */
  private[queries] def asofSql(toleranceUs: Option[Long]): String = {
    val tolClause =
      toleranceUs.map(t => s"\n       AND p.ts_us - v.ts_us <= $t").getOrElse("")
    s"""WITH p AS (SELECT event_id, user_id,
       |                 epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
       |          FROM events WHERE event_type = 'purchase'),
       |v AS (SELECT event_id, user_id,
       |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
       |      FROM events WHERE event_type = 'view'),
       |j AS (SELECT p.event_id, p.user_id, p.ts_us,
       |             v.event_id AS view_event_id,
       |             v.ts_us AS view_ts_us, v.value AS view_value,
       |             row_number() OVER (
       |               PARTITION BY p.event_id
       |               ORDER BY v.ts_us DESC NULLS LAST,
       |                        v.event_id DESC NULLS LAST) AS rn
       |      FROM p LEFT JOIN v
       |        ON v.user_id = p.user_id AND v.ts_us <= p.ts_us$tolClause)
       |SELECT event_id, user_id, ts_us, view_event_id, view_ts_us,
       |       ts_us - view_ts_us AS gap_us,
       |       CAST(round(view_value * 100, 0) AS BIGINT)
       |         AS view_value_cents
       |FROM j WHERE rn = 1""".stripMargin
  }

  /** Purchase attribution: each purchase joined as-of to the user's
    * most recent view within 2 h (exact-time views count; same-time
    * view ties resolved by greatest event_id).
    */
  private def asofAttribution: QueryDef = QueryDef(
    "p32_asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.where(col("event_type") === "view")
        .select("event_id", "user_id", "ts", "value")
      Asof.joinAsOf(
        purchases, views,
        on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightTie = "event_id", rightCols = Seq("ts", "event_id", "value"),
        rightPrefix = "view_", toleranceMicros = Some(TwoHoursUs))
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("view_event_id"),
          unix_micros(col("view_ts")).as("view_ts_us"),
          (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"),
          round(col("view_value") * 100).cast("long").as("view_value_cents"))
    },
    Some(asofSql(Some(TwoHoursUs))))

  /** The 30-min-gap session recurrence as a shared CTE chain ending
    * in `sess(user_id, session_seq, start_us, end_us, n_events,
    * n_purchases, value_cents)` — single-sourced so the session gate
    * (p33) and the range-join gate (p39, which joins INTO these
    * sessions) can never drift apart.
    */
  private[queries] val sessionCtes =
    s"""e AS (SELECT event_id, user_id,
       |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       |             event_type, value
       |      FROM events),
       |l AS (SELECT *, lag(ts_us) OVER (
       |        PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
       |      FROM e),
       |b AS (SELECT *, CASE WHEN prev IS NULL
       |                       OR ts_us - prev > $ThirtyMinUs
       |                     THEN 1 ELSE 0 END AS brk
       |      FROM l),
       |sq AS (SELECT *, CAST(sum(brk) OVER (
       |        PARTITION BY user_id ORDER BY ts_us, event_id
       |        ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_seq
       |      FROM b),
       |sess AS (SELECT user_id, session_seq,
       |                min(ts_us) AS start_us, max(ts_us) AS end_us,
       |                CAST(count(*) AS BIGINT) AS n_events,
       |                CAST(sum(CASE WHEN event_type = 'purchase'
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
       |                CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
       |                     AS BIGINT) AS value_cents
       |         FROM sq GROUP BY user_id, session_seq)""".stripMargin

  /** Spark-side sessions shared by p33/p39. */
  private def sessionFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Sessionize.sessionStats(
      Tables.events(s, dir),
      keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
      gapMicros = ThirtyMinUs,
      aggs = Seq(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(round(col("value") * 100).cast("long")).as("value_cents")))

  /** 30-minute-gap sessions per user with integer-deterministic
    * aggregates (counts + cents sums).
    */
  private def sessionize: QueryDef = QueryDef(
    "p33_sessionize",
    (s, dir) => sessionFrame(s, dir),
    Some(s"""WITH $sessionCtes
            |SELECT * FROM sess""".stripMargin))

  /** Z-order values over (user_id, value-cents): the layout key the
    * clustering writer sorts by. The oracle re-derives the exact
    * normalize + magic-mask spread ladder with DuckDB bit ops —
    * integer arithmetic end to end, so the interleave is
    * hash-gateable bit for bit.
    */
  private def zorderValues: QueryDef = QueryDef(
    "p36_zorder_values",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      ZOrder.withZValue(ev, "user_id", "cents")
        .select(col("event_id"), col("user_id"), col("cents"),
          col("__z").as("zval"))
    },
    Some("""WITH e AS (SELECT event_id, user_id,
            |                 CAST(round(value * 100, 0) AS BIGINT) AS cents
            |          FROM events),
            |s AS (SELECT min(user_id) AS alo, max(user_id) AS ahi,
            |             min(cents) AS blo, max(cents) AS bhi FROM e),
            |n AS (SELECT event_id, user_id, cents,
            |             CASE WHEN ahi - alo <= 0 THEN 0
            |                  ELSE ((user_id - alo) * 65535) // (ahi - alo)
            |             END AS na,
            |             CASE WHEN bhi - blo <= 0 THEN 0
            |                  ELSE ((cents - blo) * 65535) // (bhi - blo)
            |             END AS nb
            |      FROM e CROSS JOIN s),
            |s1 AS (SELECT *, (na | (na << 8)) & 16711935 AS a1,
            |                 (nb | (nb << 8)) & 16711935 AS b1 FROM n),
            |s2 AS (SELECT *, (a1 | (a1 << 4)) & 252645135 AS a2,
            |                 (b1 | (b1 << 4)) & 252645135 AS b2 FROM s1),
            |s3 AS (SELECT *, (a2 | (a2 << 2)) & 858993459 AS a3,
            |                 (b2 | (b2 << 2)) & 858993459 AS b3 FROM s2),
            |s4 AS (SELECT *, (a3 | (a3 << 1)) & 1431655765 AS a4,
            |                 (b3 | (b3 << 1)) & 1431655765 AS b4 FROM s3)
            |SELECT event_id, user_id, cents, a4 | (b4 << 1) AS zval
            |FROM s4""".stripMargin))

  /** view -> click -> purchase conversion funnel, 1-day window
    * anchored at the first view, strict step ordering.
    */
  /** Shared by the batch gate (p37) and the streaming-parity gate
    * (st02) — one SQL so the two can never drift apart.
    */
  private[queries] val funnelSql =
    """WITH e AS (SELECT user_id AS k,
            |                 epoch_us(CAST(ts AS TIMESTAMP)) AS t,
            |                 event_type AS et
            |          FROM events),
            |s1 AS (SELECT k, min(t) AS t1 FROM e WHERE et = 'view' GROUP BY k),
            |s2 AS (SELECT s1.k, min(e.t) AS t2
            |       FROM s1 JOIN e ON e.k = s1.k AND e.et = 'click'
            |        AND e.t > s1.t1 AND e.t - s1.t1 <= 86400000000
            |       GROUP BY s1.k),
            |s3 AS (SELECT s1.k, min(e.t) AS t3
            |       FROM s1 JOIN s2 ON s2.k = s1.k
            |       JOIN e ON e.k = s1.k AND e.et = 'purchase'
            |        AND e.t > s2.t2 AND e.t - s1.t1 <= 86400000000
            |       GROUP BY s1.k)
            |SELECT s1.k AS user_id, s1.t1 AS t1_us, s2.t2 AS t2_us,
            |       s3.t3 AS t3_us,
            |       CAST(CASE WHEN t3 IS NOT NULL THEN 3
            |                 WHEN t2 IS NOT NULL THEN 2
            |                 ELSE 1 END AS BIGINT) AS furthest_step,
            |       t3 IS NOT NULL AS converted
            |FROM s1 LEFT JOIN s2 ON s2.k = s1.k
            |        LEFT JOIN s3 ON s3.k = s1.k""".stripMargin

  private def funnel: QueryDef = QueryDef(
    "p37_funnel",
    (s, dir) => Funnel.analyze(
      Tables.events(s, dir),
      keyCol = "user_id", tsCol = "ts", typeCol = "event_type",
      steps = Seq("view", "click", "purchase"),
      windowMicros = Some(86400000000L)),
    Some(funnelSql))

  /** Bloom pre-shuffle semi-filter: orders surviving a 512-bit bloom
    * over nation-5 customers, with exact membership alongside — the
    * gate pins the no-false-negative contract AND the exact
    * md5-defined false-positive set (m deliberately small so FPs
    * exist). Oracle rebuilds the bit set and probes it in SQL.
    */
  private def bloomSemijoin: QueryDef = QueryDef(
    "p38_bloom_semijoin",
    (s, dir) => {
      val build = graft.Tables.customer(s, dir)
        .where(col("c_nationkey") === 5).select("c_custkey")
      val probe = graft.Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey")
      graft.functions.BloomFunctions.bloomSemiFilter(
        probe, "o_custkey", build, "c_custkey", mWords = 8, k = 4)
        .join(build.withColumn("__m", lit(true)),
          col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"),
          coalesce(col("__m"), lit(false)).as("is_member"))
    },
    Some("""WITH build AS (SELECT c_custkey FROM customer
            |               WHERE c_nationkey = 5),
            |bh AS (SELECT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT AS ha,
            |              ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8))::BIGINT AS hb
            |       FROM build),
            |bits AS (SELECT DISTINCT (ha + i * hb) % 512 AS pos
            |         FROM bh CROSS JOIN (SELECT unnest(range(4)) AS i) ix),
            |ph AS (SELECT o_orderkey, o_custkey,
            |              ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS ha,
            |              ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 9, 8))::BIGINT AS hb
            |       FROM orders),
            |pp AS (SELECT o_orderkey, o_custkey, (ha + i * hb) % 512 AS pos
            |       FROM ph CROSS JOIN (SELECT unnest(range(4)) AS i) ix),
            |surv AS (SELECT o_orderkey, o_custkey
            |         FROM pp LEFT JOIN bits ON pp.pos = bits.pos
            |         GROUP BY o_orderkey, o_custkey
            |         HAVING count(bits.pos) = 4)
            |SELECT s.o_orderkey, s.o_custkey,
            |       s.o_custkey IN (SELECT c_custkey FROM build) AS is_member
            |FROM surv s""".stripMargin))

  /** Binned range join: purchases matched back into the session
    * intervals containing them — an equi-join on (user, hour-bucket)
    * with exact containment post-filter, never a nested-loop range
    * join. Oracle runs the PLAIN inequality join over the shared
    * session CTEs (fine at sf0.01; the binned plan is the point at
    * scale).
    */
  private def rangeJoin: QueryDef = QueryDef(
    "p39_range_join",
    (s, dir) => {
      val sess = sessionFrame(s, dir)
        .select("user_id", "session_seq", "start_us", "end_us")
      val purchases = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("t"))
      graft.operators.RangeJoin.pointInInterval(
        purchases, sess, keyCols = Seq("user_id"),
        pointTime = "t", startCol = "start_us", endCol = "end_us",
        bucketMicros = 3600000000L)
        .select(col("event_id"), col("user_id"), col("session_seq"))
    },
    Some(s"""WITH $sessionCtes
            |SELECT p.event_id, p.user_id, s.session_seq
            |FROM (SELECT event_id, user_id, ts_us FROM e
            |      WHERE event_type = 'purchase') p
            |JOIN sess s ON s.user_id = p.user_id
            | AND p.ts_us BETWEEN s.start_us AND s.end_us""".stripMargin))

  /** Equi-width cents histogram (25 x 2000-cent bins, out-of-range
    * clamped to the edges) — exact counts, pure integer bins.
    */
  private def histogram: QueryDef = QueryDef(
    "p41_histogram",
    (s, dir) => graft.operators.Profiling.histogram(
      Tables.events(s, dir)
        .select(round(col("value") * 100).cast("long").as("cents")),
      valueCol = "cents", lo = 0L, hi = 50000L, nBins = 25),
    Some("""WITH v AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c
            |          FROM events WHERE value IS NOT NULL),
            |b AS (SELECT least(greatest((c - 0) // 2000, 0), 24) AS bin
            |      FROM v)
            |SELECT bin, 0 + bin * 2000 AS bin_lo,
            |       0 + (bin + 1) * 2000 AS bin_hi,
            |       CAST(count(*) AS BIGINT) AS n
            |FROM b GROUP BY bin""".stripMargin))

  /** Forward as-of: each purchase joined to the user's NEXT view
    * within 2 h (post-purchase browsing attribution — the mirror of
    * p32). Exact-time views count; same-time ties resolve by SMALLEST
    * event_id (the earliest-following convention). The oracle runs
    * the join+rank shape with the inequality and rank order flipped.
    */
  private def asofForward: QueryDef = QueryDef(
    "p62_asof_forward",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.where(col("event_type") === "view")
        .select("event_id", "user_id", "ts", "value")
      Asof.joinAsOfForward(
        purchases, views,
        on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightTie = "event_id", rightCols = Seq("ts", "event_id", "value"),
        rightPrefix = "view_", toleranceMicros = Some(TwoHoursUs))
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("view_event_id"),
          unix_micros(col("view_ts")).as("view_ts_us"),
          (unix_micros(col("view_ts")) - unix_micros(col("ts"))).as("gap_us"),
          round(col("view_value") * 100).cast("long").as("view_value_cents"))
    },
    Some(s"""WITH p AS (SELECT event_id, user_id,
            |                 epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
            |          FROM events WHERE event_type = 'purchase'),
            |v AS (SELECT event_id, user_id,
            |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
            |      FROM events WHERE event_type = 'view'),
            |j AS (SELECT p.event_id, p.user_id, p.ts_us,
            |             v.event_id AS view_event_id,
            |             v.ts_us AS view_ts_us, v.value AS view_value,
            |             row_number() OVER (
            |               PARTITION BY p.event_id
            |               ORDER BY v.ts_us ASC NULLS LAST,
            |                        v.event_id ASC NULLS LAST) AS rn
            |      FROM p LEFT JOIN v
            |        ON v.user_id = p.user_id AND v.ts_us >= p.ts_us
            |       AND v.ts_us - p.ts_us <= $TwoHoursUs)
            |SELECT event_id, user_id, ts_us, view_event_id, view_ts_us,
            |       view_ts_us - ts_us AS gap_us,
            |       CAST(round(view_value * 100, 0) AS BIGINT)
            |         AS view_value_cents
            |FROM j WHERE rn = 1""".stripMargin))

  /** HyperLogLog distinct user-DAYS per event type (the DAU-dedup
    * shape: one user active on three days counts three) at 2^p BYTES
    * of state per group ([[graft.functions.HyperLogLog]]; p=4 keeps
    * the raw estimator in its valid range at every testdata scale,
    * and user-day cardinality VARIES per event type — plain distinct
    * users is the same 150-user set for all five types, which would
    * gate five identical sketches). The day is epoch-micros integer-
    * divided by 86 400 000 000 — tz-free, exact in both engines.
    * Registers leave as an md5 digest (index-ordered), the harmonic
    * denominator as an EXACT integer cast once to double, the raw
    * estimate as pinned-order IEEE arithmetic, and exact
    * count(distinct) rides along as the accuracy witness — the
    * oracle rebuilds every register from `length(bin(h // m))` and
    * hash-matches all of it.
    */
  /** Engine-side user-day hash column shared by p70/p74. */
  private def userDayHash = graft.functions.Md5Hash.h60(
    concat(col("user_id").cast("string"), lit(":"),
      expr("unix_micros(ts) div 86400000000").cast("string")))

  /** p70/p74 shared oracle CTEs ending in `agg(event_type,
    * register_digest, n_zero_registers, harmonic_scaled)` — single-
    * sourced so the direct gate and the merge gate can never drift.
    */
  private val hllOracleCtes =
    """h AS (SELECT DISTINCT event_type,
      |                  ('0x' || substr(md5(
      |                    CAST(user_id AS VARCHAR) || ':' ||
      |                    CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS VARCHAR)
      |                  ), 1, 15))::BIGINT AS h
      |           FROM events),
      |rho AS (SELECT event_type, h % 16 AS bucket,
      |               CASE WHEN h // 16 = 0 THEN 57
      |                    ELSE 56 - length(bin(h // 16)) + 1 END AS rho
      |        FROM h),
      |base AS (SELECT DISTINCT event_type FROM events),
      |regs AS (SELECT base.event_type, b.bucket, COALESCE(mx.mr, 0) AS reg
      |         FROM base
      |         CROSS JOIN (SELECT unnest(range(16)) AS bucket) b
      |         LEFT JOIN (SELECT event_type, bucket, max(rho) AS mr
      |                    FROM rho GROUP BY event_type, bucket) mx
      |           ON mx.event_type = base.event_type AND mx.bucket = b.bucket),
      |agg AS (SELECT event_type,
      |               md5(string_agg(CAST(reg AS VARCHAR), ',' ORDER BY bucket))
      |                 AS register_digest,
      |               CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |                 AS n_zero_registers,
      |               CAST(sum(1::HUGEINT << (61 - CAST(reg AS INT))) AS DOUBLE)
      |                 AS harmonic_scaled
      |        FROM regs GROUP BY event_type)""".stripMargin

  private val hllEstimateSql =
    "(0.7213 / (1 + 1.079 / 16.0)) * 256.0 * 2305843009213693952.0"

  private def hllUsers: QueryDef = {
    import graft.functions.{SketchFunctions => SK}
    val p = 4
    QueryDef(
      "p70_hll_users",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"), userDayHash.as("h"))
        .groupBy("event_type")
        .agg(SK.hyperLogLog(col("h"), p).as("__regs"),
          count_distinct(col("h")).as("exact_distinct"))
        .select(col("event_type"),
          md5(array_join(transform(col("__regs"), _.cast("string")), ","))
            .as("register_digest"),
          SK.hllZeroRegisters(col("__regs")).as("n_zero_registers"),
          SK.hllHarmonicScaled(col("__regs")).as("harmonic_scaled"),
          SK.hllEstimate(col("__regs"), p).as("est_distinct"),
          col("exact_distinct")),
      Some(s"""WITH $hllOracleCtes,
             |ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS exact_distinct
             |       FROM h GROUP BY event_type)
             |SELECT a.event_type, a.register_digest, a.n_zero_registers,
             |       a.harmonic_scaled,
             |       $hllEstimateSql
             |         / a.harmonic_scaled AS est_distinct,
             |       ex.exact_distinct
             |FROM agg a JOIN ex USING (event_type)""".stripMargin))
  }

  /** HLL MERGEABILITY, driver-visible (the p54 KMV-merge analog):
    * sketch the even- and odd-event_id halves INDEPENDENTLY, combine
    * with [[graft.functions.SketchFunctions.hllMerge]] (elementwise
    * max), and the result must hash-equal the sketch of the full
    * corpus — the property that lets a 100 TB pipeline keep per-day
    * register files and roll them up at read time instead of
    * re-scanning. The oracle computes the FULL-corpus registers only;
    * a lost or mis-aligned register in the merge breaks the hash.
    */
  private def hllMergeGate: QueryDef = {
    import graft.functions.{SketchFunctions => SK}
    val p = 4
    val emptyRegs = array((0 until (1 << p)).map(_ => lit(0L)): _*)
    QueryDef(
      "p74_hll_merge",
      (s, dir) => {
        val hashed = Tables.events(s, dir)
          .select(col("event_type"), col("event_id"), userDayHash.as("h"))
        def half(par: Int) = hashed.where(col("event_id") % 2 === par)
          .groupBy("event_type")
          .agg(SK.hyperLogLog(col("h"), p).as(s"__r$par"))
        half(0).join(half(1), Seq("event_type"), "full_outer")
          .select(col("event_type"),
            SK.hllMerge(coalesce(col("__r0"), emptyRegs),
              coalesce(col("__r1"), emptyRegs)).as("__regs"))
          .select(col("event_type"),
            md5(array_join(transform(col("__regs"), _.cast("string")), ","))
              .as("register_digest"),
            SK.hllZeroRegisters(col("__regs")).as("n_zero_registers"),
            SK.hllHarmonicScaled(col("__regs")).as("harmonic_scaled"),
            SK.hllEstimate(col("__regs"), p).as("est_distinct"))
      },
      Some(s"""WITH $hllOracleCtes
             |SELECT event_type, register_digest, n_zero_registers,
             |       harmonic_scaled,
             |       $hllEstimateSql
             |         / harmonic_scaled AS est_distinct
             |FROM agg""".stripMargin))
  }

  /** Cohort retention matrix over the events stream: users grouped by
    * first-active day, each cohort's distinct actives per day offset,
    * with the cohort size and ONE exact division per cell. Oracle
    * re-derives the (user, day) grain, cohort mins, matrix counts and
    * offset-0 sizes in SQL.
    */
  private def cohortRetention: QueryDef = QueryDef(
    "p88_cohort_retention",
    (s, dir) => graft.operators.Cohorts.retention(Tables.events(s, dir)),
    Some("""WITH days AS (
           |  SELECT DISTINCT user_id AS u,
           |         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
           |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
           |coh AS (SELECT u, min(day) AS cohort_day FROM days GROUP BY 1),
           |cells AS (SELECT cohort_day,
           |                 CAST(date_diff('day', cohort_day, day) AS INT)
           |                   AS day_offset,
           |                 CAST(count(DISTINCT u) AS BIGINT) AS n_active
           |          FROM days JOIN coh USING (u)
           |          GROUP BY 1, 2),
           |sizes AS (SELECT cohort_day, n_active AS n_cohort
           |          FROM cells WHERE day_offset = 0)
           |SELECT cohort_day, day_offset, n_active, n_cohort,
           |       n_active / n_cohort AS retention
           |FROM cells JOIN sizes USING (cohort_day)""".stripMargin))

  def defs: Seq[QueryDef] =
    Seq(asofAttribution, sessionize, zorderValues, funnel, bloomSemijoin,
      rangeJoin, histogram, asofForward, hllUsers, hllMergeGate,
      cohortRetention)
}
