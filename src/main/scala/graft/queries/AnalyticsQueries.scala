package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Attribution, Privacy, Sketches, TimeSeries}
import graft.queries.Tables.t

/**
 * Round-9 analytics families: conversion attribution + RFM segmentation
 * (the growth-dashboard layer above the reference's per-source counts,
 * `dashbord/dashbord.py:104-119`), sweep-line interval algebra, and the
 * KMV distinct sketch with set operations.
 *
 * Oracle conventions follow QueryDef's contract: event time compared at
 * MICROsecond grain (`ts div 1000` ↔ `epoch_us(ts)` — DuckDB's parquet
 * reader truncates ns), money micro-quantized before summation, splits
 * in BIGINT integer division, `count`/`sum` results cast to BIGINT where
 * DuckDB widens.
 */
object AnalyticsQueries {

  val defs: Map[String, QueryDef] = Map(

    // ---- conversion attribution / customer segmentation ----

    "at1_last_touch" -> QueryDef(
      (s, dir) => Attribution.lastTouch(t(s, dir, "events")),
      Some("""WITH s AS (
                SELECT user_id, event_type, value, epoch_us(ts) AS tsu,
                       last_value(CASE WHEN event_type IN ('view','click')
                                  THEN event_type END IGNORE NULLS)
                         OVER w AS lt_type,
                       last_value(CASE WHEN event_type IN ('view','click')
                                  THEN epoch_us(ts) END IGNORE NULLS)
                         OVER w AS lt_tsu
                FROM events
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW))
              SELECT CASE WHEN lt_tsu IS NOT NULL
                           AND lt_tsu >= tsu - 604800000000
                          THEN lt_type ELSE '(none)' END AS channel,
                     CAST(count(*) AS BIGINT) AS n_conversions,
                     CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))
                       AS BIGINT) AS attributed_micro
              FROM s WHERE event_type = 'purchase'
              GROUP BY 1"""),
      "last-touch attribution: one merged-stream window pass per user"),

    "at2_linear_attrib" -> QueryDef(
      (s, dir) => Attribution.linearTouch(t(s, dir, "events")),
      Some("""WITH s AS (
                SELECT event_type, value,
                       count(CASE WHEN event_type = 'view' THEN 1 END)
                         OVER w AS n_view,
                       count(CASE WHEN event_type = 'click' THEN 1 END)
                         OVER w AS n_click
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                             RANGE BETWEEN 604800000000 PRECEDING
                                   AND 1 PRECEDING)),
              p AS (
                SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm,
                       n_view, n_click, n_view + n_click AS n_tot
                FROM s WHERE event_type = 'purchase'),
              p2 AS (
                SELECT vm, n_view, n_click, n_tot,
                       vm * n_view // n_tot AS share_view,
                       vm * n_click // n_tot AS share_click
                FROM p)
              SELECT 'view' AS channel,
                     CAST(coalesce(sum(share_view), 0) AS BIGINT)
                       AS attributed_micro,
                     CAST(count(*) AS BIGINT) AS n_conversions_touched
              FROM p2 WHERE n_tot > 0
              UNION ALL
              SELECT 'click',
                     CAST(coalesce(sum(share_click), 0) AS BIGINT),
                     CAST(count(*) AS BIGINT)
              FROM p2 WHERE n_tot > 0
              UNION ALL
              SELECT '(remainder)',
                     CAST(coalesce(sum(vm - share_view - share_click), 0)
                       AS BIGINT),
                     CAST(count(*) AS BIGINT)
              FROM p2 WHERE n_tot > 0
              UNION ALL
              SELECT '(none)',
                     CAST(coalesce(sum(vm), 0) AS BIGINT),
                     CAST(count(*) AS BIGINT)
              FROM p2 WHERE n_tot = 0"""),
      "linear multi-touch attribution: exact integer value split"),

    "at3_rfm_segments" -> QueryDef(
      (s, dir) => Attribution.rfmSegments(t(s, dir, "orders")),
      Some("""WITH pc AS (
                SELECT o_custkey,
                       date_diff('day', CAST(max(o_orderdate) AS DATE),
                                 DATE '2026-01-01') AS recency_days,
                       count(*) AS n_orders,
                       CAST(sum(CAST(floor(o_totalprice * 1e6 + 0.5)
                         AS BIGINT)) AS BIGINT) AS monetary_micro
                FROM orders GROUP BY 1),
              sc AS (
                SELECT monetary_micro,
                       CAST(ntile(5) OVER (ORDER BY recency_days DESC,
                         o_custkey) AS INTEGER) AS r_score,
                       CAST(ntile(5) OVER (ORDER BY n_orders ASC,
                         o_custkey) AS INTEGER) AS f_score,
                       CAST(ntile(5) OVER (ORDER BY monetary_micro ASC,
                         o_custkey) AS INTEGER) AS m_score
                FROM pc)
              SELECT r_score, f_score, m_score,
                     CAST(count(*) AS BIGINT) AS n_customers,
                     CAST(sum(monetary_micro) AS BIGINT) AS monetary_micro
              FROM sc GROUP BY 1, 2, 3"""),
      "RFM quintile segmentation (Hughes): segment-grain rollup"),

    // Windowed strict-order funnel (ClickHouse windowFunnel semantics):
    // deepest view->click->purchase chain fitting in 1 hour of its own
    // first step, every view a candidate start.
    "s8_window_funnel" -> QueryDef(
      (s, dir) => Attribution.windowFunnel(t(s, dir, "events"),
        windowUs = 3600000000L),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu,
                                -epoch_us(ts) AS neg
                         FROM events),
              lk AS (SELECT user_id, event_type, tsu,
                            min(CASE WHEN event_type = 'click'
                                THEN tsu END) OVER w AS next_click,
                            min(CASE WHEN event_type = 'purchase'
                                THEN tsu END) OVER w AS next_purchase
                     FROM e
                     WINDOW w AS (PARTITION BY user_id ORDER BY neg
                                  RANGE BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)),
              ck AS (SELECT DISTINCT user_id, tsu AS click_tsu,
                            next_purchase AS purchase_after_click
                     FROM lk WHERE event_type = 'click'),
              vw AS (SELECT user_id, tsu, next_click FROM lk
                     WHERE event_type = 'view'),
              lv AS (SELECT vw.user_id,
                            CASE WHEN vw.next_click IS NOT NULL
                                  AND vw.next_click <= vw.tsu + 3600000000
                                 THEN CASE WHEN ck.purchase_after_click
                                            IS NOT NULL
                                        AND ck.purchase_after_click
                                            <= vw.tsu + 3600000000
                                      THEN 3 ELSE 2 END
                                 ELSE 1 END AS level
                     FROM vw LEFT JOIN ck
                       ON ck.user_id = vw.user_id
                      AND ck.click_tsu = vw.next_click)
              SELECT user_id, CAST(max(level) AS INTEGER) AS best_level
              FROM lv GROUP BY 1"""),
      "windowed strict-order funnel (windowFunnel semantics, 1h window)"),

    // Growth accounting: per-day new/retained/resurrected/churned flows
    // whose identity active(d) = active(d-1) + new - churned + resurrected
    // decomposes growth into auditable parts.
    "s9_growth_accounting" -> QueryDef(
      (s, dir) => Attribution.growthAccounting(t(s, dir, "events")),
      Some("""WITH act AS (SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
                   FROM events),
              cl AS (SELECT user_id, day,
                            lag(day) OVER w AS prev,
                            lead(day) OVER w AS next
                     FROM act
                     WINDOW w AS (PARTITION BY user_id ORDER BY day)),
              a AS (SELECT day,
                           CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS n_new,
                           CASE WHEN prev = day - 1 THEN 1 ELSE 0 END
                             AS n_retained,
                           CASE WHEN prev IS NOT NULL AND prev < day - 1
                                THEN 1 ELSE 0 END AS n_resurrected,
                           0 AS n_churned
                    FROM cl
                    UNION ALL
                    SELECT day + 1, 0, 0, 0, 1
                    FROM cl WHERE next IS NULL OR next > day + 1)
              SELECT day, CAST(sum(n_new) AS BIGINT) AS n_new,
                     CAST(sum(n_retained) AS BIGINT) AS n_retained,
                     CAST(sum(n_resurrected) AS BIGINT) AS n_resurrected,
                     CAST(sum(n_churned) AS BIGINT) AS n_churned
              FROM a GROUP BY 1"""),
      "growth accounting: daily new/retained/resurrected/churned flows"),

    // Kaplan-Meier retention curve over session lifetimes (s1's gap
    // rule): duration in whole minutes, death = the session ENDED (its
    // last event sits more than one gap before the corpus end — the
    // same observability rule s9 uses for churn), else censored. The
    // product limit rides as an exact BIGINT of per-term nano-quantized
    // ln factors (PSI discipline) so both engines agree bit-for-bit.
    "s10_retention_km" -> QueryDef(
      (s, dir) => {
        val gapNs = 3600L * 1000000000L
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = t(s, dir, "events")
          .withColumn("prev_ts", lag("ts", 1).over(wOrd))
          .withColumn("nw", when(col("prev_ts").isNull ||
            col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
          .withColumn("sid", sum("nw").over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sid")
          .agg(min("ts").as("t0"), max("ts").as("t1"))
        val end = sess.agg(max("t1").as("t_end"))
        val lifetimes = sess.crossJoin(broadcast(end))
          .select(expr("(t1 - t0) div 60000000000").as("t_min"),
            when(col("t_end") - col("t1") > gapNs, 1L).otherwise(0L)
              .as("death"))
        Attribution.kaplanMeier(lifetimes, "t_min", "death")
      },
      Some("""WITH g AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id,
                     lag(epoch_ns(ts)) OVER w AS prev_ts
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id)),
              f AS (SELECT user_id, tsn, event_id,
                           CASE WHEN prev_ts IS NULL
                                  OR tsn - prev_ts > 3600000000000
                                THEN 1 ELSE 0 END AS nw
                    FROM g),
              sx AS (SELECT user_id, tsn,
                            sum(nw) OVER (PARTITION BY user_id
                              ORDER BY tsn, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
                     FROM f),
              se AS (SELECT user_id, sid, min(tsn) AS t0, max(tsn) AS t1
                     FROM sx GROUP BY 1, 2),
              en AS (SELECT max(t1) AS t_end FROM se),
              lt AS (SELECT (t1 - t0) // 60000000000 AS t,
                            CASE WHEN en.t_end - t1 > 3600000000000
                                 THEN 1 ELSE 0 END AS death
                     FROM se, en),
              bt AS (SELECT t, CAST(sum(death) AS BIGINT) AS n_events,
                            CAST(sum(1 - death) AS BIGINT) AS n_censored,
                            CAST(count(*) AS BIGINT) AS nt
                     FROM lt GROUP BY 1),
              rk AS (SELECT t, n_events, n_censored,
                            (SELECT CAST(sum(nt) AS BIGINT) FROM bt)
                            - CAST(coalesce(sum(nt) OVER (ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS BIGINT)
                              AS n_risk
                     FROM bt),
              tm AS (SELECT t, n_risk, n_events, n_censored,
                            CASE WHEN n_events = 0 THEN 0
                                 WHEN n_risk = n_events
                                   THEN -1000000000000000
                                 ELSE CAST(floor(
                                   ln(CAST(n_risk - n_events AS DOUBLE)
                                      / CAST(n_risk AS DOUBLE))
                                   * 1e9 + 0.5) AS BIGINT)
                            END AS term
                     FROM rk)
              SELECT t, n_risk, n_events, n_censored,
                     CAST(sum(term) OVER wc AS BIGINT) AS log_surv_nano,
                     round(exp(CAST(sum(term) OVER wc AS DOUBLE) / 1e9), 6)
                       AS surv
              FROM tm
              WINDOW wc AS (ORDER BY t ROWS UNBOUNDED PRECEDING)"""),
      "Kaplan-Meier session-lifetime retention with right-censoring"),

    // ---- interval algebra ----

    // Events expand to 30-minute activity intervals; the merge is the
    // de-overlapped per-user footprint (covered/idle time) — session
    // stitching by interval algebra rather than s1's gap rule.
    "x12_interval_merge" -> QueryDef(
      (s, dir) => TimeSeries.mergedIntervals(
        t(s, dir, "events").select(col("user_id"),
          expr("ts div 1000").as("iv_start"),
          (expr("ts div 1000") + lit(1800000000L)).as("iv_end")),
        "user_id", "iv_start", "iv_end"),
      Some("""WITH iv AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts) + 1800000000 AS e
                FROM events),
              w1 AS (
                SELECT user_id, s, e,
                       CASE WHEN max(e) OVER pre IS NULL
                              OR s > max(e) OVER pre THEN 1 ELSE 0 END AS nw
                FROM iv
                WINDOW pre AS (PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING)),
              w2 AS (
                SELECT user_id, s, e,
                       sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS island
                FROM w1),
              isl AS (
                SELECT user_id, island, min(s) AS i_start, max(e) AS i_end,
                       count(*) AS i_n
                FROM w2 GROUP BY 1, 2)
              SELECT user_id,
                     CAST(sum(i_n) AS BIGINT) AS n_intervals,
                     CAST(count(*) AS BIGINT) AS n_islands,
                     CAST(sum(i_end - i_start) AS BIGINT) AS covered,
                     CAST(max(i_end) - min(i_start) AS BIGINT) AS span,
                     CAST(max(i_end) - min(i_start) - sum(i_end - i_start)
                       AS BIGINT) AS idle
              FROM isl GROUP BY 1"""),
      "sweep-line interval merge: per-user islands, covered/idle time"),

    // Sample autocorrelation at lags 1..26 over the x9 per-(type, hour)
    // count series — the seasonality detector that tells x10 WHICH
    // period to baseline on. Exact BIGINT moments per key and per
    // (key, lag); one fixed-shape double combination (CUPED discipline)
    // micro-quantized half-up, so both engines replay bit-for-bit.
    "x13_acf" -> QueryDef(
      (s, dir) => TimeSeries.autocorrelation(
        t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("ts div 3600000000000").as("bucket"))
          .agg(count(lit(1)).as("n")),
        "event_type", "bucket", "n", maxLag = 26),
      Some("""WITH s AS (SELECT event_type,
                     epoch_ns(ts) // 3600000000000 AS bucket,
                     CAST(count(*) AS BIGINT) AS n
                     FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, bucket, n,
                           CAST(row_number() OVER (PARTITION BY event_type
                             ORDER BY bucket) AS BIGINT) AS rn
                    FROM s),
              lags AS (SELECT CAST(unnest(generate_series(1, 26)) AS INT)
                         AS lag_k),
              p AS (SELECT a.event_type, l.lag_k, a.n AS xv, b.n AS yv
                    FROM r a CROSS JOIN lags l
                    JOIN r b ON b.event_type = a.event_type
                            AND b.rn = a.rn + l.lag_k),
              pl AS (SELECT event_type, lag_k,
                            CAST(count(*) AS BIGINT) AS n_pairs,
                            CAST(sum(xv) AS BIGINT) AS sa,
                            CAST(sum(yv) AS BIGINT) AS sb,
                            CAST(sum(xv * yv) AS BIGINT) AS sxy
                     FROM p GROUP BY 1, 2),
              pk AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                            CAST(sum(n) AS BIGINT) AS sx,
                            CAST(sum(n * n) AS BIGINT) AS sxx
                     FROM s GROUP BY 1),
              j AS (SELECT pl.event_type, pl.lag_k, pl.n_pairs, pl.sa,
                           pl.sb, pl.sxy, pk.n, pk.sx, pk.sxx,
                           CAST(pk.sx AS DOUBLE) / CAST(pk.n AS DOUBLE)
                             AS xbar
                    FROM pl JOIN pk ON pk.event_type = pl.event_type)
              SELECT event_type, lag_k, n_pairs,
                     CASE WHEN CAST(sxx AS DOUBLE) -
                               CAST(n AS DOUBLE) * xbar * xbar = 0.0
                          THEN NULL
                          ELSE CAST(floor((CAST(sxy AS DOUBLE)
                            - xbar * CAST(sa + sb AS DOUBLE)
                            + CAST(n_pairs AS DOUBLE) * xbar * xbar)
                            / (CAST(sxx AS DOUBLE)
                               - CAST(n AS DOUBLE) * xbar * xbar)
                            * 1e6 + 0.5) AS BIGINT)
                     END AS acf_micro
              FROM j"""),
      "autocorrelation function at row-lags 1..26 per event type"),

    // ---- KMV distinct sketch + set operations ----

    // The estimation-regime demonstration: ~59.8k distinct price points
    // sketched at k=512 (est lands within a few percent); the exact
    // count rides in-row as the hard gate. Keys are hashed from the
    // CENTS integer (not the double's string form) so the cross-engine
    // key rendering is unambiguous.
    "t36_kmv_distinct" -> QueryDef(
      (s, dir) => {
        val cents = t(s, dir, "lineitem").select(
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
            .cast("string").as("k"))
        val est = Sketches.kmvEstimate(Sketches.kmvSketch(cents, "k"))
        val exact = cents.agg(countDistinct("k").as("exact_distinct"))
        est.crossJoin(broadcast(exact))
      },
      Some(s"""WITH ks AS (
                 SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                        ::VARCHAR AS k
                 FROM lineitem),
               h AS (
                 SELECT DISTINCT ('0x' || substr(md5('kmv:' || k), 1, 12))
                        ::BIGINT AS h
                 FROM ks),
               sk AS (SELECT h FROM h ORDER BY h LIMIT 512),
               agg AS (SELECT CAST(count(*) AS BIGINT) AS k_used,
                              CAST(max(h) AS BIGINT) AS kth_hash FROM sk),
               ex AS (SELECT CAST(count(DISTINCT k) AS BIGINT)
                        AS exact_distinct FROM ks)
               SELECT k_used, kth_hash,
                      CAST(CASE WHEN k_used < 512 THEN k_used
                           ELSE (511 * 281474976710656) // kth_hash END
                        AS BIGINT) AS est_distinct,
                      exact_distinct
               FROM agg, ex"""),
      "KMV distinct sketch (Bar-Yossef/Beyer): k smallest hashes, exact gate"),

    // Set operations HLL cannot do: union AND intersection estimates from
    // one merged sketch. The two sets are the distinct price points of
    // low- vs high-quantity lineitems (~30k each, ~1.2k shared at
    // sf0.01) — a real partial-overlap regime. Exact union/intersection
    // ride in-row as the gate.
    "t37_kmv_setops" -> QueryDef(
      (s, dir) => {
        val cents = t(s, dir, "lineitem").select(
          col("l_quantity"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
            .cast("string").as("k"))
        val a = cents.filter(col("l_quantity") <= 25).select("k")
        val b = cents.filter(col("l_quantity") >= 25).select("k")
        val ops = Sketches.kmvSetOps(
          Sketches.kmvSketch(a, "k"), Sketches.kmvSketch(b, "k"))
        val exact = a.intersect(b).agg(count(lit(1)).as("exact_inter"))
          .crossJoin(a.unionByName(b).distinct()
            .agg(count(lit(1)).as("exact_union")))
        ops.crossJoin(broadcast(exact))
      },
      Some(s"""WITH ks AS (
                 SELECT l_quantity,
                        CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                        ::VARCHAR AS k
                 FROM lineitem),
               ta AS (SELECT DISTINCT ('0x' || substr(md5('kmv:' || k), 1, 12))
                        ::BIGINT AS h FROM ks WHERE l_quantity <= 25),
               tb AS (SELECT DISTINCT ('0x' || substr(md5('kmv:' || k), 1, 12))
                        ::BIGINT AS h FROM ks WHERE l_quantity >= 25),
               ska AS (SELECT h FROM ta ORDER BY h LIMIT 512),
               skb AS (SELECT h FROM tb ORDER BY h LIMIT 512),
               mg AS (SELECT DISTINCT h FROM
                        (SELECT h FROM ska UNION ALL SELECT h FROM skb)
                      ORDER BY h LIMIT 512),
               ag AS (SELECT CAST(count(*) AS BIGINT) AS k_used,
                             max(h) AS kth_hash FROM mg),
               ib AS (SELECT CAST(count(*) AS BIGINT) AS k_both FROM mg
                      WHERE h IN (SELECT h FROM ska)
                        AND h IN (SELECT h FROM skb)),
               eu AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS exact_union
                      FROM ks),
               ei AS (SELECT CAST(count(*) AS BIGINT) AS exact_inter FROM
                        (SELECT DISTINCT k FROM ks WHERE l_quantity <= 25
                         INTERSECT
                         SELECT DISTINCT k FROM ks WHERE l_quantity >= 25)),
               es AS (SELECT k_used,
                             CAST(CASE WHEN k_used < 512 THEN k_used
                                  ELSE (511 * 281474976710656) // kth_hash END
                               AS BIGINT) AS est_union
                      FROM ag)
               SELECT es.k_used, es.est_union, ib.k_both,
                      CAST(ib.k_both * es.est_union // es.k_used AS BIGINT)
                        AS est_inter,
                      CAST(ib.k_both * 1000 // es.k_used AS BIGINT)
                        AS jaccard_milli,
                      ei.exact_inter, eu.exact_union
               FROM es, ib, ei, eu"""),
      "KMV set ops (Beyer 2007): union + intersection from merged sketch"),

    // Incremental JOIN view maintenance: J_old, minus touched keys, plus
    // delta-joined news == full recompute of cur ⋈ customer (the oracle
    // IS the recompute, so a green hash proves the delta rule).
    "i7_join_ivm" -> QueryDef(
      (s, dir) => {
        val orders = t(s, dir, "orders").select(col("o_orderkey"),
          col("o_custkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("price_cents"))
        val cust = t(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_name"))
        val prevJoin = orders.join(cust, "o_custkey")
          .select("o_orderkey", "o_custkey", "price_cents", "c_name")
        val cur = orders.filter(col("o_orderkey") % 31 =!= 7)
          .withColumn("price_cents",
            when(col("o_orderkey") % 17 === 3, col("price_cents") + 1)
              .otherwise(col("price_cents")))
          .unionByName(orders.filter(col("o_orderkey") % 50 === 0)
            .withColumn("o_orderkey", col("o_orderkey") + 1000000L))
        val changes = graft.ext.Incremental.snapshotChanges(orders, cur,
          "o_orderkey", Seq("o_custkey", "price_cents"), version = 1L)
        graft.ext.Incremental.maintainJoin(prevJoin, cust, changes,
          "o_orderkey", "op", "o_custkey")
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS price_cents
                   FROM orders),
              cur AS (
                SELECT o_orderkey, o_custkey,
                       CASE WHEN o_orderkey % 17 = 3 THEN price_cents + 1
                            ELSE price_cents END AS price_cents
                FROM o WHERE o_orderkey % 31 <> 7
                UNION ALL
                SELECT o_orderkey + 1000000, o_custkey, price_cents
                FROM o WHERE o_orderkey % 50 = 0)
              SELECT cur.o_orderkey, cur.o_custkey, cur.price_cents,
                     c.c_name
              FROM cur JOIN customer c ON c.c_custkey = cur.o_custkey"""),
      "join IVM: delta-maintained A⋈B == full recompute (delta-join rule)"),

    // ---- privacy release ----

    // ε-DP Laplace counts with seeded deterministic noise (see
    // Privacy.scala header for the seed-secrecy contract). ε = 1.0,
    // release seed 42; the oracle replays the exact inverse-CDF draw.
    "dp1_noisy_counts" -> QueryDef(
      (s, dir) => Privacy.noisyCounts(t(s, dir, "events"),
        Seq("event_type"), epsilonMicro = 1000000L, seed = 42L),
      Some("""WITH g AS (SELECT event_type, count(*) AS n
                         FROM events GROUP BY 1),
              u AS (SELECT event_type, n,
                      ((('0x' || substr(md5('dp:42:' || event_type), 1, 12))
                        ::BIGINT + 0.5) / 281474976710656.0 - 0.5) AS u
                    FROM g),
              m AS (SELECT event_type, n, u,
                      CAST(floor(-ln(1 - 2 * abs(u)) * 1000000.0 + 0.5)
                        AS BIGINT) AS mag
                    FROM u)
              SELECT event_type,
                     CAST(CASE WHEN u < 0 THEN -mag ELSE mag END AS BIGINT)
                       AS noise_micro,
                     CAST(n * 1000000 +
                          CASE WHEN u < 0 THEN -mag ELSE mag END AS BIGINT)
                       AS n_released_micro
              FROM m"""),
      "ε-DP Laplace count release (seeded inverse-CDF, exact replay)"),

    // Water-filling budget allocation across language strata: cap C =
    // largest integer with sum(min(count, C)) <= budget (450 here — the
    // mixed regime: en capped at 168, the rest kept whole).
    "sp28_waterfill_budget" -> QueryDef(
      (s, dir) => graft.ext.Sampling.waterfillBudget(
        t(s, dir, "documents"), "lang", budget = 450L),
      Some("""WITH c AS (SELECT lang AS stratum,
                                CAST(count(*) AS BIGINT) AS n_docs
                         FROM documents GROUP BY 1),
              r AS (SELECT stratum, n_docs,
                           CAST(row_number() OVER (ORDER BY n_docs,
                             stratum) AS BIGINT) AS idx,
                           CAST(coalesce(sum(n_docs) OVER (
                             ORDER BY n_docs, stratum
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS BIGINT)
                             AS cum_before,
                           (SELECT CAST(count(*) AS BIGINT) FROM c)
                             AS n_strata
                    FROM c),
              cd AS (SELECT idx, n_docs,
                            CAST((450 - cum_before) //
                              (n_strata - idx + 1) AS BIGINT) AS cand
                     FROM r),
              cap AS (SELECT cand AS cap FROM cd WHERE cand < n_docs
                      ORDER BY idx LIMIT 1)
              SELECT c.stratum, c.n_docs, cap.cap,
                     CAST(CASE WHEN cap.cap IS NOT NULL
                          THEN least(c.n_docs, cap.cap)
                          ELSE c.n_docs END AS BIGINT) AS alloc
              FROM c LEFT JOIN cap ON TRUE"""),
      "water-filling budget allocator: common cap, small strata whole"),

    // Distinct-n diversity panel (Li et al. 2016) over the corpus: one
    // tokenization serves n = 1..3.
    "t44_distinct_ngrams" -> QueryDef(
      (s, dir) => graft.ext.TextAnalysis.distinctNgramDiversity(
        t(s, dir, "documents")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                         FROM documents),
              g1 AS (SELECT 1 AS ngram_n, unnest(w) AS gram FROM t),
              g2 AS (SELECT 2 AS ngram_n,
                       unnest([w[i] || ' ' || w[i+1]
                               for i in generate_series(1, len(w) - 1)])
                         AS gram
                     FROM t WHERE len(w) >= 2),
              g3 AS (SELECT 3 AS ngram_n,
                       unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in generate_series(1, len(w) - 2)])
                         AS gram
                     FROM t WHERE len(w) >= 3),
              g AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2
                    UNION ALL SELECT * FROM g3)
              SELECT ngram_n, CAST(count(*) AS BIGINT) AS n_total,
                     CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
                     CAST((1000000 * count(DISTINCT gram)) // count(*)
                       AS BIGINT) AS distinct_ppm
              FROM g GROUP BY 1"""),
      "distinct-n diversity: n-gram mass vs distinct n-grams, n=1..3"),

    // ---- leakage-safe temporal split ----

    // Purged time split (de Prado): cutoff at 80% of the span, 1-day
    // embargo before it absorbing trailing-window feature reach. Event
    // time at micros grain (the s2 convention).
    "sp27_time_split" -> QueryDef(
      (s, dir) => graft.ext.Sampling.timeSplit(
        t(s, dir, "events").select(col("event_id"),
          expr("ts div 1000").as("tsu")),
        "tsu", trainPct = 80, embargo = 86400000000L)
        .select(col("event_id"), col("split")),
      Some("""WITH b AS (SELECT min(epoch_us(ts)) AS t0,
                                max(epoch_us(ts)) AS t1 FROM events),
              c AS (SELECT t0 + (t1 - t0) * 80 // 100 AS cut FROM b)
              SELECT event_id,
                     CASE WHEN epoch_us(ts) >= cut THEN 'test'
                          WHEN epoch_us(ts) < cut - 86400000000
                            THEN 'train'
                          ELSE 'embargo' END AS split
              FROM events, c"""),
      "temporal split with embargo gap (purged split, leakage-safe)"),

    // ---- in-engine supervised classifier ----

    // Multinomial Naive Bayes language-ID: train on even doc_ids, score
    // odd, confusion matrix out. Training is exact counting; every log
    // term micro-quantizes BEFORE the document sum, so scores are exact
    // BIGINT and the argmax replays byte-for-byte.
    "ml1_naive_bayes" -> QueryDef(
      (s, dir) => graft.ext.NaiveBayes.confusion(
        t(s, dir, "documents"), "lang", col("doc_id") % 2 === 0),
      Some("""WITH tok AS (SELECT doc_id, lang, doc_id % 2 = 0 AS is_train,
                     unnest(string_split(text, ' ')) AS tok
                   FROM documents),
              ntc AS (SELECT lang AS cls, tok,
                             CAST(count(*) AS BIGINT) AS n_tc
                      FROM tok WHERE is_train GROUP BY 1, 2),
              nc AS (SELECT cls, CAST(sum(n_tc) AS BIGINT) AS n_c
                     FROM ntc GROUP BY 1),
              vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
                     FROM tok WHERE is_train),
              pri AS (SELECT lang AS cls, count(*) AS d_c
                      FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
              dt AS (SELECT count(*) AS d
                     FROM documents WHERE doc_id % 2 = 0),
              grid AS (SELECT nc.cls, nc.n_c, vv.v,
                              CAST(floor(ln(CAST(pri.d_c AS DOUBLE) / dt.d)
                                * 1e6 + 0.5) AS BIGINT) AS prior_q
                       FROM nc JOIN pri ON pri.cls = nc.cls, vv, dt),
              tt AS (SELECT doc_id, lang, tok FROM tok WHERE NOT is_train),
              ts AS (SELECT tt.doc_id, tt.lang, g.cls,
                            CAST(floor(ln(CAST(coalesce(n.n_tc, 0) + 1
                              AS DOUBLE) / (g.n_c + g.v)) * 1e6 + 0.5)
                              AS BIGINT) AS q
                     FROM tt CROSS JOIN grid g
                     LEFT JOIN ntc n ON n.cls = g.cls AND n.tok = tt.tok),
              ds AS (SELECT doc_id, lang, cls, sum(q) AS ll
                     FROM ts GROUP BY 1, 2, 3),
              sc AS (SELECT ds.doc_id, ds.lang, ds.cls,
                            ds.ll + g.prior_q AS score
                     FROM ds JOIN grid g ON g.cls = ds.cls),
              pr2 AS (SELECT doc_id, lang AS label_true,
                             cls AS label_pred,
                             row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, cls) AS rn
                      FROM sc)
              SELECT label_true, label_pred,
                     CAST(count(*) AS BIGINT) AS n_docs
              FROM pr2 WHERE rn = 1 GROUP BY 1, 2"""),
      "multinomial Naive Bayes language-ID: exact-integer confusion matrix"),

    // Feature hashing (Weinberger 2009): vocabulary-free sparse
    // featurization into 1024 signed buckets — exact integer weights.
    "ml2_hash_features" -> QueryDef(
      (s, dir) => graft.ext.NaiveBayes.hashFeatures(
        t(s, dir, "documents"), numBuckets = 1024),
      Some("""WITH tok AS (SELECT doc_id,
                     unnest(string_split(text, ' ')) AS tok
                   FROM documents),
              f AS (SELECT doc_id,
                           ('0x' || substr(md5('61:' || tok), 1, 8))
                             ::BIGINT % 1024 AS bucket,
                           CASE WHEN ('0x' || substr(md5('62:' || tok), 1, 8))
                             ::BIGINT % 2 = 0 THEN 1 ELSE -1 END AS s
                    FROM tok),
              g AS (SELECT doc_id, bucket, CAST(sum(s) AS BIGINT) AS w
                    FROM f GROUP BY 1, 2)
              SELECT doc_id, bucket, w FROM g WHERE w <> 0"""),
      "feature hashing (signed hashing trick): vocabulary-free featurizer"),

    // ---- massive-data bootstrap ----

    // Poisson bootstrap CI (Chamandy 2012) on per-user purchase value:
    // deterministic seeded Poisson(1) weights (thresholds interpolated
    // from the SAME PoissonCdf48 array on both sides), exact integer
    // resample means, order-statistic interval over b=40 resamples.
    "ab3_bootstrap_ci" -> QueryDef(
      (s, dir) => graft.ext.Experiment.bootstrapCi(
        t(s, dir, "events").filter(col("event_type") === "purchase"),
        "user_id", "value", b = 40, alphaPct = 5, seed = 0L),
      Some {
        val wExpr = graft.ext.Experiment.PoissonCdf48
          .map(t => s"(CASE WHEN h >= $t THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH pu AS (SELECT user_id AS u,
                   CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))
                     AS BIGINT) AS x
                 FROM events WHERE event_type = 'purchase' GROUP BY 1),
            rep AS (SELECT u, x, r
                    FROM pu, generate_series(0, 39) AS g(r)),
            uw AS (SELECT u, x, r,
                          ('0x' || substr(md5('boot:0:' || u::VARCHAR
                            || ':' || r::VARCHAR), 1, 12))::BIGINT AS h
                   FROM rep),
            ww AS (SELECT r, x, ($wExpr) AS w FROM uw),
            mn AS (SELECT r,
                          CASE WHEN sum(w) > 0 THEN
                            CAST(sum(w * x) // sum(w) AS BIGINT)
                          ELSE 0 END AS mean_micro
                   FROM ww GROUP BY r),
            rk AS (SELECT mean_micro,
                          row_number() OVER (ORDER BY mean_micro, r) AS rk
                   FROM mn),
            ci AS (SELECT max(CASE WHEN rk = 2 THEN mean_micro END)
                            AS lo_micro,
                          max(CASE WHEN rk = 39 THEN mean_micro END)
                            AS hi_micro
                   FROM rk),
            pt AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                          CAST(sum(x) // count(*) AS BIGINT) AS mean_micro
                   FROM pu)
            SELECT n_users, mean_micro, lo_micro, hi_micro,
                   CAST(40 AS INTEGER) AS b_resamples
            FROM pt, ci"""
      },
      "Poisson-bootstrap CI (deterministic weights, exact replay)"),

    // Join-key skew audit — k1's pre-flight: Gini of the key-frequency
    // distribution (count-histogram grain) + hottest-key share, the
    // numbers that decide whether salting/AQE-skew-split is worth wiring
    // in BEFORE the join runs.
    "dq12_key_skew" -> QueryDef(
      (s, dir) => graft.ext.Profile.keySkewAudit(
        t(s, dir, "lineitem"), "l_partkey"),
      Some("""WITH counts AS (SELECT l_partkey, count(*) AS c
                              FROM lineitem GROUP BY 1),
              hist AS (SELECT c, CAST(count(*) AS BIGINT) AS m
                       FROM counts GROUP BY c),
              rk AS (SELECT c, m,
                            coalesce(sum(m) OVER (ORDER BY c
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS k_before
                     FROM hist),
              agg AS (SELECT CAST(sum(m) AS BIGINT) AS n_keys,
                             CAST(sum(c * m) AS BIGINT) AS n_rows,
                             CAST(max(c) AS BIGINT) AS max_count,
                             CAST(sum(c * (m * k_before
                               + m * (m + 1) // 2)) AS BIGINT) AS s_rank
                      FROM rk)
              SELECT n_keys, n_rows, max_count,
                     CAST((1000000 * max_count) // n_rows AS BIGINT)
                       AS top1_ppm,
                     CAST((2 * s_rank * 1000000) // (n_keys * n_rows)
                          - ((n_keys + 1) * 1000000) // n_keys AS BIGINT)
                       AS gini_ppm
              FROM agg"""),
      "join-key skew audit: Gini + hottest-key share (salting pre-flight)"),

    // Cohort retention matrix: users cohorted by first-activity day,
    // per-(cohort, age) active share in exact ppm — the vintage decay
    // triangle behind s9's daily flows.
    "s12_cohort_retention" -> QueryDef(
      (s, dir) => Attribution.cohortRetention(t(s, dir, "events")),
      Some("""WITH act AS (SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day FROM events),
              ch AS (SELECT user_id, min(day) AS cohort_day
                     FROM act GROUP BY 1),
              sz AS (SELECT cohort_day,
                            CAST(count(*) AS BIGINT) AS n_cohort
                     FROM ch GROUP BY 1),
              cell AS (SELECT ch.cohort_day,
                              act.day - ch.cohort_day AS age_days,
                              CAST(count(*) AS BIGINT) AS n_active
                       FROM act JOIN ch ON ch.user_id = act.user_id
                       GROUP BY 1, 2)
              SELECT cell.cohort_day, cell.age_days, sz.n_cohort,
                     cell.n_active,
                     CAST((cell.n_active * 1000000) // sz.n_cohort
                       AS BIGINT) AS ret_ppm
              FROM cell JOIN sz ON sz.cohort_day = cell.cohort_day"""),
      "cohort retention triangle: per-vintage active share by age"),

    // Snapshot profile drift: even- vs odd-day snapshots of the event
    // feed profiled column-by-column (null rate / distinct count / mode
    // concentration, exact ppm integers) — the wide-and-shallow
    // upstream-breakage tripwire beside dq4's single-column PSI. The
    // value column pre-quantizes to centi-units: double→string
    // rendering is engine-specific, integers are not.
    "dq13_snapshot_drift" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").select(
          col("event_type"), col("props"),
          floor(col("value") * 100 + lit(0.5)).cast("long")
            .cast("string").as("value_centi"),
          expr("((ts div 1000) div 86400000000) % 2").as("__par"))
        graft.ext.Profile.snapshotDrift(
          ev.filter(col("__par") === 0L).drop("__par"),
          ev.filter(col("__par") === 1L).drop("__par"),
          Seq("event_type", "props", "value_centi"))
      },
      Some("""WITH ev AS (SELECT event_type, props,
                     CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                       AS VARCHAR) AS value_centi,
                     (epoch_us(ts) // 86400000000) % 2 AS par
                   FROM events),
              m AS (SELECT par, 'event_type' AS col_name, event_type AS v
                    FROM ev
                    UNION ALL SELECT par, 'props', props FROM ev
                    UNION ALL SELECT par, 'value_centi', value_centi
                    FROM ev),
              base AS (SELECT par, col_name,
                              CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(CASE WHEN v IS NULL THEN 1
                                       ELSE 0 END) AS BIGINT) AS nn,
                              CAST(count(DISTINCT v) AS BIGINT) AS nd
                       FROM m GROUP BY 1, 2),
              f AS (SELECT par, col_name, v, count(*) AS c
                    FROM m WHERE v IS NOT NULL GROUP BY 1, 2, 3),
              mx AS (SELECT par, col_name, CAST(max(c) AS BIGINT) AS cmax
                     FROM f GROUP BY 1, 2),
              pr AS (SELECT b.par, b.col_name, b.n, b.nd,
                            CAST((b.nn * 1000000) // b.n AS BIGINT)
                              AS null_ppm,
                            CAST(coalesce((mx.cmax * 1000000) // b.n, 0)
                              AS BIGINT) AS top_ppm
                     FROM base b LEFT JOIN mx
                       ON mx.par = b.par AND mx.col_name = b.col_name)
              SELECT r.col_name, r.n AS n_ref, c.n AS n_cur,
                     r.null_ppm AS null_ppm_ref,
                     c.null_ppm AS null_ppm_cur,
                     r.nd AS distinct_ref, c.nd AS distinct_cur,
                     r.top_ppm AS top_share_ppm_ref,
                     c.top_ppm AS top_share_ppm_cur
              FROM pr r JOIN pr c ON r.col_name = c.col_name
                AND r.par = 0 AND c.par = 1"""),
      "per-column snapshot drift: null rate, distinct count, mode share"),

    // Vocabulary richness: bias-corrected Chao1 type estimate +
    // Good-Turing unseen mass from singleton/doubleton counts — how
    // much vocabulary the corpus has NOT yet seen (t40's Zipf slope
    // reads the distribution; this reads its open end).
    "t45_vocab_richness" -> QueryDef(
      (s, dir) => graft.ext.TextAnalysis.vocabRichness(
        t(s, dir, "documents")),
      Some("""WITH f AS (SELECT unnest(string_split(text, ' ')) AS tok
                         FROM documents),
              c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                    FROM f GROUP BY 1),
              a AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
                           CAST(count(*) AS BIGINT) AS n_types,
                           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                             AS BIGINT) AS f1,
                           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                             AS BIGINT) AS f2
                    FROM c)
              SELECT n_tokens, n_types, f1, f2,
                     CAST(n_types + (f1 * (f1 - 1)) // (2 * (f2 + 1))
                       AS BIGINT) AS chao1_est,
                     CAST((f1 * 1000000) // n_tokens AS BIGINT)
                       AS gt_unseen_ppm,
                     CAST((f1 * 1000000) // n_types AS BIGINT)
                       AS singleton_ppm
              FROM a"""),
      "Chao1 + Good-Turing vocabulary-richness estimators"),

    // Clipped ROUGE-2 of each document's LEADING HALF against the full
    // text — the lead-bias coverage diagnostic (how much of a doc's
    // bigram content its opening already carries), and the gate for the
    // general (cand, ref) ROUGE-N eval operator.
    "t47_rouge2_lead" -> QueryDef(
      (s, dir) => graft.ext.TextAnalysis.rougeN(
        t(s, dir, "documents").select(col("doc_id").as("pair_id"),
          expr("array_join(slice(split(text, ' '), 1, " +
            "(size(split(text, ' ')) + 1) div 2), ' ')").as("cand"),
          col("text").as("ref")),
        n = 2),
      Some("""WITH p AS (SELECT doc_id AS pair_id,
                     array_to_string(string_split(text, ' ')[
                       1:(len(string_split(text, ' ')) + 1) // 2], ' ')
                       AS cand,
                     text AS ref
                   FROM documents),
              cg AS (SELECT pair_id,
                       unnest([w[i] || ' ' || w[i+1]
                               for i in generate_series(1, len(w) - 1)])
                         AS gram
                     FROM (SELECT pair_id, string_split(cand, ' ') AS w
                           FROM p) t
                     WHERE len(w) >= 2),
              cc AS (SELECT pair_id, gram,
                            CAST(count(*) AS BIGINT) AS c_cand
                     FROM cg GROUP BY 1, 2),
              rg AS (SELECT pair_id,
                       unnest([w[i] || ' ' || w[i+1]
                               for i in generate_series(1, len(w) - 1)])
                         AS gram
                     FROM (SELECT pair_id, string_split(ref, ' ') AS w
                           FROM p) t
                     WHERE len(w) >= 2),
              rc AS (SELECT pair_id, gram,
                            CAST(count(*) AS BIGINT) AS c_ref
                     FROM rg GROUP BY 1, 2),
              j AS (SELECT coalesce(cc.pair_id, rc.pair_id) AS pair_id,
                           coalesce(cc.c_cand, 0) AS c_cand,
                           coalesce(rc.c_ref, 0) AS c_ref
                    FROM cc FULL OUTER JOIN rc
                      ON rc.pair_id = cc.pair_id AND rc.gram = cc.gram),
              per AS (SELECT pair_id,
                             CAST(sum(c_cand) AS BIGINT) AS n_cand,
                             CAST(sum(c_ref) AS BIGINT) AS n_ref,
                             CAST(sum(least(c_cand, c_ref)) AS BIGINT)
                               AS n_overlap
                      FROM j GROUP BY 1)
              SELECT pair_id, n_cand, n_ref, n_overlap,
                     CASE WHEN n_cand = 0 THEN 0
                          ELSE CAST((n_overlap * 1000000) // n_cand
                            AS BIGINT) END AS p_ppm,
                     CASE WHEN n_ref = 0 THEN 0
                          ELSE CAST((n_overlap * 1000000) // n_ref
                            AS BIGINT) END AS r_ppm,
                     CASE WHEN n_cand = 0 OR n_ref = 0 OR n_overlap = 0
                          THEN 0
                          ELSE CAST(floor(2.0e0
                            * (CAST(n_overlap AS DOUBLE)
                               / CAST(n_cand AS DOUBLE))
                            * (CAST(n_overlap AS DOUBLE)
                               / CAST(n_ref AS DOUBLE))
                            / ((CAST(n_overlap AS DOUBLE)
                                / CAST(n_cand AS DOUBLE))
                               + (CAST(n_overlap AS DOUBLE)
                                  / CAST(n_ref AS DOUBLE)))
                            * 1e6 + 0.5) AS BIGINT)
                     END AS f1_micro
              FROM per"""),
      "clipped ROUGE-2 of the leading half vs the full document"),

    // Reliability-diagram calibration: doc length (integer score) as a
    // predictor of lang='en', binned equal-width over the observed
    // range — per bin exact mean score and positive ppm. The magnitude
    // readout beside rank metrics (t29's nDCG family): a perfect
    // ranking can still be uncalibrated.
    "ml3_calibration" -> QueryDef(
      (s, dir) => graft.ext.Experiment.calibrationBins(
        t(s, dir, "documents").select(col("n_chars"),
          (col("lang") === "en").cast("long").as("is_en")),
        "n_chars", "is_en", nBins = 10),
      Some("""WITH b AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi
                         FROM documents),
              d AS (SELECT n_chars AS s,
                           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                    FROM documents)
              SELECT CASE WHEN b.hi = b.lo THEN 0
                          ELSE ((d.s - b.lo) * 10) // (b.hi - b.lo + 1)
                     END AS bin,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(d.s) // count(*) AS BIGINT) AS mean_score,
                     CAST((sum(d.y) * 1000000) // count(*) AS BIGINT)
                       AS pos_ppm
              FROM d, b GROUP BY 1"""),
      "calibration bins: mean score vs positive rate per decile"),

    // Mutual information lang ↔ source on the document corpus — the
    // mixture-confounding audit (sampling by source silently samples by
    // language when MI is high). Per-cell terms nano-quantized off ln
    // (PSI discipline), total an exact BIGINT.
    "dq14_mutual_info" -> QueryDef(
      (s, dir) => graft.ext.Profile.mutualInfo(
        t(s, dir, "documents"), "lang", "source"),
      Some("""WITH j AS (SELECT lang AS x, source AS y,
                     CAST(count(*) AS BIGINT) AS n_xy
                   FROM documents GROUP BY 1, 2),
              mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x
                     FROM j GROUP BY 1),
              my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y
                     FROM j GROUP BY 1),
              tt AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM j),
              t2 AS (SELECT j.n_xy, tt.n,
                       CAST(floor(CAST(j.n_xy AS DOUBLE)
                           / CAST(tt.n AS DOUBLE)
                         * ln(CAST(j.n_xy AS DOUBLE)
                             * CAST(tt.n AS DOUBLE)
                             / (CAST(mx.n_x AS DOUBLE)
                                * CAST(my.n_y AS DOUBLE)))
                         * 1e9 + 0.5) AS BIGINT) AS term
                     FROM j JOIN mx USING (x) JOIN my USING (y), tt)
              SELECT CAST(max(n) AS BIGINT) AS n_rows,
                     (SELECT CAST(count(*) AS BIGINT) FROM mx) AS n_x,
                     (SELECT CAST(count(*) AS BIGINT) FROM my) AS n_y,
                     CAST(count(*) AS BIGINT) AS n_cells,
                     CAST(sum(term) AS BIGINT) AS mi_nano
              FROM t2"""),
      "mutual information between lang and source (confounding audit)"),

    // Split-conformal coverage of the seasonal-baseline predictor
    // (x10's cells): even days calibrate the 90% conformal radius on
    // |n·1e6 − baseline|, odd days measure empirical coverage — the
    // distribution-free interval-validity audit. Exact order-statistic
    // radius, exact ppm coverage.
    "ml4_conformal_coverage" -> QueryDef(
      (s, dir) => {
        val cells = TimeSeries.seasonalDeviation(
          t(s, dir, "events"), "event_type", "ts")
          .select(
            (col("n") * 1000000 - col("baseline_micro"))
              .as("resid_micro"),
            (col("day") % 2 === 0).as("is_cal"))
        graft.ext.Experiment.conformalCoverage(cells, "resid_micro",
          "is_cal", alphaPct = 90)
      },
      Some("""WITH cells AS (SELECT event_type,
                     epoch_ns(ts) // 86400000000000 AS day,
                     (epoch_ns(ts) // 3600000000000) % 24 AS hod,
                     CAST(count(*) AS BIGINT) AS n
                     FROM events GROUP BY 1, 2, 3),
              span AS (SELECT max(day) - min(day) + 1 AS n_days
                       FROM cells),
              base AS (SELECT event_type, hod,
                              (CAST(sum(n) AS BIGINT) * 1000000) //
                                (SELECT n_days FROM span)
                                AS baseline_micro
                       FROM cells GROUP BY event_type, hod),
              sc AS (SELECT c.n * 1000000 - b.baseline_micro AS resid,
                            (c.day % 2 = 0) AS is_cal
                     FROM cells c JOIN base b
                       ON b.event_type = c.event_type
                      AND b.hod = c.hod),
              cnt AS (SELECT abs(resid) AS r,
                             CAST(count(*) AS BIGINT) AS c
                      FROM sc WHERE is_cal GROUP BY 1),
              tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_cal FROM cnt),
              rk AS (SELECT r, sum(c) OVER (ORDER BY r
                       ROWS UNBOUNDED PRECEDING) AS cum
                     FROM cnt),
              kq AS (SELECT n_cal,
                            least(n_cal, ((n_cal + 1) * 90 + 99) // 100)
                              AS k
                     FROM tot),
              q AS (SELECT min(r) AS q_resid FROM rk, kq
                    WHERE rk.cum >= kq.k),
              tst AS (SELECT abs(resid) AS r FROM sc WHERE NOT is_cal)
              SELECT kq.n_cal, CAST(count(*) AS BIGINT) AS n_test,
                     q.q_resid,
                     CAST(sum(CASE WHEN tst.r <= q.q_resid THEN 1
                              ELSE 0 END) AS BIGINT) AS n_covered,
                     CAST((sum(CASE WHEN tst.r <= q.q_resid THEN 1
                               ELSE 0 END) * 1000000) // count(*)
                       AS BIGINT) AS coverage_ppm
              FROM tst, q, kq GROUP BY kq.n_cal, q.q_resid"""),
      "split-conformal 90% radius + test-split empirical coverage"),

    // Top-20 consecutive event-type trigram paths — the dominant
    // three-step journeys above s7's pairwise Markov hop rates.
    "s11_event_trigrams" -> QueryDef(
      (s, dir) => Attribution.eventTrigrams(t(s, dir, "events"), 20),
      Some("""WITH g AS (SELECT user_id, event_type AS e1,
                     lead(event_type, 1) OVER w AS e2,
                     lead(event_type, 2) OVER w AS e3
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id))
              SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
              FROM g WHERE e3 IS NOT NULL
              GROUP BY 1, 2, 3
              ORDER BY n DESC, e1, e2, e3 LIMIT 20"""),
      "top-20 consecutive event-type trigram journeys"),

    // Declarative constraint suite over lineitem in ONE scan: not-null
    // keys, (orderkey, linenumber) uniqueness, and range checks —
    // violation counts per constraint (the Deequ shape). The discount
    // ceiling is deliberately set BELOW the data's max so the audit
    // demonstrably counts, not just passes.
    "dq15_constraint_suite" -> QueryDef(
      (s, dir) => graft.ext.Profile.constraintAudit(
        t(s, dir, "lineitem"),
        notNull = Seq("l_orderkey", "l_partkey"),
        uniqueKeys = Seq(Seq("l_orderkey", "l_linenumber")),
        checks = Seq(
          "qty_range" -> (col("l_quantity") >= 1 &&
            col("l_quantity") <= 50),
          "price_positive" -> (col("l_extendedprice") > 0),
          "discount_le_5pct" -> (col("l_discount") <= 0.05))),
      Some("""SELECT 'not_null:l_orderkey' AS constraint,
                     CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1
                              ELSE 0 END) AS BIGINT) AS n_violations
              FROM lineitem
              UNION ALL
              SELECT 'not_null:l_partkey',
                     CAST(sum(CASE WHEN l_partkey IS NULL THEN 1
                              ELSE 0 END) AS BIGINT)
              FROM lineitem
              UNION ALL
              SELECT 'unique:l_orderkey,l_linenumber',
                     CAST(count(*) - count(DISTINCT (l_orderkey,
                       l_linenumber)) AS BIGINT)
              FROM lineitem
              UNION ALL
              SELECT 'check:qty_range',
                     CAST(sum(CASE WHEN coalesce(l_quantity >= 1
                         AND l_quantity <= 50, false)
                       THEN 0 ELSE 1 END) AS BIGINT)
              FROM lineitem
              UNION ALL
              SELECT 'check:price_positive',
                     CAST(sum(CASE WHEN coalesce(l_extendedprice > 0,
                         false) THEN 0 ELSE 1 END) AS BIGINT)
              FROM lineitem
              UNION ALL
              SELECT 'check:discount_le_5pct',
                     CAST(sum(CASE WHEN coalesce(l_discount <= 0.05,
                         false) THEN 0 ELSE 1 END) AS BIGINT)
              FROM lineitem"""),
      "one-scan constraint suite: null/unique/range violation counts"),

    // Per-key exact deciles — the GROUPED order-statistic selection
    // whose cumulative window partitions BY KEY (dq11's single-
    // partition caveat removed by shape, not by bound): deciles of the
    // centi-quantized value per event type.
    "dq16_grouped_quantiles" -> QueryDef(
      (s, dir) => graft.ext.Profile.groupedOrderStats(
        t(s, dir, "events").select(col("event_type"),
          floor(col("value") * 100 + lit(0.5)).cast("long")
            .as("value_centi")),
        "event_type", "value_centi", k = 10),
      Some("""WITH d AS (SELECT event_type AS key,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq
                   FROM events WHERE value IS NOT NULL),
              c AS (SELECT key, vq, CAST(count(*) AS BIGINT) AS c
                    FROM d GROUP BY 1, 2),
              cum AS (SELECT key, vq,
                             CAST(sum(c) OVER (PARTITION BY key
                               ORDER BY vq ROWS UNBOUNDED PRECEDING)
                               AS BIGINT) AS cum
                      FROM c),
              tot AS (SELECT key, CAST(sum(c) AS BIGINT) AS n
                      FROM c GROUP BY 1),
              qs AS (SELECT CAST(unnest(generate_series(1, 10)) AS INT)
                       AS q)
              SELECT cum.key, qs.q, CAST(min(cum.vq) AS BIGINT) AS vq
              FROM cum JOIN tot ON tot.key = cum.key
              CROSS JOIN qs
              WHERE cum.cum >= (qs.q * tot.n + 9) // 10
              GROUP BY 1, 2"""),
      "per-event-type exact deciles (keyed order-stat selection)"),

    // Quantile-level drift: per-type value deciles on even- vs odd-day
    // snapshots, joined — WHERE in the distribution the shift lives
    // (dq4's PSI says how much mass moved; deciles say which quantiles
    // carried it). Pure composition of the grouped order-stat selection.
    "dq18_decile_drift" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_type"),
          floor(col("value") * 100 + lit(0.5)).cast("long")
            .as("value_centi"),
          expr("((ts div 1000) div 86400000000) % 2").as("__par"))
        def dec(par: Long, name: String) =
          graft.ext.Profile.groupedOrderStats(
            ev.filter(col("__par") === par).drop("__par"),
            "event_type", "value_centi", k = 10)
            .withColumnRenamed("vq", name)
        dec(0L, "vq_ref").join(dec(1L, "vq_cur"), Seq("key", "q"))
          .select(col("key"), col("q"), col("vq_ref"), col("vq_cur"),
            (col("vq_cur") - col("vq_ref")).as("shift_centi"))
      },
      Some("""WITH d AS (SELECT event_type AS key,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq,
                     (epoch_us(ts) // 86400000000) % 2 AS par
                   FROM events WHERE value IS NOT NULL),
              c AS (SELECT par, key, vq, CAST(count(*) AS BIGINT) AS c
                    FROM d GROUP BY 1, 2, 3),
              cum AS (SELECT par, key, vq,
                             CAST(sum(c) OVER (PARTITION BY par, key
                               ORDER BY vq ROWS UNBOUNDED PRECEDING)
                               AS BIGINT) AS cum
                      FROM c),
              tot AS (SELECT par, key, CAST(sum(c) AS BIGINT) AS n
                      FROM c GROUP BY 1, 2),
              qs AS (SELECT CAST(unnest(generate_series(1, 10)) AS INT)
                       AS q),
              dq AS (SELECT cum.par, cum.key, qs.q,
                            CAST(min(cum.vq) AS BIGINT) AS vq
                     FROM cum JOIN tot ON tot.par = cum.par
                                      AND tot.key = cum.key
                     CROSS JOIN qs
                     WHERE cum.cum >= (qs.q * tot.n + 9) // 10
                     GROUP BY 1, 2, 3)
              SELECT r.key, r.q, r.vq AS vq_ref, c.vq AS vq_cur,
                     c.vq - r.vq AS shift_centi
              FROM dq r JOIN dq c ON c.key = r.key AND c.q = r.q
                AND r.par = 0 AND c.par = 1"""),
      "per-type decile drift between even/odd-day snapshots"),

    // Funnel-stage latency quantiles: s2's view→click→purchase chain
    // per user, stage deltas in whole seconds, exact quartiles per
    // stage via the grouped order-stat selection — the "how long does
    // conversion take" readout above s2's "does it happen".
    "s13_funnel_latency" -> QueryDef(
      (s, dir) => graft.ext.Profile.groupedOrderStats(
        graft.ext.Attribution.funnelStageDeltas(t(s, dir, "events"))
          .select("stage", "delta_s"),
        "stage", "delta_s", k = 4),
      Some("""WITH v AS (
                SELECT user_id, min(epoch_us(ts)) AS t_view
                FROM events WHERE event_type = 'view' GROUP BY 1),
              c AS (
                SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
                FROM events e JOIN v ON e.user_id = v.user_id
                 AND epoch_us(e.ts) > v.t_view
                WHERE e.event_type = 'click' GROUP BY 1),
              p AS (
                SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
                FROM events e JOIN c ON e.user_id = c.user_id
                 AND epoch_us(e.ts) > c.t_click
                WHERE e.event_type = 'purchase' GROUP BY 1),
              d AS (SELECT 'view->click' AS key,
                           (c.t_click - v.t_view) // 1000000 AS vq
                    FROM v JOIN c USING (user_id)
                    UNION ALL
                    SELECT 'click->purchase',
                           (p.t_purchase - c.t_click) // 1000000
                    FROM c JOIN p USING (user_id)),
              cc AS (SELECT key, vq, CAST(count(*) AS BIGINT) AS c
                     FROM d GROUP BY 1, 2),
              cum AS (SELECT key, vq,
                             CAST(sum(c) OVER (PARTITION BY key
                               ORDER BY vq ROWS UNBOUNDED PRECEDING)
                               AS BIGINT) AS cum
                      FROM cc),
              tot AS (SELECT key, CAST(sum(c) AS BIGINT) AS n
                      FROM cc GROUP BY 1),
              qs AS (SELECT CAST(unnest(generate_series(1, 4)) AS INT)
                       AS q)
              SELECT cum.key, qs.q, CAST(min(cum.vq) AS BIGINT) AS vq
              FROM cum JOIN tot ON tot.key = cum.key
              CROSS JOIN qs
              WHERE cum.cum >= (qs.q * tot.n + 3) // 4
              GROUP BY 1, 2"""),
      "funnel-stage time-to-convert quartiles (grouped order stats)"),

    // ---- write-layout planning ----

    // Iceberg-style partition-transform menu evaluated against the data
    // in ONE scan: partition count / skew / mean occupancy per candidate
    // — the numbers that pick a 100-TB layout before anything is written.
    "z7_partition_plan" -> QueryDef(
      (s, dir) => graft.sources.WriteLayout.partitionPlan(
        t(s, dir, "events"),
        Seq(
          "bucket16_user" -> pmod(graft.ext.Dedup.seededHash(
            col("user_id").cast("string"), 63), lit(16L)),
          "bucket256_user" -> pmod(graft.ext.Dedup.seededHash(
            col("user_id").cast("string"), 63), lit(256L)),
          "day_ts" -> expr("(ts div 1000) div 86400000000"),
          "hour_ts" -> expr("(ts div 1000) div 3600000000"),
          "identity_type" -> col("event_type"))),
      Some("""WITH k AS (
                SELECT 'bucket16_user' AS transform,
                       ((('0x' || substr(md5('63:' || user_id::VARCHAR),
                         1, 8))::BIGINT) % 16)::VARCHAR AS key
                FROM events
                UNION ALL
                SELECT 'bucket256_user',
                       ((('0x' || substr(md5('63:' || user_id::VARCHAR),
                         1, 8))::BIGINT) % 256)::VARCHAR
                FROM events
                UNION ALL
                SELECT 'day_ts',
                       (epoch_us(ts) // 86400000000)::VARCHAR
                FROM events
                UNION ALL
                SELECT 'hour_ts',
                       (epoch_us(ts) // 3600000000)::VARCHAR
                FROM events
                UNION ALL
                SELECT 'identity_type', event_type FROM events),
              g AS (SELECT transform, key, count(*) AS cnt
                    FROM k GROUP BY 1, 2),
              a AS (SELECT transform,
                           CAST(count(*) AS BIGINT) AS n_partitions,
                           CAST(sum(cnt) AS BIGINT) AS n_rows,
                           CAST(max(cnt) AS BIGINT) AS max_rows
                    FROM g GROUP BY 1)
              SELECT transform, n_partitions, n_rows, max_rows,
                     CAST((1000000 * max_rows) // n_rows AS BIGINT)
                       AS top_share_ppm,
                     CAST(n_rows // n_partitions AS BIGINT) AS mean_rows
              FROM a"""),
      "partition-transform planner: count/skew/occupancy per candidate"),

    // ---- round-10 concentration / association / rank-test family ----

    // Lorenz curve of customer lifetime spend: share of total revenue
    // held by the bottom j/10 of customers — exact integer interpolation
    // inside tied-value groups, exact ppm shares, built on the shared
    // enforced-grain kernel (the value-concentration sibling of dq12's
    // key-frequency Gini).
    "dq17_lorenz" -> QueryDef(
      (s, dir) => graft.ext.Profile.lorenzCurve(
        t(s, dir, "orders").select(col("o_custkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("cents")),
        "o_custkey", "cents", k = 10),
      Some("""WITH pk AS (SELECT o_custkey,
                     CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS vq
                   FROM orders GROUP BY 1),
              c AS (SELECT vq, CAST(count(*) AS BIGINT) AS c
                    FROM pk GROUP BY 1),
              cum AS (SELECT vq, c,
                        CAST(sum(c) OVER (ORDER BY vq
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                        CAST(sum(vq * c) OVER (ORDER BY vq
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumv,
                        CAST(sum(c) OVER () AS BIGINT) AS n,
                        CAST(sum(vq * c) OVER () AS BIGINT) AS tv
                      FROM c),
              qs AS (SELECT CAST(unnest(generate_series(1, 10)) AS INT)
                       AS q),
              sel AS (SELECT qs.q, (qs.q * cum.n) // 10 AS rank,
                             cum.vq, cum.c, cum.cum, cum.cumv, cum.tv
                      FROM cum CROSS JOIN qs
                      WHERE cum.cum >= (qs.q * cum.n) // 10),
              g AS (SELECT q, min(vq) AS vq FROM sel GROUP BY 1)
              SELECT sel.q, CAST(sel.rank AS BIGINT) AS rank,
                     CAST(sel.cumv - sel.vq * sel.c
                          + (sel.rank - (sel.cum - sel.c)) * sel.vq
                       AS BIGINT) AS bottom_value,
                     sel.tv AS total_value,
                     CASE WHEN sel.tv = 0 THEN NULL
                          ELSE CAST(((sel.cumv - sel.vq * sel.c
                               + (sel.rank - (sel.cum - sel.c)) * sel.vq)
                             * 1000000) // sel.tv AS BIGINT)
                     END AS share_ppm
              FROM sel JOIN g ON g.q = sel.q AND g.vq = sel.vq"""),
      "Lorenz curve of customer spend: bottom-decile value shares"),

    // Mann-Whitney U rank-sum test on per-user value totals, arms by
    // user % 2 (the welch/cuped convention) — the distribution-free
    // significance readout a heavy-tailed revenue metric needs (no
    // single whale moves a rank sum by more than one rank). Doubled
    // ranks keep tie-averaged ranks exact integers.
    "ab6_mann_whitney" -> QueryDef(
      (s, dir) => graft.ext.Experiment.mannWhitney(t(s, dir, "events")),
      Some("""WITH u AS (SELECT user_id % 2 AS arm,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS x
                   FROM events GROUP BY user_id),
              c AS (SELECT x AS vq,
                      CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS c1,
                      CAST(count(*) AS BIGINT) AS c
                    FROM u GROUP BY 1),
              r AS (SELECT c1, c,
                      CAST(sum(c) OVER (ORDER BY vq
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                      CAST(sum(c) OVER () AS BIGINT) AS n
                    FROM c),
              a AS (SELECT max(n) AS n,
                      CAST(sum(c1) AS BIGINT) AS n1,
                      CAST(sum(c1 * (2 * (cum - c) + c + 1)) AS BIGINT)
                        AS r1d,
                      CAST(sum(c * c * c - c) AS BIGINT) AS tt
                    FROM r),
              d AS (SELECT n - n1 AS n0, n1,
                           2 * n1 * (n - n1) + n1 * (n1 + 1) - r1d
                             AS u1d,
                           tt, n
                    FROM a)
              SELECT CAST(n0 AS BIGINT) AS n0, n1,
                     CAST(u1d AS BIGINT) AS u1_doubled, tt AS tie_term,
                     CASE WHEN n1 < 1 OR n0 < 1
                            OR CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
                               / 12.0 * ((CAST(n AS DOUBLE) + 1.0)
                                 - CAST(tt AS DOUBLE)
                                   / (CAST(n AS DOUBLE)
                                      * (CAST(n AS DOUBLE) - 1.0))) = 0.0
                          THEN NULL
                          ELSE CAST(floor((CAST(u1d AS DOUBLE)
                                 - CAST(n1 AS DOUBLE)
                                   * CAST(n0 AS DOUBLE))
                               / (2.0 * sqrt(CAST(n1 AS DOUBLE)
                                   * CAST(n0 AS DOUBLE) / 12.0
                                 * ((CAST(n AS DOUBLE) + 1.0)
                                   - CAST(tt AS DOUBLE)
                                     / (CAST(n AS DOUBLE)
                                        * (CAST(n AS DOUBLE) - 1.0)))))
                               * 1e6 + 0.5) AS BIGINT)
                     END AS z_micro
              FROM d"""),
      "Mann-Whitney rank-sum z on per-user totals (tie-corrected)"),

    // Pearson chi-squared independence lang x source with Cramér's V —
    // the significance readout beside dq14's MI on the same contingency
    // table; zero-observed grid cells contribute their expected counts.
    "dq19_chi2" -> QueryDef(
      (s, dir) => graft.ext.Profile.chi2Independence(
        t(s, dir, "documents"), "lang", "source"),
      Some("""WITH j AS (SELECT lang AS x, source AS y,
                     CAST(count(*) AS BIGINT) AS n_xy
                   FROM documents
                   WHERE lang IS NOT NULL AND source IS NOT NULL
                   GROUP BY 1, 2),
              mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x
                     FROM j GROUP BY 1),
              my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y
                     FROM j GROUP BY 1),
              tt AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM j),
              grid AS (SELECT mx.n_x, my.n_y,
                              CAST(coalesce(j.n_xy, 0) AS BIGINT) AS o,
                              tt.n
                       FROM mx CROSS JOIN my
                       LEFT JOIN j ON j.x = mx.x AND j.y = my.y, tt),
              t2 AS (SELECT n,
                       CAST(floor((CAST(o AS DOUBLE)
                           - CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)
                             / CAST(n AS DOUBLE))
                         * (CAST(o AS DOUBLE)
                           - CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)
                             / CAST(n AS DOUBLE))
                         / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)
                            / CAST(n AS DOUBLE))
                         * 1e6 + 0.5) AS BIGINT) AS term
                     FROM grid),
              s AS (SELECT CAST(max(n) AS BIGINT) AS n_rows,
                      (SELECT CAST(count(*) AS BIGINT) FROM mx) AS n_x,
                      (SELECT CAST(count(*) AS BIGINT) FROM my) AS n_y,
                      CAST(count(*) AS BIGINT) AS n_cells,
                      CAST(sum(term) AS BIGINT) AS chi2_micro
                    FROM t2)
              SELECT n_rows, n_x, n_y, n_cells,
                     CAST((n_x - 1) * (n_y - 1) AS BIGINT) AS dof,
                     chi2_micro,
                     CASE WHEN (n_x - 1) * (n_y - 1) = 0 THEN NULL
                          ELSE CAST(floor(sqrt(
                              CAST(chi2_micro AS DOUBLE) / 1e6
                              / (CAST(n_rows AS DOUBLE)
                                 * CAST(least(n_x - 1, n_y - 1)
                                     AS DOUBLE)))
                            * 1e6 + 0.5) AS BIGINT)
                     END AS cramers_v_micro
              FROM s"""),
      "chi-squared independence lang x source + Cramér's V"),

    // Herfindahl-Hirschman source concentration per language — "is this
    // language's corpus one source in a trenchcoat": exact-ppm Σ share²
    // by integer cross-multiplication, top source share beside it.
    "dq20_hhi" -> QueryDef(
      (s, dir) => graft.ext.Profile.hhi(
          t(s, dir, "documents"), "lang", "source")
        .withColumnRenamed("group", "lang"),
      Some("""WITH c AS (SELECT lang, source,
                     CAST(count(*) AS BIGINT) AS c
                   FROM documents GROUP BY 1, 2),
              a AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n,
                           CAST(count(*) AS BIGINT) AS n_cats,
                           CAST(max(c) AS BIGINT) AS top_c,
                           CAST(sum(c * c) AS BIGINT) AS ss
                    FROM c GROUP BY 1)
              SELECT lang, n, n_cats,
                     CAST((top_c * 1000000) // n AS BIGINT)
                       AS top_share_ppm,
                     CAST((ss * 1000000) // (n * n) AS BIGINT) AS hhi_ppm
              FROM a"""),
      "HHI source concentration per language (mixture-health audit)"),

    // Jensen-Shannon divergence over the SAME en-vs-zh n_chars buckets
    // as the PSI drift gate — the symmetric, bounded (≤ ln 2) number to
    // threshold when snapshots can gain or lose whole modes (PSI's
    // smoothed one-sided terms still blow up there).
    "dq21_jsd" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.ext.Profile.jsdDrift(
          docs.filter(col("lang") === "en"),
          docs.filter(col("lang") === "zh"),
          "n_chars", bucketWidth = 50L)
      },
      Some("""WITH rb AS (SELECT CAST(floor(CAST(n_chars AS DOUBLE) / 50)
                       AS BIGINT) AS bucket,
                     CAST(count(*) AS BIGINT) AS n_ref
                   FROM documents WHERE lang = 'en' GROUP BY 1),
              cb AS (SELECT CAST(floor(CAST(n_chars AS DOUBLE) / 50)
                       AS BIGINT) AS bucket,
                     CAST(count(*) AS BIGINT) AS n_cur
                     FROM documents WHERE lang = 'zh' GROUP BY 1),
              j AS (SELECT coalesce(rb.bucket, cb.bucket) AS bucket,
                           CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
                           CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
                    FROM rb FULL OUTER JOIN cb ON rb.bucket = cb.bucket),
              tt AS (SELECT CAST(sum(n_ref) AS BIGINT) AS nr,
                            CAST(sum(n_cur) AS BIGINT) AS nc,
                            CAST(count(*) AS BIGINT) AS b
                     FROM j),
              pq AS (SELECT bucket, n_ref, n_cur,
                       CAST(n_ref + 1 AS DOUBLE) / CAST(nr + b AS DOUBLE)
                         AS p,
                       CAST(n_cur + 1 AS DOUBLE) / CAST(nc + b AS DOUBLE)
                         AS q
                     FROM j CROSS JOIN tt)
              SELECT bucket, n_ref, n_cur,
                     CAST(floor((p * ln(p / ((p + q) / 2.0))
                          + q * ln(q / ((p + q) / 2.0))) / 2.0
                       * 1e6 + 0.5) AS BIGINT) AS jsd_micro
              FROM pq"""),
      "Jensen-Shannon drift over the PSI gate's en-vs-zh buckets"),

    // Stationary distribution of the s7 Markov chain: 3 exact-ppm
    // power-iteration steps over the transition counts (truncating
    // integer division per out-edge, remainder on the '(lost)' row —
    // masses sum to exactly 1e6). The long-run occupancy readout above
    // s7's per-hop probabilities.
    "s16_markov_stationary" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val trans = t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("e_from"),
            lead(col("event_type"), 1).over(w).as("e_to"))
          .filter(col("e_to").isNotNull)
          .groupBy("e_from", "e_to").agg(count(lit(1)).as("n"))
        graft.ext.Graph.markovStationary(trans, iters = 3)
      },
      Some("""WITH g AS (SELECT event_type AS e_from,
                     lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY epoch_ns(ts), event_id) AS e_to
                   FROM events),
              c AS (SELECT e_from, e_to, CAST(count(*) AS BIGINT) AS n
                    FROM g WHERE e_to IS NOT NULL GROUP BY 1, 2),
              om AS (SELECT e_from, CAST(sum(n) AS BIGINT) AS n_out
                     FROM c GROUP BY 1),
              st AS (SELECT e_from AS state FROM c
                     UNION SELECT e_to FROM c),
              ns AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM st),
              p0 AS (SELECT state, CAST(1000000 // ns AS BIGINT) AS pi
                     FROM st, ns),
              p1 AS (SELECT state, CAST(sum(pi) AS BIGINT) AS pi FROM (
                       SELECT c.e_to AS state,
                              (p0.pi * c.n) // om.n_out AS pi
                       FROM p0 JOIN c ON c.e_from = p0.state
                       JOIN om ON om.e_from = p0.state
                       UNION ALL
                       SELECT p0.state, p0.pi FROM p0
                       LEFT JOIN om ON om.e_from = p0.state
                       WHERE om.e_from IS NULL) GROUP BY 1),
              p2 AS (SELECT state, CAST(sum(pi) AS BIGINT) AS pi FROM (
                       SELECT c.e_to AS state,
                              (p1.pi * c.n) // om.n_out AS pi
                       FROM p1 JOIN c ON c.e_from = p1.state
                       JOIN om ON om.e_from = p1.state
                       UNION ALL
                       SELECT p1.state, p1.pi FROM p1
                       LEFT JOIN om ON om.e_from = p1.state
                       WHERE om.e_from IS NULL) GROUP BY 1),
              p3 AS (SELECT state, CAST(sum(pi) AS BIGINT) AS pi FROM (
                       SELECT c.e_to AS state,
                              (p2.pi * c.n) // om.n_out AS pi
                       FROM p2 JOIN c ON c.e_from = p2.state
                       JOIN om ON om.e_from = p2.state
                       UNION ALL
                       SELECT p2.state, p2.pi FROM p2
                       LEFT JOIN om ON om.e_from = p2.state
                       WHERE om.e_from IS NULL) GROUP BY 1),
              f AS (SELECT st.state,
                           CAST(coalesce(p3.pi, 0) AS BIGINT) AS pi_ppm
                    FROM st LEFT JOIN p3 ON p3.state = st.state)
              SELECT state, pi_ppm FROM f
              UNION ALL
              SELECT '(lost)',
                     CAST(1000000 - (SELECT sum(pi_ppm) FROM f)
                       AS BIGINT)"""),
      "Markov stationary occupancy: 3 exact-ppm power steps over s7"),

    // Two-level exact deciles — dq11's selection with the
    // single-partition caveat LIFTED: bucket-grain cumulative (level 1)
    // + within-target-bucket selection under a PARTITIONED window
    // (level 2). The oracle is the UNBOUNDED global selection — the
    // two-level plan must land on bit-identical order statistics.
    // Since r11 dq11 itself rides the two-level kernel at the default
    // shift; this gate pins a SECOND bucket geometry (shift 12 — ~256×
    // more, narrower buckets) so bucketing provably cannot move the
    // selected statistics.
    "dq22_quantiles_twolevel" -> QueryDef(
      (s, dir) => graft.ext.Profile.orderStatQuantilesTwoLevel(
        t(s, dir, "lineitem"), "l_extendedprice", k = 10,
        bucketShift = 12),
      Some("""WITH vq AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                              AS BIGINT) AS vq
                          FROM lineitem
                          WHERE l_extendedprice IS NOT NULL),
              c1 AS (SELECT vq, CAST(count(*) AS BIGINT) AS c
                     FROM vq GROUP BY vq),
              n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c1),
              cum AS (SELECT vq, CAST(sum(c) OVER (ORDER BY vq
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                      FROM c1),
              qs AS (SELECT CAST(unnest(generate_series(1, 10)) AS INTEGER)
                              AS q)
              SELECT q, max(rank) AS rank, min(vq) AS vq
              FROM (SELECT qs.q, (qs.q * n1.n + 9) // 10 AS rank,
                           cum.vq, cum.cum
                    FROM cum CROSS JOIN n1 CROSS JOIN qs)
              WHERE cum >= rank GROUP BY q"""),
      "two-level exact deciles: the grain-bound caveat lifted"),

    // EXACT ROC-AUC of doc length as an is-english classifier — the
    // ranking-quality number beside ml3's calibration bins on the SAME
    // score/label pair (a score can rank perfectly and still be
    // uncalibrated, or vice versa; now both readouts exist). Ties at
    // the classic 0.5 via exact doubled ranks — no trapezoids, no
    // doubles anywhere.
    "ml5_roc_auc" -> QueryDef(
      (s, dir) => graft.ext.Experiment.rocAuc(
        t(s, dir, "documents").select(col("n_chars"),
          (col("lang") === "en").cast("long").as("is_en")),
        "n_chars", "is_en"),
      Some("""WITH d AS (SELECT n_chars AS vq,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                   FROM documents),
              c AS (SELECT vq, CAST(sum(y) AS BIGINT) AS c1,
                           CAST(count(*) AS BIGINT) AS c
                    FROM d GROUP BY 1),
              r AS (SELECT c1, c,
                      CAST(sum(c) OVER (ORDER BY vq
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                      CAST(sum(c) OVER () AS BIGINT) AS n
                    FROM c),
              a AS (SELECT max(n) AS n,
                      CAST(sum(c1) AS BIGINT) AS n1,
                      CAST(sum(c1 * (2 * (cum - c) + c + 1)) AS BIGINT)
                        AS r1d
                    FROM r)
              SELECT n1 AS n_pos, CAST(n - n1 AS BIGINT) AS n_neg,
                     CASE WHEN n1 < 1 OR n - n1 < 1 THEN NULL
                          ELSE CAST(((r1d - n1 * (n1 + 1)) * 1000000)
                            // (2 * n1 * (n - n1)) AS BIGINT)
                     END AS auc_ppm
              FROM a"""),
      "exact ROC-AUC via doubled ranks (n_chars as is-english score)"),

    // Isotonic (PAV) calibration of the SAME score/label pair as
    // ml3/ml5 — the monotone map that FIXES what ml3 measures, via the
    // exact minimax characterization at bin grain (ppm-floored
    // averages; floor is monotone, so the integer minimax equals the
    // floor of the rational one — no doubles, full hash gate).
    "ml6_isotonic_calibration" -> QueryDef(
      (s, dir) => graft.ext.Experiment.isotonicCalibration(
        t(s, dir, "documents").select(col("n_chars"),
          (col("lang") === "en").cast("long").as("is_en")),
        "n_chars", "is_en", nBins = 10),
      Some("""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS s,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                   FROM documents),
              bd AS (SELECT min(s) AS lo, max(s) AS hi FROM d),
              b AS (SELECT CASE WHEN hi = lo THEN 0
                                ELSE ((s - lo) * 10) // (hi - lo + 1)
                           END AS bin,
                           CAST(count(*) AS BIGINT) AS w,
                           CAST(sum(y) AS BIGINT) AS yy
                    FROM d CROSS JOIN bd GROUP BY 1),
              p AS (SELECT bin, w, yy,
                           CAST(sum(w) OVER (ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sw,
                           CAST(sum(yy) OVER (ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sy
                    FROM b),
              r AS (SELECT a.bin AS i, c.bin AS k,
                           (((c.sy - (a.sy - a.yy)) * 1000000)
                             // (c.sw - (a.sw - a.w))) AS r
                    FROM p a JOIN p c ON a.bin <= c.bin),
              f AS (SELECT bin, max(mr) AS iso_ppm FROM (
                      SELECT jj.bin, r.i, min(r.r) AS mr
                      FROM r JOIN p jj
                        ON r.i <= jj.bin AND jj.bin <= r.k
                      GROUP BY 1, 2)
                    GROUP BY 1)
              SELECT b.bin, b.w AS n, b.yy AS pos,
                     CAST((b.yy * 1000000) // b.w AS BIGINT) AS raw_ppm,
                     CAST(f.iso_ppm AS BIGINT) AS iso_ppm
              FROM b JOIN f ON f.bin = b.bin"""),
      "isotonic (PAV) calibration via the exact bin-grain minimax"),

    // Empirical-Bayes shrinkage of per-source english rates: the
    // method-of-moments Beta prior (centi-quantized off fixed-shape
    // doubles over exact moments) then pure-integer per-key shrinkage —
    // the small-n-source ranking fix a raw proportion cannot give.
    "dq29_eb_shrinkage" -> QueryDef(
      (s, dir) => graft.ext.Experiment.ebBetaShrink(
          t(s, dir, "documents").select(col("source"),
            (col("lang") === "en").cast("long").as("is_en")),
          "source", "is_en")
        .withColumnRenamed("key", "source"),
      Some("""WITH kk AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                       AS BIGINT) AS pos
                   FROM documents GROUP BY 1),
              k2 AS (SELECT source, n, pos,
                            CAST((pos * 1000000) // n AS BIGINT)
                              AS raw_ppm
                     FROM kk),
              m AS (SELECT CAST(count(*) AS BIGINT) AS kn,
                           CAST(sum(raw_ppm) AS BIGINT) AS sp,
                           CAST(sum(raw_ppm * raw_ppm) AS BIGINT) AS spp
                    FROM k2),
              ab AS (SELECT kn,
                       CAST(sp AS DOUBLE) / CAST(kn AS DOUBLE) / 1e6
                         AS mu,
                       (CAST(spp AS DOUBLE) / CAST(kn AS DOUBLE)
                         - (CAST(sp AS DOUBLE) / CAST(kn AS DOUBLE))
                           * (CAST(sp AS DOUBLE) / CAST(kn AS DOUBLE)))
                         / 1e12 AS v
                     FROM m),
              q AS (SELECT
                      CASE WHEN kn >= 2 AND v > 0 THEN
                        CAST(floor(mu * (mu * (1 - mu) / v - 1) * 100
                          + 0.5) AS BIGINT)
                      ELSE NULL END AS ac,
                      CASE WHEN kn >= 2 AND v > 0 THEN
                        CAST(floor((1 - mu) * (mu * (1 - mu) / v - 1)
                          * 100 + 0.5) AS BIGINT)
                      ELSE NULL END AS bc
                    FROM ab)
              SELECT k2.source, k2.n, k2.pos, k2.raw_ppm,
                     CASE WHEN q.ac IS NOT NULL AND q.ac >= 1
                               AND q.bc >= 1
                               AND q.ac <= 9000000000
                               AND q.bc <= 9000000000
                          THEN CAST(((k2.pos * 100 + q.ac) * 1000000)
                            // (k2.n * 100 + q.ac + q.bc) AS BIGINT)
                          ELSE NULL END AS eb_ppm
              FROM k2 CROSS JOIN q"""),
      "empirical-Bayes beta-binomial shrinkage of per-source rates"),

    // Two-proportion z on per-user purchase conversion — the canonical
    // rate A/B readout beside ab4's means test and ab6's rank test
    // (same arms, same unit): pooled-variance z as ONE fixed-shape
    // double over exact user counts, micro-quantized.
    "ab8_two_proportion" -> QueryDef(
      (s, dir) => graft.ext.Experiment.twoProportionZ(
        t(s, dir, "events")),
      Some("""WITH u AS (SELECT user_id,
                     CAST(max(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS conv
                   FROM events GROUP BY 1),
              a AS (SELECT user_id % 2 AS arm,
                           CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(conv) AS BIGINT) AS c
                    FROM u GROUP BY 1),
              o AS (SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
                           max(CASE WHEN arm = 0 THEN c END) AS c0,
                           max(CASE WHEN arm = 1 THEN n END) AS n1,
                           max(CASE WHEN arm = 1 THEN c END) AS c1
                    FROM a)
              SELECT n0, c0, n1, c1,
                     CAST((c0 * 1000000) // n0 AS BIGINT) AS p0_ppm,
                     CAST((c1 * 1000000) // n1 AS BIGINT) AS p1_ppm,
                     CASE WHEN n0 >= 1 AND n1 >= 1 AND c0 + c1 > 0
                               AND c0 + c1 < n0 + n1
                          THEN CAST(floor(
                            (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                              - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                            / sqrt(
                              (CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE))
                                / (CAST(n0 AS DOUBLE)
                                   + CAST(n1 AS DOUBLE))
                              * (1.0
                                - (CAST(c0 AS DOUBLE)
                                   + CAST(c1 AS DOUBLE))
                                  / (CAST(n0 AS DOUBLE)
                                     + CAST(n1 AS DOUBLE)))
                              * (1.0 / CAST(n0 AS DOUBLE)
                                 + 1.0 / CAST(n1 AS DOUBLE)))
                            * 1e6 + 0.5) AS BIGINT)
                          ELSE NULL END AS z_micro
              FROM o"""),
      "two-proportion pooled z on per-user purchase conversion"),

    // Kruskal-Wallis H across ALL event types' value distributions —
    // the k-group extension of ab6's two-arm rank test ("do any of the
    // k groups differ", assumption-free): exact x2 midranks + BIGINT
    // rank sums + tie term; the one cross-group double sum folds in
    // SORTED group order on both engines (Spark sorted-array aggregate
    // = DuckDB in-aggregate ORDER BY), so the double shape is one
    // documented sequential fold, never a reduction race.
    "ab9_kruskal_wallis" -> QueryDef(
      (s, dir) => graft.ext.Experiment.kruskalWallis(
        t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            floor(col("value") * 100 + lit(0.5)).cast("long")
              .as("value_centi")),
        "event_type", "value_centi"),
      Some("""WITH d AS (SELECT event_type AS g,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events
                   WHERE value IS NOT NULL AND event_type IS NOT NULL),
              cv AS (SELECT v, CAST(count(*) AS BIGINT) AS c
                     FROM d GROUP BY 1),
              mr AS (SELECT v,
                            2 * CAST(sum(c) OVER (ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                              - c + 1 AS r2,
                            c * c * c - c AS t3
                     FROM cv),
              sg AS (SELECT d.g, CAST(count(*) AS BIGINT) AS ng,
                            CAST(sum(mr.r2) AS BIGINT) AS s2
                     FROM d JOIN mr ON mr.v = d.v GROUP BY 1),
              tie AS (SELECT CAST(sum(t3) AS BIGINT) AS tie_sum FROM mr),
              a AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                           CAST(count(*) AS BIGINT) AS k_groups,
                           CAST(min(ng) AS BIGINT) AS nmin,
                           sum(CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                               / CAST(ng AS DOUBLE) ORDER BY g) AS ssq
                    FROM sg)
              SELECT a.n, a.k_groups, tie.tie_sum,
                     CASE WHEN a.n >= 2 THEN CAST(floor(
                       (3.0 * ssq / (CAST(n AS DOUBLE)
                          * (CAST(n AS DOUBLE) + 1.0))
                        - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS h_micro,
                     CASE WHEN a.n >= 2 AND
                       (1.0 - CAST(tie.tie_sum AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                            * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
                       > 0.0
                          THEN CAST(floor(
                       (3.0 * ssq / (CAST(n AS DOUBLE)
                          * (CAST(n AS DOUBLE) + 1.0))
                        - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                       / (1.0 - CAST(tie.tie_sum AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                            * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS h_tie_micro,
                     CASE WHEN a.k_groups >= 2 AND a.nmin >= 5
                          THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS approx_ok
              FROM a CROSS JOIN tie"""),
      "Kruskal-Wallis H across event types (tie-corrected, exact ranks)"),

    // Wilcoxon signed-rank on PAIRED per-user even-day vs odd-day spend
    // (centi sums) — the within-unit complement of ab6's independent
    // arms: each user is their own control, so cross-user variance
    // cancels and only the per-user CHANGE distribution is tested.
    // Zero-change users drop (the standard reduced-sample convention);
    // ranks/tie term exact x2 integers, z one fixed-shape double.
    "ab10_wilcoxon" -> QueryDef(
      (s, dir) => graft.ext.Experiment.wilcoxonSignedRank(
        t(s, dir, "events").filter(col("value").isNotNull)
          .groupBy("user_id")
          .agg(
            sum(when(expr("((ts div 1000) div 86400000000) % 2") === 0,
              floor(col("value") * 100 + lit(0.5)).cast("long"))
              .otherwise(0L)).as("even_centi"),
            sum(when(expr("((ts div 1000) div 86400000000) % 2") === 1,
              floor(col("value") * 100 + lit(0.5)).cast("long"))
              .otherwise(0L)).as("odd_centi")),
        "even_centi", "odd_centi"),
      Some("""WITH u AS (SELECT user_id,
                     CAST(sum(CASE WHEN (epoch_us(ts) // 86400000000)
                                % 2 = 0
                              THEN CAST(floor(value * 100 + 0.5)
                                     AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS x,
                     CAST(sum(CASE WHEN (epoch_us(ts) // 86400000000)
                                % 2 = 1
                              THEN CAST(floor(value * 100 + 0.5)
                                     AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS y
                   FROM events WHERE value IS NOT NULL GROUP BY 1),
              dd AS (SELECT y - x AS d, abs(y - x) AS a
                     FROM u WHERE y - x <> 0),
              ca AS (SELECT a, CAST(count(*) AS BIGINT) AS c
                     FROM dd GROUP BY 1),
              mr AS (SELECT a,
                            2 * CAST(sum(c) OVER (ORDER BY a
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                              - c + 1 AS r2,
                            c * c * c - c AS t3
                     FROM ca),
              tie AS (SELECT CAST(coalesce(sum(t3), 0) AS BIGINT)
                               AS tie_sum
                      FROM mr),
              ag AS (SELECT CAST(count(*) AS BIGINT) AS n_nonzero,
                            CAST(coalesce(sum(CASE WHEN dd.d > 0
                                   THEN mr.r2 ELSE 0 END), 0)
                              AS BIGINT) AS w2_pos
                     FROM dd JOIN mr ON mr.a = dd.a)
              SELECT n_nonzero, w2_pos, tie.tie_sum,
                     CASE WHEN n_nonzero >= 1 AND
                       (CAST(n_nonzero AS DOUBLE)
                          * (CAST(n_nonzero AS DOUBLE) + 1.0)
                          * (2.0 * CAST(n_nonzero AS DOUBLE) + 1.0)
                          / 6.0
                        - CAST(tie.tie_sum AS DOUBLE) / 12.0) > 0.0
                          THEN CAST(floor(
                       (CAST(w2_pos AS DOUBLE)
                        - CAST(n_nonzero AS DOUBLE)
                          * (CAST(n_nonzero AS DOUBLE) + 1.0) / 2.0)
                       / sqrt(CAST(n_nonzero AS DOUBLE)
                          * (CAST(n_nonzero AS DOUBLE) + 1.0)
                          * (2.0 * CAST(n_nonzero AS DOUBLE) + 1.0)
                          / 6.0
                        - CAST(tie.tie_sum AS DOUBLE) / 12.0)
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS z_micro,
                     CASE WHEN n_nonzero >= 10 THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS approx_ok
              FROM ag CROSS JOIN tie"""),
      "Wilcoxon signed-rank z on paired per-user even/odd-day spend"),

    // Friedman test on day-blocks x event-type treatments (daily counts,
    // blocks COMPLETED with zero cells so the complete-block contract
    // holds by construction) — the k-treatment PAIRED rank test that
    // completes the family's 2x2 (MW/KW independent, Wilcoxon/this
    // paired): day effects cancel by ranking WITHIN each day. q_num and
    // q_den are exact BIGINTs on the x2-rank scale (Conover's
    // tie-corrected form), so the oracle hashes the statistic's exact
    // integer moments, not just the rounded double.
    "ab11_friedman" -> QueryDef(
      (s, dir) => {
        val cnt = t(s, dir, "events")
          .groupBy(expr("(ts div 1000) div 86400000000").as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val full = cnt.select("day").distinct()
          .crossJoin(cnt.select("event_type").distinct())
          .join(cnt, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"),
            coalesce(col("n"), lit(0L)).as("n"))
        graft.ext.Experiment.friedman(full, "day", "event_type", "n")
      },
      Some("""WITH cnt AS (SELECT epoch_us(ts) // 86400000000 AS day,
                     event_type, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
              f AS (SELECT d.day, t.event_type,
                           CAST(coalesce(cnt.n, 0) AS BIGINT) AS v
                    FROM (SELECT DISTINCT day FROM cnt) d
                    CROSS JOIN (SELECT DISTINCT event_type FROM cnt) t
                    LEFT JOIN cnt ON cnt.day = d.day
                      AND cnt.event_type = t.event_type),
              bc AS (SELECT day, v, CAST(count(*) AS BIGINT) AS c
                     FROM f GROUP BY 1, 2),
              mr AS (SELECT day, v,
                            2 * CAST(sum(c) OVER (PARTITION BY day
                              ORDER BY v ROWS UNBOUNDED PRECEDING)
                              AS BIGINT) - c + 1 AS r2
                     FROM bc),
              cells AS (SELECT f.day, f.event_type, mr.r2
                        FROM f JOIN mr ON mr.day = f.day AND mr.v = f.v),
              kn AS (SELECT CAST(count(DISTINCT day) AS BIGINT)
                              AS n_blocks,
                            CAST(count(DISTINCT event_type) AS BIGINT)
                              AS k_treatments
                     FROM f),
              bt AS (SELECT CAST(coalesce(sum(s2j * s2j), 0) AS BIGINT)
                              AS sr2sq
                     FROM (SELECT event_type,
                                  CAST(sum(r2) AS BIGINT) AS s2j
                           FROM cells GROUP BY 1)),
              sq AS (SELECT CAST(coalesce(sum(r2 * r2), 0) AS BIGINT)
                              AS s2
                     FROM cells)
              SELECT kn.n_blocks, kn.k_treatments,
                     CAST((kn.k_treatments - 1) * (bt.sr2sq
                       - kn.n_blocks * kn.n_blocks * kn.k_treatments
                         * (kn.k_treatments + 1) * (kn.k_treatments + 1))
                       AS BIGINT) AS q_num,
                     CAST(sq.s2 - kn.n_blocks * kn.k_treatments
                       * (kn.k_treatments + 1) * (kn.k_treatments + 1)
                       AS BIGINT) AS q_den,
                     CASE WHEN (sq.s2 - kn.n_blocks * kn.k_treatments
                            * (kn.k_treatments + 1)
                            * (kn.k_treatments + 1)) > 0
                          THEN CAST(floor(
                       CAST((kn.k_treatments - 1) * (bt.sr2sq
                         - kn.n_blocks * kn.n_blocks * kn.k_treatments
                           * (kn.k_treatments + 1)
                           * (kn.k_treatments + 1)) AS DOUBLE)
                       / CAST(sq.s2 - kn.n_blocks * kn.k_treatments
                           * (kn.k_treatments + 1)
                           * (kn.k_treatments + 1) AS DOUBLE)
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS q_micro,
                     CASE WHEN kn.n_blocks >= 10 THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS approx_ok
              FROM kn CROSS JOIN bt CROSS JOIN sq"""),
      "Friedman test: event types ranked within day blocks (daily counts)"),

    // Nemenyi post-hoc over the SAME day-block × event-type layout as
    // ab11 (r13 verdict next #5): ab11 answers "do ANY event types
    // consistently rank differently across days"; this names WHICH
    // pairs, one studentized-range-scale q per treatment pair off the
    // per-treatment rank sums the Friedman machinery already computes —
    // a k²-row relation, no new corpus pass. diff2 = R2_a − R2_b is an
    // exact BIGINT the oracle hashes beside the one fixed-shape double.
    "ab12_nemenyi" -> QueryDef(
      (s, dir) => {
        val cnt = t(s, dir, "events")
          .groupBy(expr("(ts div 1000) div 86400000000").as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val full = cnt.select("day").distinct()
          .crossJoin(cnt.select("event_type").distinct())
          .join(cnt, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"),
            coalesce(col("n"), lit(0L)).as("n"))
        graft.ext.Experiment.nemenyi(full, "day", "event_type", "n")
      },
      Some("""WITH cnt AS (SELECT epoch_us(ts) // 86400000000 AS day,
                     event_type, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
              f AS (SELECT d.day, t.event_type,
                           CAST(coalesce(cnt.n, 0) AS BIGINT) AS v
                    FROM (SELECT DISTINCT day FROM cnt) d
                    CROSS JOIN (SELECT DISTINCT event_type FROM cnt) t
                    LEFT JOIN cnt ON cnt.day = d.day
                      AND cnt.event_type = t.event_type),
              bc AS (SELECT day, v, CAST(count(*) AS BIGINT) AS c
                     FROM f GROUP BY 1, 2),
              mr AS (SELECT day, v,
                            2 * CAST(sum(c) OVER (PARTITION BY day
                              ORDER BY v ROWS UNBOUNDED PRECEDING)
                              AS BIGINT) - c + 1 AS r2
                     FROM bc),
              cells AS (SELECT f.day, f.event_type, mr.r2
                        FROM f JOIN mr ON mr.day = f.day AND mr.v = f.v),
              kn AS (SELECT CAST(count(DISTINCT day) AS BIGINT)
                              AS n_blocks,
                            CAST(count(DISTINCT event_type) AS BIGINT)
                              AS k_treatments
                     FROM f),
              bt AS (SELECT event_type,
                            CAST(sum(r2) AS BIGINT) AS s2j
                     FROM cells GROUP BY 1)
              SELECT a.event_type AS treat_a, b.event_type AS treat_b,
                     kn.n_blocks, kn.k_treatments,
                     a.s2j AS r2_sum_a, b.s2j AS r2_sum_b,
                     CAST(a.s2j - b.s2j AS BIGINT) AS diff2,
                     CASE WHEN kn.n_blocks >= 1 THEN CAST(floor(
                       CAST(a.s2j - b.s2j AS DOUBLE)
                       * sqrt(3.0 / (CAST(kn.n_blocks AS DOUBLE)
                           * CAST(kn.k_treatments AS DOUBLE)
                           * (CAST(kn.k_treatments AS DOUBLE) + 1.0)))
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS q_micro,
                     CASE WHEN kn.n_blocks >= 10 THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS approx_ok
              FROM bt a JOIN bt b ON a.event_type < b.event_type
              CROSS JOIN kn"""),
      "Nemenyi post-hoc: which event-type pairs rank apart across days"),

    // Cochran's Q on the binary "above-average day" panel — blocks =
    // days, treatments = event types, outcome = 1 iff that type's daily
    // count strictly exceeds its own mean daily count (cnt·n_days >
    // type_total — an exact integer comparison, no division): do the
    // types' above-average days CO-OCCUR or diverge, with day effects
    // cancelled. The binary corner of the paired k-treatment family
    // (MW/KW independent, Wilcoxon/Friedman paired ordinal, this paired
    // binary); q_num/q_den are exact BIGINTs end-to-end.
    "ab13_cochran_q" -> QueryDef(
      (s, dir) => {
        val cnt = t(s, dir, "events")
          .groupBy(expr("(ts div 1000) div 86400000000").as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val days = cnt.select("day").distinct()
        val full = days.crossJoin(cnt.select("event_type").distinct())
          .join(cnt, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"),
            coalesce(col("n"), lit(0L)).as("n"))
        val nd = days.agg(count(lit(1)).as("__ndays"))
        val tot = full.groupBy("event_type")
          .agg(sum("n").as("__tot"))
        val bin = full.join(tot, Seq("event_type"))
          .crossJoin(broadcast(nd))
          .select(col("day"), col("event_type"),
            when(col("n") * col("__ndays") > col("__tot"), lit(1L))
              .otherwise(lit(0L)).as("v"))
        graft.ext.Experiment.cochranQ(bin, "day", "event_type", "v")
      },
      Some("""WITH cnt AS (SELECT epoch_us(ts) // 86400000000 AS day,
                     event_type, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
              f AS (SELECT d.day, t.event_type,
                           CAST(coalesce(cnt.n, 0) AS BIGINT) AS n
                    FROM (SELECT DISTINCT day FROM cnt) d
                    CROSS JOIN (SELECT DISTINCT event_type FROM cnt) t
                    LEFT JOIN cnt ON cnt.day = d.day
                      AND cnt.event_type = t.event_type),
              nd AS (SELECT CAST(count(DISTINCT day) AS BIGINT)
                              AS ndays
                     FROM f),
              tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
                      FROM f GROUP BY 1),
              bin AS (SELECT f.day, f.event_type,
                             CASE WHEN f.n * nd.ndays > tot.tot
                                  THEN CAST(1 AS BIGINT)
                             ELSE CAST(0 AS BIGINT) END AS v
                      FROM f JOIN tot USING (event_type) CROSS JOIN nd),
              kn AS (SELECT CAST(count(DISTINCT day) AS BIGINT)
                              AS n_blocks,
                            CAST(count(DISTINCT event_type) AS BIGINT)
                              AS k_treatments
                     FROM bin),
              cs AS (SELECT CAST(coalesce(sum(cj * cj), 0) AS BIGINT)
                              AS sc2,
                            CAST(coalesce(sum(cj), 0) AS BIGINT)
                              AS t_total
                     FROM (SELECT event_type, CAST(sum(v) AS BIGINT)
                             AS cj
                           FROM bin GROUP BY 1)),
              rs AS (SELECT CAST(coalesce(sum(ri * ri), 0) AS BIGINT)
                              AS sr2
                     FROM (SELECT day, CAST(sum(v) AS BIGINT) AS ri
                           FROM bin GROUP BY 1))
              SELECT kn.n_blocks, kn.k_treatments, cs.t_total,
                     CAST((kn.k_treatments - 1)
                       * (kn.k_treatments * cs.sc2
                          - cs.t_total * cs.t_total) AS BIGINT) AS q_num,
                     CAST(kn.k_treatments * cs.t_total - rs.sr2
                       AS BIGINT) AS q_den,
                     CASE WHEN (kn.k_treatments * cs.t_total - rs.sr2)
                            > 0
                          THEN CAST(floor(
                       CAST((kn.k_treatments - 1)
                         * (kn.k_treatments * cs.sc2
                            - cs.t_total * cs.t_total) AS DOUBLE)
                       / CAST(kn.k_treatments * cs.t_total - rs.sr2
                           AS DOUBLE)
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS q_micro,
                     CASE WHEN kn.n_blocks * kn.k_treatments >= 24
                          THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS approx_ok
              FROM kn CROSS JOIN cs CROSS JOIN rs"""),
      "Cochran's Q: do event types' above-average days co-occur"),

    // Cliff's delta on the ab6 arms — the EFFECT SIZE beside ab6's
    // significance on the exact same per-user totals: ab6's z says the
    // arms differ, delta says by how much on the [-1,1] dominance scale.
    // n_gt/n_lt/n_tie are exact BIGINT pair counts computed from the
    // per-arm cumulatives (no O(n^2) pair join), so the oracle hashes
    // the complete dominance decomposition, not just the rounded delta.
    "ab14_cliffs_delta" -> QueryDef(
      (s, dir) => graft.ext.Experiment.cliffsDelta(t(s, dir, "events")),
      Some("""WITH u AS (SELECT user_id % 2 AS arm,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS x
                   FROM events GROUP BY user_id),
              c AS (SELECT x AS vq,
                      CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS c1,
                      CAST(count(*) AS BIGINT) AS c
                    FROM u GROUP BY 1),
              r AS (SELECT c1, c,
                      CAST(sum(c) OVER (ORDER BY vq
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                      CAST(sum(c1) OVER (ORDER BY vq
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
                      CAST(sum(c) OVER () AS BIGINT) AS n
                    FROM c),
              a AS (SELECT max(n) AS n,
                      CAST(coalesce(sum(c1), 0) AS BIGINT) AS n1,
                      CAST(coalesce(sum(c1 * ((cum - c) - (cum1 - c1))),
                        0) AS BIGINT) AS n_gt,
                      CAST(coalesce(sum(c1 * (c - c1)), 0) AS BIGINT)
                        AS n_tie
                    FROM r)
              SELECT CAST(n - n1 AS BIGINT) AS n0, n1, n_gt,
                     CAST(n1 * (n - n1) - n_gt - n_tie AS BIGINT)
                       AS n_lt,
                     n_tie,
                     CASE WHEN n1 >= 1 AND n - n1 >= 1
                          THEN CAST(floor(
                       CAST(n_gt - (n1 * (n - n1) - n_gt - n_tie)
                         AS DOUBLE)
                       / CAST(n1 * (n - n1) AS DOUBLE)
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS delta_micro
              FROM a"""),
      "Cliff's delta dominance effect size on the ab6 arms"),

    // Page's trend test on the ab11 panel with the lexical event-type
    // order as the hypothesized monotone ordering — the
    // ordered-alternative reading of the same day-block ranks: friedman
    // (ab11) asks "do ANY types differ", this asks "do they trend in
    // this order". l2/e_l2 are exact BIGINTs off the identical midrank
    // machinery, so the oracle hashes the exact trend moments plus the
    // no-ties-variance z and the ties_present honesty flag.
    "ab15_page_trend" -> QueryDef(
      (s, dir) => {
        val cnt = t(s, dir, "events")
          .groupBy(expr("(ts div 1000) div 86400000000").as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val full = cnt.select("day").distinct()
          .crossJoin(cnt.select("event_type").distinct())
          .join(cnt, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"),
            coalesce(col("n"), lit(0L)).as("n"))
        graft.ext.Experiment.pageTrend(full, "day", "event_type", "n")
      },
      Some("""WITH cnt AS (SELECT epoch_us(ts) // 86400000000 AS day,
                     event_type, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
              f AS (SELECT d.day, t.event_type,
                           CAST(coalesce(cnt.n, 0) AS BIGINT) AS v
                    FROM (SELECT DISTINCT day FROM cnt) d
                    CROSS JOIN (SELECT DISTINCT event_type FROM cnt) t
                    LEFT JOIN cnt ON cnt.day = d.day
                      AND cnt.event_type = t.event_type),
              bc AS (SELECT day, v, CAST(count(*) AS BIGINT) AS c
                     FROM f GROUP BY 1, 2),
              mr AS (SELECT day, v,
                            2 * CAST(sum(c) OVER (PARTITION BY day
                              ORDER BY v ROWS UNBOUNDED PRECEDING)
                              AS BIGINT) - c + 1 AS r2
                     FROM bc),
              cells AS (SELECT f.day, f.event_type, mr.r2
                        FROM f JOIN mr ON mr.day = f.day AND mr.v = f.v),
              kn AS (SELECT CAST(count(DISTINCT day) AS BIGINT)
                              AS n_blocks,
                            CAST(count(DISTINCT event_type) AS BIGINT)
                              AS k_treatments
                     FROM f),
              lt AS (SELECT CAST(coalesce(sum(pos * s2j), 0) AS BIGINT)
                              AS l2
                     FROM (SELECT CAST(row_number() OVER
                               (ORDER BY event_type) AS BIGINT) AS pos,
                             s2j
                           FROM (SELECT event_type,
                                   CAST(sum(r2) AS BIGINT) AS s2j
                                 FROM cells GROUP BY 1))),
              tp AS (SELECT CASE WHEN coalesce(max(c), 0) > 1
                              THEN CAST(1 AS BIGINT)
                            ELSE CAST(0 AS BIGINT) END AS ties_present
                     FROM bc),
              el AS (SELECT kn.n_blocks, kn.k_treatments, lt.l2,
                            tp.ties_present,
                            CAST((kn.n_blocks * kn.k_treatments
                              * (kn.k_treatments + 1)
                              * (kn.k_treatments + 1)) // 2 AS BIGINT)
                              AS e_l2
                     FROM kn CROSS JOIN lt CROSS JOIN tp)
              SELECT n_blocks, k_treatments, l2, e_l2, ties_present,
                     CASE WHEN k_treatments >= 2 AND n_blocks >= 1
                          THEN CAST(floor(
                       CAST(l2 - e_l2 AS DOUBLE)
                       / sqrt(CAST(n_blocks AS DOUBLE)
                         * CAST(k_treatments AS DOUBLE)
                         * CAST(k_treatments AS DOUBLE)
                         * (CAST(k_treatments AS DOUBLE) + 1.0)
                         * (CAST(k_treatments AS DOUBLE)
                            * CAST(k_treatments AS DOUBLE) - 1.0)
                         / 36.0)
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS z_micro,
                     CASE WHEN n_blocks >= 10 THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS approx_ok
              FROM el"""),
      "Page's trend test: do event types trend in lexical order"),

    // Jonckheere-Terpstra on per-type value distributions (the ab9 KW
    // input) with the lexical type order as the hypothesized monotone
    // ordering — completes the rank-test 2x3 grid (MW/Wilcoxon two-arm,
    // KW/Friedman k-arm any-alternative, JT/Page k-arm ORDERED,
    // independent x paired). j2/e_j2/var18 exact BIGINTs; the grid plan
    // (completed value x group cells, two exclusive windows) replays
    // verbatim in the oracle.
    "ab16_jonckheere" -> QueryDef(
      (s, dir) => graft.ext.Experiment.jonckheereTerpstra(
        t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq")),
        "event_type", "vq"),
      Some("""WITH d AS (SELECT event_type AS g,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events
                   WHERE value IS NOT NULL AND event_type IS NOT NULL),
              c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
                    FROM d GROUP BY 1, 2),
              sz AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng
                     FROM c GROUP BY 1),
              kn AS (SELECT CAST(coalesce(sum(ng), 0) AS BIGINT) AS n,
                            CAST(count(*) AS BIGINT) AS k_groups,
                            CAST(coalesce(min(ng), 0) AS BIGINT)
                              AS nmin,
                            CAST(coalesce(sum(ng * ng), 0) AS BIGINT)
                              AS sn2,
                            CAST(coalesce(sum(ng * ng * (2 * ng + 3)),
                              0) AS BIGINT) AS sn23
                     FROM sz),
              grid AS (SELECT gg.g, vv.v,
                              CAST(coalesce(c.c, 0) AS BIGINT) AS c
                       FROM (SELECT DISTINCT v FROM c) vv
                       CROSS JOIN (SELECT DISTINCT g FROM c) gg
                       LEFT JOIN c ON c.g = gg.g AND c.v = vv.v),
              cells AS (SELECT g, v, c,
                               CAST(coalesce(sum(c) OVER (PARTITION BY g
                                 ORDER BY v ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND 1 PRECEDING), 0)
                                 AS BIGINT) AS below
                        FROM grid),
              cells2 AS (SELECT g, v, c,
                                CAST(coalesce(sum(below) OVER
                                  (PARTITION BY v ORDER BY g
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS BIGINT)
                                  AS sbelow,
                                CAST(coalesce(sum(c) OVER
                                  (PARTITION BY v ORDER BY g
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS BIGINT)
                                  AS stie
                         FROM cells),
              sums AS (SELECT CAST(coalesce(sum(c * sbelow), 0)
                                AS BIGINT) AS gt,
                              CAST(coalesce(sum(c * stie), 0)
                                AS BIGINT) AS tie
                       FROM cells2),
              tp AS (SELECT CASE WHEN coalesce(max(cv), 0) > 1
                              THEN CAST(1 AS BIGINT)
                            ELSE CAST(0 AS BIGINT) END AS ties_present
                     FROM (SELECT v, CAST(sum(c) AS BIGINT) AS cv
                           FROM c GROUP BY 1)),
              fin AS (SELECT kn.n, kn.k_groups, kn.nmin,
                             CAST(2 * sums.gt + sums.tie AS BIGINT)
                               AS j2,
                             CAST((kn.n * kn.n - kn.sn2) // 2
                               AS BIGINT) AS e_j2,
                             CAST(kn.n * kn.n * (2 * kn.n + 3) - kn.sn23
                               AS BIGINT) AS var18,
                             tp.ties_present
                      FROM kn CROSS JOIN sums CROSS JOIN tp)
              SELECT n, k_groups, j2, e_j2, var18, ties_present,
                     CASE WHEN k_groups >= 2 AND var18 > 0
                          THEN CAST(floor(
                       CAST(j2 - e_j2 AS DOUBLE)
                       / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS z_micro,
                     CASE WHEN k_groups >= 2 AND nmin >= 8
                          THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS approx_ok
              FROM fin"""),
      "Jonckheere-Terpstra: do per-type values trend in lexical order"),

    // Per-type exact percentile-rank transform of event values — the
    // normalization table a feature pipeline joins back onto rows
    // (cume_dist as exact integer ppm, ties sharing their group rank);
    // the inverse view of dq16's "value at rank r".
    "dq23_percentile_xform" -> QueryDef(
      (s, dir) => graft.ext.Profile.percentileRanks(
          t(s, dir, "events").filter(col("value").isNotNull)
            .select(col("event_type"),
              floor(col("value") * 100 + lit(0.5)).cast("long")
                .as("value_centi")),
          "event_type", "value_centi")
        .withColumnRenamed("key", "event_type"),
      Some("""WITH d AS (SELECT event_type,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq
                   FROM events WHERE value IS NOT NULL),
              c AS (SELECT event_type, vq,
                           CAST(count(*) AS BIGINT) AS c
                    FROM d GROUP BY 1, 2),
              cum AS (SELECT event_type, vq, c,
                        CAST(sum(c) OVER (PARTITION BY event_type
                          ORDER BY vq ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS cum
                      FROM c),
              tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
                      FROM c GROUP BY 1)
              SELECT cum.event_type, cum.vq, cum.c, tot.n,
                     CAST((cum.cum * 1000000) // tot.n AS BIGINT)
                       AS pct_ppm
              FROM cum JOIN tot ON tot.event_type = cum.event_type"""),
      "per-type exact percentile-rank (cume_dist ppm) transform table"),

    // Mergeable quantile-sketch RELATION queried at the deciles (r10
    // verdict #1 — the missing member of the sketch family): base-2
    // log-bucketed histogram (DDSketch's fast/base-2 variant), ≤ ~2k
    // (lo, hi, c) rows at ANY cardinality, union-mergeable, streaming-
    // maintainable. All bucket math is integer bit arithmetic
    // (length(bin(v)) + shifts), so the sketch itself replays EXACTLY
    // in DuckDB — a full rows+hash gate, stronger than g6's rows-only.
    "dq24_qsketch_deciles" -> QueryDef(
      (s, dir) => graft.ext.Sketches.quantileSketchQuantiles(
        graft.ext.Sketches.quantileSketch(
          t(s, dir, "lineitem")
            .select(floor(col("l_extendedprice") * 100 + lit(0.5))
              .cast("long").as("vq")),
          "vq"),
        k = 10),
      Some("""WITH vq AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                              AS BIGINT) AS v
                          FROM lineitem
                          WHERE l_extendedprice IS NOT NULL),
              bk AS (SELECT ((v >> s) << s) AS lo,
                            (((v >> s) + 1) << s) - 1 AS hi,
                            CAST(count(*) AS BIGINT) AS c
                     FROM (SELECT v, greatest(0, length(bin(v)) - 6) AS s
                           FROM vq)
                     GROUP BY 1, 2),
              n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bk),
              cum AS (SELECT lo, hi, CAST(sum(c) OVER (ORDER BY lo
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                      FROM bk),
              qs AS (SELECT CAST(unnest(generate_series(1, 10))
                              AS INTEGER) AS q)
              SELECT q, max(rank) AS rank, min(lo) AS lo,
                     min_by(hi, lo) AS hi,
                     min(lo) + (min_by(hi, lo) - min(lo)) // 2 AS mid
              FROM (SELECT qs.q, (qs.q * n1.n + 9) // 10 AS rank,
                           cum.lo, cum.hi, cum.cum
                    FROM cum CROSS JOIN n1 CROSS JOIN qs)
              WHERE cum >= rank GROUP BY q"""),
      "quantile-sketch relation (base-2 DDSketch) queried at deciles"),

    // The sketch's HARD accuracy gate (the g6b posture, but fully
    // hash-gated): every decile's sketch bucket must BRACKET the exact
    // order statistic from the two-level kernel (lo ≤ exact ≤ hi —
    // guaranteed by construction, now measured), and the bucket width
    // must sit inside the 2^-5 relative envelope ((hi−lo+1)·32 ≤
    // max(lo, 32)). A sketch that drifted out of either bound fails the
    // gate loudly.
    "dq25_qsketch_bracket" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val exact = graft.ext.Profile.orderStatQuantilesTwoLevel(
          li, "l_extendedprice", k = 10).drop("rank")
        val sk = graft.ext.Sketches.quantileSketchQuantiles(
          graft.ext.Sketches.quantileSketch(
            li.select(floor(col("l_extendedprice") * 100 + lit(0.5))
              .cast("long").as("vq")),
            "vq"),
          k = 10).drop("rank")
        exact.join(sk, "q")
          .select(col("q"), col("vq"), col("lo"), col("hi"),
            col("vq").between(col("lo"), col("hi")).as("bracket_ok"),
            ((col("hi") - col("lo") + lit(1L)) * lit(32L) <=
              greatest(col("lo"), lit(32L))).as("width_ok"))
      },
      Some("""WITH vq AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                              AS BIGINT) AS v
                          FROM lineitem
                          WHERE l_extendedprice IS NOT NULL),
              c1 AS (SELECT v, CAST(count(*) AS BIGINT) AS c
                     FROM vq GROUP BY v),
              n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c1),
              cumx AS (SELECT v, CAST(sum(c) OVER (ORDER BY v
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                       FROM c1),
              qs AS (SELECT CAST(unnest(generate_series(1, 10))
                              AS INTEGER) AS q),
              ex AS (SELECT q, min(v) AS vq
                     FROM (SELECT qs.q, (qs.q * n1.n + 9) // 10 AS rank,
                                  cumx.v, cumx.cum
                           FROM cumx CROSS JOIN n1 CROSS JOIN qs)
                     WHERE cum >= rank GROUP BY q),
              bk AS (SELECT ((v >> s) << s) AS lo,
                            (((v >> s) + 1) << s) - 1 AS hi,
                            CAST(count(*) AS BIGINT) AS c
                     FROM (SELECT v, greatest(0, length(bin(v)) - 6) AS s
                           FROM vq)
                     GROUP BY 1, 2),
              cumb AS (SELECT lo, hi, CAST(sum(c) OVER (ORDER BY lo
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                       FROM bk),
              sk AS (SELECT q, min(lo) AS lo, min_by(hi, lo) AS hi
                     FROM (SELECT qs.q, (qs.q * n1.n + 9) // 10 AS rank,
                                  cumb.lo, cumb.hi, cumb.cum
                           FROM cumb CROSS JOIN n1 CROSS JOIN qs)
                     WHERE cum >= rank GROUP BY q)
              SELECT ex.q, ex.vq, sk.lo, sk.hi,
                     (ex.vq BETWEEN sk.lo AND sk.hi) AS bracket_ok,
                     ((sk.hi - sk.lo + 1) * 32 <= greatest(sk.lo, 32))
                       AS width_ok
              FROM ex JOIN sk ON sk.q = ex.q"""),
      "sketch deciles bracket the exact order statistics (hard gate)"),

    // GROUPED quantile sketch: per-event-type value quartile brackets
    // from one (group, lo, hi, c) hash-agg — the per-source latency /
    // per-type value profile at 100 TB without a per-group exact sort;
    // the per-group estimate sweeps a ≤2k-row partition.
    "dq26_qsketch_by_type" -> QueryDef(
      (s, dir) => graft.ext.Sketches.quantileSketchQuantilesBy(
          graft.ext.Sketches.quantileSketchBy(
            t(s, dir, "events").filter(col("value").isNotNull)
              .select(col("event_type"),
                floor(col("value") * 100 + lit(0.5)).cast("long")
                  .as("vq")),
            "event_type", "vq"),
          k = 4)
        .withColumnRenamed("group", "event_type"),
      Some("""WITH d AS (SELECT event_type,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events WHERE value IS NOT NULL),
              bk AS (SELECT event_type, ((v >> s) << s) AS lo,
                            (((v >> s) + 1) << s) - 1 AS hi,
                            CAST(count(*) AS BIGINT) AS c
                     FROM (SELECT event_type, v,
                                  greatest(0, length(bin(v)) - 6) AS s
                           FROM d)
                     GROUP BY 1, 2, 3),
              cum AS (SELECT event_type, lo, hi,
                             CAST(sum(c) OVER (PARTITION BY event_type
                               ORDER BY lo ROWS UNBOUNDED PRECEDING)
                               AS BIGINT) AS cum
                      FROM bk),
              tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
                      FROM bk GROUP BY 1),
              qs AS (SELECT CAST(unnest(generate_series(1, 4))
                              AS INTEGER) AS q)
              SELECT event_type, q, max(rank) AS rank, min(lo) AS lo,
                     min_by(hi, lo) AS hi,
                     min(lo) + (min_by(hi, lo) - min(lo)) // 2 AS mid
              FROM (SELECT cum.event_type, qs.q,
                           (qs.q * tot.n + 3) // 4 AS rank,
                           cum.lo, cum.hi, cum.cum
                    FROM cum JOIN tot USING (event_type) CROSS JOIN qs)
              WHERE cum >= rank GROUP BY event_type, q"""),
      "per-type quartile brackets from the grouped quantile sketch"),

    // The MERGE property proven UNDER THE ORACLE GATE: the Spark side
    // builds one sketch per order-key parity shard and merges
    // (union + (lo, hi) SUM — the per-shard/per-day artifact path at
    // 100 TB); the DuckDB oracle computes the whole-corpus sketch
    // directly. Hash equality IS the shard-merge ≡ whole claim, on
    // real data, not just the spec fixture.
    "dq27_qsketch_merge" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"),
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
              .as("vq"))
        val even = graft.ext.Sketches.quantileSketch(
          li.filter(col("l_orderkey") % 2 === 0).select("vq"), "vq")
        val odd = graft.ext.Sketches.quantileSketch(
          li.filter(col("l_orderkey") % 2 =!= 0).select("vq"), "vq")
        graft.ext.Sketches.quantileSketchQuantiles(
          graft.ext.Sketches.quantileSketchMerge(even, odd), k = 10)
      },
      Some("""WITH vq AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                              AS BIGINT) AS v
                          FROM lineitem
                          WHERE l_extendedprice IS NOT NULL),
              bk AS (SELECT ((v >> s) << s) AS lo,
                            (((v >> s) + 1) << s) - 1 AS hi,
                            CAST(count(*) AS BIGINT) AS c
                     FROM (SELECT v, greatest(0, length(bin(v)) - 6) AS s
                           FROM vq)
                     GROUP BY 1, 2),
              n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bk),
              cum AS (SELECT lo, hi, CAST(sum(c) OVER (ORDER BY lo
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                      FROM bk),
              qs AS (SELECT CAST(unnest(generate_series(1, 10))
                              AS INTEGER) AS q)
              SELECT q, max(rank) AS rank, min(lo) AS lo,
                     min_by(hi, lo) AS hi,
                     min(lo) + (min_by(hi, lo) - min(lo)) // 2 AS mid
              FROM (SELECT qs.q, (qs.q * n1.n + 9) // 10 AS rank,
                           cum.lo, cum.hi, cum.cum
                    FROM cum CROSS JOIN n1 CROSS JOIN qs)
              WHERE cum >= rank GROUP BY q"""),
      "shard-merged sketch deciles hash-equal the whole-corpus sketch"),

    // Value-distribution drift on LOG-scale buckets: JSD over the
    // quantile sketch's (lo, c) histograms of even- vs odd-day event
    // values — pure composition (the sketch relation IS a histogram,
    // so jsdFromBuckets consumes it unchanged). dq21's fixed-width
    // buckets resolve absolute ranges; these resolve relative shifts
    // (a 2x value inflation moves every log-bucket equally) — and the
    // streaming form is free, both pieces already maintain
    // incrementally.
    "dq28_qsketch_drift" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(expr("(ts div 1000) div 86400000000").as("day"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        val ref = graft.ext.Sketches.quantileSketch(
          ev.filter(col("day") % 2 === 0).select("vq"), "vq")
        val cur = graft.ext.Sketches.quantileSketch(
          ev.filter(col("day") % 2 =!= 0).select("vq"), "vq")
        graft.ext.Profile.jsdFromBuckets(
          ref.select(col("lo").as("bucket"), col("c").as("n_ref")),
          cur.select(col("lo").as("bucket"), col("c").as("n_cur")))
      },
      Some("""WITH d AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events WHERE value IS NOT NULL),
              rb AS (SELECT ((v >> s) << s) AS bucket,
                            CAST(count(*) AS BIGINT) AS n_ref
                     FROM (SELECT v, greatest(0, length(bin(v)) - 6) AS s
                           FROM d WHERE day % 2 = 0)
                     GROUP BY 1),
              cb AS (SELECT ((v >> s) << s) AS bucket,
                            CAST(count(*) AS BIGINT) AS n_cur
                     FROM (SELECT v, greatest(0, length(bin(v)) - 6) AS s
                           FROM d WHERE day % 2 = 1)
                     GROUP BY 1),
              j AS (SELECT coalesce(rb.bucket, cb.bucket) AS bucket,
                           CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
                           CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
                    FROM rb FULL OUTER JOIN cb ON rb.bucket = cb.bucket),
              tt AS (SELECT CAST(sum(n_ref) AS BIGINT) AS nr,
                            CAST(sum(n_cur) AS BIGINT) AS nc,
                            CAST(count(*) AS BIGINT) AS b
                     FROM j),
              pq AS (SELECT bucket, n_ref, n_cur,
                       CAST(n_ref + 1 AS DOUBLE) / CAST(nr + b AS DOUBLE)
                         AS p,
                       CAST(n_cur + 1 AS DOUBLE) / CAST(nc + b AS DOUBLE)
                         AS q
                     FROM j CROSS JOIN tt)
              SELECT bucket, n_ref, n_cur,
                     CAST(floor((p * ln(p / ((p + q) / 2.0))
                          + q * ln(q / ((p + q) / 2.0))) / 2.0
                       * 1e6 + 0.5) AS BIGINT) AS jsd_micro
              FROM pq"""),
      "JSD drift over log-scale quantile-sketch buckets (composition)"),

    // SIGNED quantile sketch, fully gated in the dq25 posture (r11
    // verdict #3: signed metrics — deltas, balances, residuals — had to
    // hand-roll offset shifts, the footgun the domain assert catches).
    // The metric is genuinely signed: each event value's deviation from
    // its event-type's exact lower median (centi-quantized). The sign-
    // split sketch (mirrored negative buckets, DDSketch's two-store
    // answer) keeps the 2^-subBits relative envelope on |v| on BOTH
    // sides — a global additive shift would land near-zero residuals in
    // ~2^56-wide buckets. Gate: every decile bracket must hold the
    // exact signed order statistic (two-level kernel, which shifts
    // internally and exactly) AND sit inside the |v| width envelope;
    // `mid` is the documented point-estimate convention riding along.
    "dq30_qsketch_signed" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vc"))
        val med = graft.ext.Profile.groupedOrderStats(
            ev, "event_type", "vc", k = 2)
          .filter(col("q") === 1)
          .select(col("key").as("event_type"), col("vq").as("med"))
        val dd = ev.join(med, "event_type")
          .select((col("vc") - col("med")).as("dv"))
        val sk = graft.ext.Sketches.quantileSketchQuantiles(
          graft.ext.Sketches.quantileSketchSigned(dd, "dv"), k = 10,
          signed = true).drop("rank")
        val exact = graft.ext.Profile.twoLevelRankSelect(
            dd.select(col("dv").as("vq")).groupBy("vq")
              .agg(count(lit(1)).as("c")),
            1 to 10, 9L, 10L, bucketShift = 20,
            maxGrain = graft.ext.Profile.MaxOrderStatDistinct,
            opName = "dq30_qsketch_signed")
          .select(col("q"), col("vq"))
        exact.join(sk, "q")
          .select(col("q"), col("vq"), col("lo"), col("hi"), col("mid"),
            col("vq").between(col("lo"), col("hi")).as("bracket_ok"),
            ((col("hi") - col("lo") + lit(1L)) * lit(32L) <=
              greatest(least(abs(col("lo")), abs(col("hi"))), lit(32L)))
              .as("width_ok"))
      },
      Some("""WITH d AS (SELECT event_type,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
                   FROM events WHERE value IS NOT NULL),
              c1 AS (SELECT event_type, vc, CAST(count(*) AS BIGINT) AS c
                     FROM d GROUP BY 1, 2),
              cum1 AS (SELECT event_type, vc,
                              CAST(sum(c) OVER (PARTITION BY event_type
                                ORDER BY vc ROWS UNBOUNDED PRECEDING)
                                AS BIGINT) AS cum
                       FROM c1),
              tot1 AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
                       FROM c1 GROUP BY 1),
              med AS (SELECT cum1.event_type, min(cum1.vc) AS med
                      FROM cum1 JOIN tot1 USING (event_type)
                      WHERE cum1.cum >= (tot1.n + 1) // 2 GROUP BY 1),
              dd AS (SELECT d.vc - med.med AS v
                     FROM d JOIN med USING (event_type)),
              c2 AS (SELECT v, CAST(count(*) AS BIGINT) AS c
                     FROM dd GROUP BY 1),
              n2 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c2),
              cum2 AS (SELECT v, CAST(sum(c) OVER (ORDER BY v
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                       FROM c2),
              qs AS (SELECT CAST(unnest(generate_series(1, 10))
                              AS INTEGER) AS q),
              ex AS (SELECT q, min(v) AS vq
                     FROM (SELECT qs.q, (qs.q * n2.n + 9) // 10 AS rank,
                                  cum2.v, cum2.cum
                           FROM cum2 CROSS JOIN n2 CROSS JOIN qs)
                     WHERE cum >= rank GROUP BY q),
              bk AS (SELECT CASE WHEN v >= 0 THEN ((a >> s) << s)
                            ELSE -((((a >> s) + 1) << s) - 1) END AS lo,
                            CASE WHEN v >= 0
                              THEN (((a >> s) + 1) << s) - 1
                            ELSE -((a >> s) << s) END AS hi,
                            CAST(count(*) AS BIGINT) AS c
                     FROM (SELECT v, abs(v) AS a,
                                  greatest(0, length(bin(abs(v))) - 6)
                                    AS s
                           FROM dd)
                     GROUP BY 1, 2),
              cumb AS (SELECT lo, hi, CAST(sum(c) OVER (ORDER BY lo
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                       FROM bk),
              sk AS (SELECT q, min(lo) AS lo, min_by(hi, lo) AS hi
                     FROM (SELECT qs.q, (qs.q * n2.n + 9) // 10 AS rank,
                                  cumb.lo, cumb.hi, cumb.cum
                           FROM cumb CROSS JOIN n2 CROSS JOIN qs)
                     WHERE cum >= rank GROUP BY q)
              SELECT ex.q, ex.vq, sk.lo, sk.hi,
                     sk.lo + (sk.hi - sk.lo) // 2 AS mid,
                     (ex.vq BETWEEN sk.lo AND sk.hi) AS bracket_ok,
                     ((sk.hi - sk.lo + 1) * 32 <=
                      greatest(least(abs(sk.lo), abs(sk.hi)), 32))
                       AS width_ok
              FROM ex JOIN sk ON sk.q = ex.q"""),
      "signed quantile sketch brackets exact median-deviation deciles"),

    // The mid convention CONSUMED downstream (r11 verdict #5's
    // rationale): per-type quartile point-estimate shift between
    // even/odd-day snapshots, both sides read from the grouped sketch's
    // documented mid readout — the drift threshold a dashboard compares
    // without re-deciding a convention, and the sketch-powered sibling
    // of dq23's exact decile drift (which needs the full value grain;
    // this needs ≤2k rows per side per type).
    "dq31_qsketch_shift" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(expr("((ts div 1000) div 86400000000) % 2").as("par"),
            col("event_type"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        def quart(par: Long) =
          graft.ext.Sketches.quantileSketchQuantilesBy(
            graft.ext.Sketches.quantileSketchBy(
              ev.filter(col("par") === par).select("event_type", "vq"),
              "event_type", "vq"), k = 4)
            .select(col("group"), col("q"), col("mid"))
        quart(0L).withColumnRenamed("mid", "mid_ref")
          .join(quart(1L).withColumnRenamed("mid", "mid_cur"),
            Seq("group", "q"))
          .select(col("group").as("event_type"), col("q"),
            col("mid_ref"), col("mid_cur"),
            (col("mid_cur") - col("mid_ref")).as("shift_centi"))
      },
      Some("""WITH d AS (SELECT (epoch_us(ts) // 86400000000) % 2
                       AS par, event_type,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events WHERE value IS NOT NULL),
              bk AS (SELECT par, event_type, ((v >> s) << s) AS lo,
                            (((v >> s) + 1) << s) - 1 AS hi,
                            CAST(count(*) AS BIGINT) AS c
                     FROM (SELECT par, event_type, v,
                                  greatest(0, length(bin(v)) - 6) AS s
                           FROM d)
                     GROUP BY 1, 2, 3, 4),
              cum AS (SELECT par, event_type, lo, hi,
                             CAST(sum(c) OVER (PARTITION BY par,
                               event_type ORDER BY lo
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
                               AS cum
                      FROM bk),
              tot AS (SELECT par, event_type, CAST(sum(c) AS BIGINT)
                               AS n
                      FROM bk GROUP BY 1, 2),
              qs AS (SELECT CAST(unnest(generate_series(1, 4))
                              AS INTEGER) AS q),
              dq AS (SELECT par, event_type, q,
                            min(lo) + (min_by(hi, lo) - min(lo)) // 2
                              AS mid
                     FROM (SELECT cum.par, cum.event_type, qs.q,
                                  (qs.q * tot.n + 3) // 4 AS rank,
                                  cum.lo, cum.hi, cum.cum
                           FROM cum JOIN tot USING (par, event_type)
                           CROSS JOIN qs)
                     WHERE cum >= rank GROUP BY 1, 2, 3)
              SELECT r.event_type, r.q, r.mid AS mid_ref,
                     c.mid AS mid_cur, c.mid - r.mid AS shift_centi
              FROM dq r JOIN dq c ON c.event_type = r.event_type
                AND c.q = r.q AND r.par = 0 AND c.par = 1"""),
      "per-type quartile mid-shift between sketch snapshots"),

    // GROUPED signed sketch, gated at RELATION grain (dq30 gates the
    // ungrouped signed readout, dq26 the grouped unsigned one; this
    // completes the matrix): each event type's deviations from its OWN
    // exact median held as a sign-split (lo, hi, c) relation — the
    // per-type residual profile at 100 TB, ≤ ~4k rows per type. Full
    // rows+hash oracle of the relation itself — the strongest gate a
    // sketch can carry.
    "dq32_qsketch_signed_by" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vc"))
        val med = graft.ext.Profile.groupedOrderStats(
            ev, "event_type", "vc", k = 2)
          .filter(col("q") === 1)
          .select(col("key").as("event_type"), col("vq").as("med"))
        graft.ext.Sketches.quantileSketchSignedBy(
            ev.join(med, "event_type")
              .select(col("event_type"),
                (col("vc") - col("med")).as("dv")),
            "event_type", "dv")
          .withColumnRenamed("group", "event_type")
      },
      Some("""WITH d AS (SELECT event_type,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
                   FROM events WHERE value IS NOT NULL),
              c1 AS (SELECT event_type, vc, CAST(count(*) AS BIGINT) AS c
                     FROM d GROUP BY 1, 2),
              cum1 AS (SELECT event_type, vc,
                              CAST(sum(c) OVER (PARTITION BY event_type
                                ORDER BY vc ROWS UNBOUNDED PRECEDING)
                                AS BIGINT) AS cum
                       FROM c1),
              tot1 AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
                       FROM c1 GROUP BY 1),
              med AS (SELECT cum1.event_type, min(cum1.vc) AS med
                      FROM cum1 JOIN tot1 USING (event_type)
                      WHERE cum1.cum >= (tot1.n + 1) // 2 GROUP BY 1),
              dd AS (SELECT d.event_type, d.vc - med.med AS v
                     FROM d JOIN med USING (event_type))
              SELECT event_type,
                     CASE WHEN v >= 0 THEN ((a >> s) << s)
                     ELSE -((((a >> s) + 1) << s) - 1) END AS lo,
                     CASE WHEN v >= 0 THEN (((a >> s) + 1) << s) - 1
                     ELSE -((a >> s) << s) END AS hi,
                     CAST(count(*) AS BIGINT) AS c
              FROM (SELECT event_type, v, abs(v) AS a,
                           greatest(0, length(bin(abs(v))) - 6) AS s
                    FROM dd)
              GROUP BY 1, 2, 3"""),
      "grouped signed sketch of per-type median deviations (hash gate)"),

    // Exact two-sample KS distance between even- and odd-day event
    // values — the full-value-grain drift statistic beside dq20/dq21/
    // dq28's bucketed mass moves: the largest ECDF gap anywhere, its
    // numerator an exact BIGINT cross-product both engines hash
    // identically (no doubles anywhere in the statistic).
    "dq33_ks_drift" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(expr("((ts div 1000) div 86400000000) % 2").as("par"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        graft.ext.Profile.ksTwoSample(
          ev.filter(col("par") === 0).select("vq"),
          ev.filter(col("par") === 1).select("vq"), "vq")
      },
      Some("""WITH d AS (SELECT (epoch_us(ts) // 86400000000) % 2
                       AS par,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events WHERE value IS NOT NULL),
              ca AS (SELECT v, CAST(count(*) AS BIGINT) AS cr
                     FROM d WHERE par = 0 GROUP BY 1),
              cb AS (SELECT v, CAST(count(*) AS BIGINT) AS cc
                     FROM d WHERE par = 1 GROUP BY 1),
              m AS (SELECT coalesce(ca.v, cb.v) AS v,
                           CAST(coalesce(cr, 0) AS BIGINT) AS cr,
                           CAST(coalesce(cc, 0) AS BIGINT) AS cc
                    FROM ca FULL OUTER JOIN cb ON cb.v = ca.v),
              t AS (SELECT CAST(sum(cr) AS BIGINT) AS na,
                           CAST(sum(cc) AS BIGINT) AS nb
                    FROM m),
              c AS (SELECT v,
                           CAST(sum(cr) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_a,
                           CAST(sum(cc) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_b
                    FROM m),
              mx AS (SELECT CAST(max(abs(c.cum_a * t.nb
                              - c.cum_b * t.na)) AS BIGINT) AS d_num
                     FROM c CROSS JOIN t)
              SELECT t.na AS n_ref, t.nb AS n_cur, mx.d_num,
                     CASE WHEN t.na > 0 AND t.nb > 0
                          THEN CAST((mx.d_num * 1000000)
                                 // (t.na * t.nb) AS BIGINT)
                     ELSE NULL END AS d_ppm
              FROM t CROSS JOIN mx"""),
      "exact two-sample KS distance between day-parity snapshots"),

    // GROUPED exact KS drift — dq33 lifted to per-type grain, the
    // "WHICH segment drifted" readout the rest of the drift family
    // already has: one exact KS row per event_type, the merged-value
    // cumulative partitioned BY GROUP (no global single-partition sweep
    // — this form scales BETTER than dq33's), the oracle literally
    // dq33's SQL with PARTITION BY event_type threaded through.
    "dq35_ks_drift_by" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("((ts div 1000) div 86400000000) % 2").as("par"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        graft.ext.Profile.ksTwoSampleBy(
            ev.filter(col("par") === 0).select("event_type", "vq"),
            ev.filter(col("par") === 1).select("event_type", "vq"),
            "event_type", "vq")
          .withColumnRenamed("group", "event_type")
      },
      Some("""WITH d AS (SELECT event_type,
                     (epoch_us(ts) // 86400000000) % 2 AS par,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events
                   WHERE value IS NOT NULL AND event_type IS NOT NULL),
              ca AS (SELECT event_type AS g, v,
                            CAST(count(*) AS BIGINT) AS cr
                     FROM d WHERE par = 0 GROUP BY 1, 2),
              cb AS (SELECT event_type AS g, v,
                            CAST(count(*) AS BIGINT) AS cc
                     FROM d WHERE par = 1 GROUP BY 1, 2),
              m AS (SELECT coalesce(ca.g, cb.g) AS g,
                           coalesce(ca.v, cb.v) AS v,
                           CAST(coalesce(cr, 0) AS BIGINT) AS cr,
                           CAST(coalesce(cc, 0) AS BIGINT) AS cc
                    FROM ca FULL OUTER JOIN cb
                      ON cb.g = ca.g AND cb.v = ca.v),
              t AS (SELECT g, CAST(sum(cr) AS BIGINT) AS na,
                           CAST(sum(cc) AS BIGINT) AS nb
                    FROM m GROUP BY 1),
              c AS (SELECT g, v,
                           CAST(sum(cr) OVER (PARTITION BY g ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_a,
                           CAST(sum(cc) OVER (PARTITION BY g ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_b
                    FROM m),
              mx AS (SELECT c.g, CAST(max(abs(c.cum_a * t.nb
                              - c.cum_b * t.na)) AS BIGINT) AS d_num
                     FROM c JOIN t USING (g) GROUP BY 1)
              SELECT t.g AS event_type, t.na AS n_ref, t.nb AS n_cur,
                     mx.d_num,
                     CASE WHEN t.na > 0 AND t.nb > 0
                          THEN CAST((mx.d_num * 1000000)
                                 // (t.na * t.nb) AS BIGINT)
                     ELSE NULL END AS d_ppm
              FROM t JOIN mx USING (g)"""),
      "per-type exact two-sample KS drift (grouped ECDF gap)"),

    // BUCKET-grain KS between the same day-parity snapshots — the
    // oracle-gated batch form of the STREAMING KS monitor's readout
    // (ksFromBuckets over maintained bucketCounts histograms): $10
    // buckets of the centi values, documented vs dq33's full value
    // grain (bucketing can only hide gap inside a bucket, never invent
    // one — dq36's D is a certified lower bound of dq33's).
    "dq36_ks_buckets" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(expr("((ts div 1000) div 86400000000) % 2").as("par"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        graft.ext.Profile.ksFromBuckets(
          graft.ext.Profile.bucketCounts(
              ev.filter(col("par") === 0).select("vq"), "vq", 1000L)
            .toDF("bucket", "n_ref"),
          graft.ext.Profile.bucketCounts(
              ev.filter(col("par") === 1).select("vq"), "vq", 1000L)
            .toDF("bucket", "n_cur"))
      },
      Some("""WITH d AS (SELECT (epoch_us(ts) // 86400000000) % 2
                       AS par,
                     CAST(floor(CAST(CAST(floor(value * 100 + 0.5)
                       AS BIGINT) AS DOUBLE) / 1000) AS BIGINT) AS b
                   FROM events WHERE value IS NOT NULL),
              ca AS (SELECT b, CAST(count(*) AS BIGINT) AS cr
                     FROM d WHERE par = 0 GROUP BY 1),
              cb AS (SELECT b, CAST(count(*) AS BIGINT) AS cc
                     FROM d WHERE par = 1 GROUP BY 1),
              m AS (SELECT coalesce(ca.b, cb.b) AS b,
                           CAST(coalesce(cr, 0) AS BIGINT) AS cr,
                           CAST(coalesce(cc, 0) AS BIGINT) AS cc
                    FROM ca FULL OUTER JOIN cb ON cb.b = ca.b),
              t AS (SELECT CAST(sum(cr) AS BIGINT) AS na,
                           CAST(sum(cc) AS BIGINT) AS nb
                    FROM m),
              c AS (SELECT b,
                           CAST(sum(cr) OVER (ORDER BY b
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_a,
                           CAST(sum(cc) OVER (ORDER BY b
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_b
                    FROM m),
              mx AS (SELECT CAST(max(abs(c.cum_a * t.nb
                              - c.cum_b * t.na)) AS BIGINT) AS d_num
                     FROM c CROSS JOIN t)
              SELECT t.na AS n_ref, t.nb AS n_cur, mx.d_num,
                     CASE WHEN t.na > 0 AND t.nb > 0
                          THEN CAST((mx.d_num * 1000000)
                                 // (t.na * t.nb) AS BIGINT)
                     ELSE NULL END AS d_ppm
              FROM t CROSS JOIN mx"""),
      "bucket-grain KS between day-parity snapshots (streaming readout)"),

    // GROUPED bucket-grain KS — the fourth cell of the KS 2×2 (value ×
    // bucket grain, global × grouped): per-type day-parity KS over $10
    // bucket histograms, the per-segment STREAMING monitor's readout
    // (ksFromBucketsBy over per-type bucketCountsBy state — one keyed
    // agg, one more key column than dq36's). The per-group bucket
    // cumulative partitions BY GROUP; each group's D is a certified
    // lower bound of that group's dq35 value-grain D. Oracle = dq36's
    // SQL with PARTITION BY event_type threaded through (the dq35
    // pattern).
    "dq37_ks_buckets_by" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .filter(col("value").isNotNull && col("event_type").isNotNull)
          .select(col("event_type"),
            expr("((ts div 1000) div 86400000000) % 2").as("par"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        graft.ext.Profile.ksFromBucketsBy(
            graft.ext.Profile.bucketCountsBy(
                ev.filter(col("par") === 0), "event_type", "vq", 1000L)
              .toDF("group", "bucket", "n_ref"),
            graft.ext.Profile.bucketCountsBy(
                ev.filter(col("par") === 1), "event_type", "vq", 1000L)
              .toDF("group", "bucket", "n_cur"))
          .withColumnRenamed("group", "event_type")
      },
      Some("""WITH d AS (SELECT event_type,
                     (epoch_us(ts) // 86400000000) % 2 AS par,
                     CAST(floor(CAST(CAST(floor(value * 100 + 0.5)
                       AS BIGINT) AS DOUBLE) / 1000) AS BIGINT) AS b
                   FROM events
                   WHERE value IS NOT NULL AND event_type IS NOT NULL),
              ca AS (SELECT event_type AS g, b,
                            CAST(count(*) AS BIGINT) AS cr
                     FROM d WHERE par = 0 GROUP BY 1, 2),
              cb AS (SELECT event_type AS g, b,
                            CAST(count(*) AS BIGINT) AS cc
                     FROM d WHERE par = 1 GROUP BY 1, 2),
              m AS (SELECT coalesce(ca.g, cb.g) AS g,
                           coalesce(ca.b, cb.b) AS b,
                           CAST(coalesce(cr, 0) AS BIGINT) AS cr,
                           CAST(coalesce(cc, 0) AS BIGINT) AS cc
                    FROM ca FULL OUTER JOIN cb
                      ON cb.g = ca.g AND cb.b = ca.b),
              t AS (SELECT g, CAST(sum(cr) AS BIGINT) AS na,
                           CAST(sum(cc) AS BIGINT) AS nb
                    FROM m GROUP BY 1),
              c AS (SELECT g, b,
                           CAST(sum(cr) OVER (PARTITION BY g ORDER BY b
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_a,
                           CAST(sum(cc) OVER (PARTITION BY g ORDER BY b
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_b
                    FROM m),
              mx AS (SELECT c.g, CAST(max(abs(c.cum_a * t.nb
                              - c.cum_b * t.na)) AS BIGINT) AS d_num
                     FROM c JOIN t USING (g) GROUP BY 1)
              SELECT t.g AS event_type, t.na AS n_ref, t.nb AS n_cur,
                     mx.d_num,
                     CASE WHEN t.na > 0 AND t.nb > 0
                          THEN CAST((mx.d_num * 1000000)
                                 // (t.na * t.nb) AS BIGINT)
                     ELSE NULL END AS d_ppm
              FROM t JOIN mx USING (g)"""),
      "per-type bucket-grain KS drift (grouped streaming readout)"),

    // Cramér–von Mises on the dq33 day-parity split — the WHOLE-CURVE
    // companion of dq33's exact KS on the same merged-ECDF kernel: KS
    // reads the one largest gap, CvM accumulates the squared gap over
    // the combined sample, the readout that moves on spread/tail drift
    // long before a single gap grows. t_num is summed as DECIMAL(38,0)
    // (d^2 can pass BIGINT); the oracle replays it in HUGEINT.
    "dq38_cvm_drift" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(expr("((ts div 1000) div 86400000000) % 2").as("par"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        graft.ext.Profile.cvmTwoSample(
          ev.filter(col("par") === 0).select("vq"),
          ev.filter(col("par") === 1).select("vq"), "vq")
      },
      Some("""WITH d AS (SELECT (epoch_us(ts) // 86400000000) % 2
                       AS par,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events WHERE value IS NOT NULL),
              ca AS (SELECT v, CAST(count(*) AS BIGINT) AS cr
                     FROM d WHERE par = 0 GROUP BY 1),
              cb AS (SELECT v, CAST(count(*) AS BIGINT) AS cc
                     FROM d WHERE par = 1 GROUP BY 1),
              m AS (SELECT coalesce(ca.v, cb.v) AS v,
                           CAST(coalesce(cr, 0) AS BIGINT) AS cr,
                           CAST(coalesce(cc, 0) AS BIGINT) AS cc
                    FROM ca FULL OUTER JOIN cb ON cb.v = ca.v),
              t AS (SELECT CAST(sum(cr) AS BIGINT) AS na,
                           CAST(sum(cc) AS BIGINT) AS nb
                    FROM m),
              c AS (SELECT v, cr, cc,
                           CAST(sum(cr) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_a,
                           CAST(sum(cc) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_b
                    FROM m),
              tn AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct,
                            sum(CAST(c.cum_a * t.nb - c.cum_b * t.na
                                  AS HUGEINT)
                                * CAST(c.cum_a * t.nb - c.cum_b * t.na
                                  AS HUGEINT)
                                * CAST(c.cr + c.cc AS HUGEINT)) AS t_num
                     FROM c CROSS JOIN t)
              SELECT t.na AS n_ref, t.nb AS n_cur, tn.n_distinct,
                     CASE WHEN t.na > 0 AND t.nb > 0
                          THEN CAST(floor(
                       CAST(tn.t_num AS DOUBLE) * 1000000.0
                       / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)
                          * ((CAST(t.na AS DOUBLE)
                              + CAST(t.nb AS DOUBLE))
                             * (CAST(t.na AS DOUBLE)
                                + CAST(t.nb AS DOUBLE))))
                       + 0.5) AS BIGINT)
                     ELSE NULL END AS t_micro
              FROM t CROSS JOIN tn"""),
      "Cramér–von Mises whole-curve drift between day-parity snapshots"),

    // 1-Wasserstein on the same split — the MAGNITUDE member of the
    // ECDF trio: KS/CvM read in probability units, W1 reads in VALUE
    // units ("mean centi-units each unit of mass moved"), the number a
    // drift runbook thresholds in domain terms. w_num = sum |gap|*width
    // rides the same kernel plus one lead() on the same bounded
    // ordering; DECIMAL(38,0)-exact at any value range.
    "dq39_wasserstein" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(expr("((ts div 1000) div 86400000000) % 2").as("par"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        graft.ext.Profile.wassersteinTwoSample(
          ev.filter(col("par") === 0).select("vq"),
          ev.filter(col("par") === 1).select("vq"), "vq")
      },
      Some("""WITH d AS (SELECT (epoch_us(ts) // 86400000000) % 2
                       AS par,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events WHERE value IS NOT NULL),
              ca AS (SELECT v, CAST(count(*) AS BIGINT) AS cr
                     FROM d WHERE par = 0 GROUP BY 1),
              cb AS (SELECT v, CAST(count(*) AS BIGINT) AS cc
                     FROM d WHERE par = 1 GROUP BY 1),
              m AS (SELECT coalesce(ca.v, cb.v) AS v,
                           CAST(coalesce(cr, 0) AS BIGINT) AS cr,
                           CAST(coalesce(cc, 0) AS BIGINT) AS cc
                    FROM ca FULL OUTER JOIN cb ON cb.v = ca.v),
              t AS (SELECT CAST(sum(cr) AS BIGINT) AS na,
                           CAST(sum(cc) AS BIGINT) AS nb
                    FROM m),
              c AS (SELECT v,
                           CAST(sum(cr) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_a,
                           CAST(sum(cc) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_b
                    FROM m),
              g AS (SELECT v, cum_a, cum_b,
                           lead(v) OVER (ORDER BY v) AS nxt
                    FROM c),
              wn AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct,
                            coalesce(sum(CASE WHEN nxt IS NOT NULL THEN
                              abs(CAST(g.cum_a * t.nb - g.cum_b * t.na
                                    AS HUGEINT))
                              * (CAST(nxt AS HUGEINT)
                                 - CAST(v AS HUGEINT)) END),
                              CAST(0 AS HUGEINT)) AS w_num
                     FROM g CROSS JOIN t)
              SELECT t.na AS n_ref, t.nb AS n_cur, wn.n_distinct,
                     CASE WHEN t.na > 0 AND t.nb > 0
                          THEN CAST(floor(
                       CAST(wn.w_num AS DOUBLE) * 1000000.0
                       / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE))
                       + 0.5) AS BIGINT)
                     ELSE NULL END AS w1_micro
              FROM t CROSS JOIN wn"""),
      "1-Wasserstein value-unit drift between day-parity snapshots"),

    // GROUPED CvM — dq38 lifted to per-type grain (the dq35 pattern:
    // same kernel, cumulative partitioned BY GROUP, oracle literally
    // dq38's SQL with PARTITION BY event_type threaded through): WHICH
    // segment's whole curve moved, with per-group exact t_num.
    "dq40_cvm_drift_by" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("((ts div 1000) div 86400000000) % 2").as("par"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        graft.ext.Profile.cvmTwoSampleBy(
            ev.filter(col("par") === 0).select("event_type", "vq"),
            ev.filter(col("par") === 1).select("event_type", "vq"),
            "event_type", "vq")
          .withColumnRenamed("group", "event_type")
      },
      Some("""WITH d AS (SELECT event_type,
                     (epoch_us(ts) // 86400000000) % 2 AS par,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events
                   WHERE value IS NOT NULL AND event_type IS NOT NULL),
              ca AS (SELECT event_type AS g, v,
                            CAST(count(*) AS BIGINT) AS cr
                     FROM d WHERE par = 0 GROUP BY 1, 2),
              cb AS (SELECT event_type AS g, v,
                            CAST(count(*) AS BIGINT) AS cc
                     FROM d WHERE par = 1 GROUP BY 1, 2),
              m AS (SELECT coalesce(ca.g, cb.g) AS g,
                           coalesce(ca.v, cb.v) AS v,
                           CAST(coalesce(cr, 0) AS BIGINT) AS cr,
                           CAST(coalesce(cc, 0) AS BIGINT) AS cc
                    FROM ca FULL OUTER JOIN cb
                      ON cb.g = ca.g AND cb.v = ca.v),
              t AS (SELECT g, CAST(sum(cr) AS BIGINT) AS na,
                           CAST(sum(cc) AS BIGINT) AS nb
                    FROM m GROUP BY 1),
              c AS (SELECT g, v, cr, cc,
                           CAST(sum(cr) OVER (PARTITION BY g ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_a,
                           CAST(sum(cc) OVER (PARTITION BY g ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_b
                    FROM m),
              tn AS (SELECT c.g, CAST(count(*) AS BIGINT) AS n_distinct,
                            sum(CAST(c.cum_a * t.nb - c.cum_b * t.na
                                  AS HUGEINT)
                                * CAST(c.cum_a * t.nb - c.cum_b * t.na
                                  AS HUGEINT)
                                * CAST(c.cr + c.cc AS HUGEINT)) AS t_num
                     FROM c JOIN t USING (g) GROUP BY 1)
              SELECT t.g AS event_type, t.na AS n_ref, t.nb AS n_cur,
                     tn.n_distinct,
                     CASE WHEN t.na > 0 AND t.nb > 0
                          THEN CAST(floor(
                       CAST(tn.t_num AS DOUBLE) * 1000000.0
                       / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)
                          * ((CAST(t.na AS DOUBLE)
                              + CAST(t.nb AS DOUBLE))
                             * (CAST(t.na AS DOUBLE)
                                + CAST(t.nb AS DOUBLE))))
                       + 0.5) AS BIGINT)
                     ELSE NULL END AS t_micro
              FROM t JOIN tn USING (g)"""),
      "per-type Cramér–von Mises whole-curve drift (day-parity)"),

    // GROUPED 1-Wasserstein — dq39 per type: how many centi-units each
    // segment's mass moved, the domain-unit drift number per key.
    "dq41_wasserstein_by" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("((ts div 1000) div 86400000000) % 2").as("par"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        graft.ext.Profile.wassersteinTwoSampleBy(
            ev.filter(col("par") === 0).select("event_type", "vq"),
            ev.filter(col("par") === 1).select("event_type", "vq"),
            "event_type", "vq")
          .withColumnRenamed("group", "event_type")
      },
      Some("""WITH d AS (SELECT event_type,
                     (epoch_us(ts) // 86400000000) % 2 AS par,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events
                   WHERE value IS NOT NULL AND event_type IS NOT NULL),
              ca AS (SELECT event_type AS g, v,
                            CAST(count(*) AS BIGINT) AS cr
                     FROM d WHERE par = 0 GROUP BY 1, 2),
              cb AS (SELECT event_type AS g, v,
                            CAST(count(*) AS BIGINT) AS cc
                     FROM d WHERE par = 1 GROUP BY 1, 2),
              m AS (SELECT coalesce(ca.g, cb.g) AS g,
                           coalesce(ca.v, cb.v) AS v,
                           CAST(coalesce(cr, 0) AS BIGINT) AS cr,
                           CAST(coalesce(cc, 0) AS BIGINT) AS cc
                    FROM ca FULL OUTER JOIN cb
                      ON cb.g = ca.g AND cb.v = ca.v),
              t AS (SELECT g, CAST(sum(cr) AS BIGINT) AS na,
                           CAST(sum(cc) AS BIGINT) AS nb
                    FROM m GROUP BY 1),
              c AS (SELECT g, v,
                           CAST(sum(cr) OVER (PARTITION BY g ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_a,
                           CAST(sum(cc) OVER (PARTITION BY g ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_b
                    FROM m),
              g2 AS (SELECT g, v, cum_a, cum_b,
                            lead(v) OVER (PARTITION BY g ORDER BY v)
                              AS nxt
                     FROM c),
              wn AS (SELECT g2.g,
                            CAST(count(*) AS BIGINT) AS n_distinct,
                            coalesce(sum(CASE WHEN nxt IS NOT NULL THEN
                              abs(CAST(g2.cum_a * t.nb - g2.cum_b * t.na
                                    AS HUGEINT))
                              * (CAST(nxt AS HUGEINT)
                                 - CAST(v AS HUGEINT)) END),
                              CAST(0 AS HUGEINT)) AS w_num
                     FROM g2 JOIN t USING (g) GROUP BY 1)
              SELECT t.g AS event_type, t.na AS n_ref, t.nb AS n_cur,
                     wn.n_distinct,
                     CASE WHEN t.na > 0 AND t.nb > 0
                          THEN CAST(floor(
                       CAST(wn.w_num AS DOUBLE) * 1000000.0
                       / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE))
                       + 0.5) AS BIGINT)
                     ELSE NULL END AS w1_micro
              FROM t JOIN wn USING (g)"""),
      "per-type 1-Wasserstein value-unit drift (day-parity)"),

    // Energy distance on the same split — the METRIC member of the
    // ECDF family (Székely-Rizzo 2004): a true metric between the two
    // distributions (0 iff identical), all three E|·| terms exact
    // DECIMAL sums off ONE kernel pass; the embedding-distribution
    // comparison statistic, here gated on the scalar value column.
    "dq42_energy_distance" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(expr("((ts div 1000) div 86400000000) % 2").as("par"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        graft.ext.Profile.energyDistance(
          ev.filter(col("par") === 0).select("vq"),
          ev.filter(col("par") === 1).select("vq"), "vq")
      },
      Some("""WITH d AS (SELECT (epoch_us(ts) // 86400000000) % 2
                       AS par,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events WHERE value IS NOT NULL),
              ca AS (SELECT v, CAST(count(*) AS BIGINT) AS cr
                     FROM d WHERE par = 0 GROUP BY 1),
              cb AS (SELECT v, CAST(count(*) AS BIGINT) AS cc
                     FROM d WHERE par = 1 GROUP BY 1),
              m AS (SELECT coalesce(ca.v, cb.v) AS v,
                           CAST(coalesce(cr, 0) AS BIGINT) AS cr,
                           CAST(coalesce(cc, 0) AS BIGINT) AS cc
                    FROM ca FULL OUTER JOIN cb ON cb.v = ca.v),
              t AS (SELECT CAST(sum(cr) AS BIGINT) AS na,
                           CAST(sum(cc) AS BIGINT) AS nb
                    FROM m),
              c AS (SELECT v,
                           CAST(sum(cr) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_a,
                           CAST(sum(cc) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_b
                    FROM m),
              g AS (SELECT v, cum_a, cum_b,
                           lead(v) OVER (ORDER BY v) AS nxt
                    FROM c),
              en AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct,
                            coalesce(sum(CASE WHEN nxt IS NOT NULL THEN
                              (CAST(g.cum_a AS HUGEINT)
                                 * CAST(t.nb - g.cum_b AS HUGEINT)
                               + CAST(g.cum_b AS HUGEINT)
                                 * CAST(t.na - g.cum_a AS HUGEINT))
                              * (CAST(nxt AS HUGEINT)
                                 - CAST(v AS HUGEINT)) END),
                              CAST(0 AS HUGEINT)) AS xy,
                            coalesce(sum(CASE WHEN nxt IS NOT NULL THEN
                              CAST(g.cum_a AS HUGEINT)
                                * CAST(t.na - g.cum_a AS HUGEINT)
                              * (CAST(nxt AS HUGEINT)
                                 - CAST(v AS HUGEINT)) END),
                              CAST(0 AS HUGEINT)) AS xx,
                            coalesce(sum(CASE WHEN nxt IS NOT NULL THEN
                              CAST(g.cum_b AS HUGEINT)
                                * CAST(t.nb - g.cum_b AS HUGEINT)
                              * (CAST(nxt AS HUGEINT)
                                 - CAST(v AS HUGEINT)) END),
                              CAST(0 AS HUGEINT)) AS yy
                     FROM g CROSS JOIN t)
              SELECT t.na AS n_ref, t.nb AS n_cur, en.n_distinct,
                     CASE WHEN t.na > 0 AND t.nb > 0
                          THEN CAST(floor((
                       2.0 * CAST(en.xy AS DOUBLE)
                         / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE))
                       - 2.0 * CAST(en.xx AS DOUBLE)
                         / (CAST(t.na AS DOUBLE) * CAST(t.na AS DOUBLE))
                       - 2.0 * CAST(en.yy AS DOUBLE)
                         / (CAST(t.nb AS DOUBLE) * CAST(t.nb AS DOUBLE)))
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS e_micro
              FROM t CROSS JOIN en"""),
      "energy distance (metric member of the ECDF family, day-parity)"),

    // GROUPED shard-merge proven under the gate (dq27's claim lifted to
    // per-key distributions): per-type sketches built on user-parity
    // shards, merged by (group, lo, hi) SUM, read at quartiles — the
    // oracle computes the whole-corpus grouped readout directly, so
    // hash equality IS the per-key shard-merge ≡ whole claim.
    "dq34_qsketch_merge_by" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("user_id"), col("event_type"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
        def shard(par: Long) = graft.ext.Sketches.quantileSketchBy(
          ev.filter(col("user_id") % 2 === par)
            .select("event_type", "vq"),
          "event_type", "vq")
        graft.ext.Sketches.quantileSketchQuantilesBy(
            graft.ext.Sketches.quantileSketchMergeBy(shard(0L), shard(1L)),
            k = 4)
          .withColumnRenamed("group", "event_type")
      },
      Some("""WITH d AS (SELECT event_type,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events WHERE value IS NOT NULL),
              bk AS (SELECT event_type, ((v >> s) << s) AS lo,
                            (((v >> s) + 1) << s) - 1 AS hi,
                            CAST(count(*) AS BIGINT) AS c
                     FROM (SELECT event_type, v,
                                  greatest(0, length(bin(v)) - 6) AS s
                           FROM d)
                     GROUP BY 1, 2, 3),
              cum AS (SELECT event_type, lo, hi,
                             CAST(sum(c) OVER (PARTITION BY event_type
                               ORDER BY lo ROWS UNBOUNDED PRECEDING)
                               AS BIGINT) AS cum
                      FROM bk),
              tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
                      FROM bk GROUP BY 1),
              qs AS (SELECT CAST(unnest(generate_series(1, 4))
                              AS INTEGER) AS q)
              SELECT event_type, q, max(rank) AS rank, min(lo) AS lo,
                     min_by(hi, lo) AS hi,
                     min(lo) + (min_by(hi, lo) - min(lo)) // 2 AS mid
              FROM (SELECT cum.event_type, qs.q,
                           (qs.q * tot.n + 3) // 4 AS rank,
                           cum.lo, cum.hi, cum.cum
                    FROM cum JOIN tot USING (event_type) CROSS JOIN qs)
              WHERE cum >= rank GROUP BY event_type, q"""),
      "per-type shard-merged sketch quartiles hash-equal the whole"),

    // Full per-type daily-count regression readout: x14's exact slope
    // plus intercept and R² (fixed-shape doubles over the same exact
    // moments) — slope 3/day from base 7 WITH "the line explains it".
    "x15_keyed_trend_full" -> QueryDef(
      (s, dir) => graft.ext.TimeSeries.keyedTrendFull(
        t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("(ts div 1000) div 86400000000").as("day"))
          .agg(count(lit(1)).as("n")),
        "event_type", "day", "n"),
      Some("""WITH sr AS (SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
              rb AS (SELECT event_type,
                            day - min(day) OVER (PARTITION BY event_type)
                              AS t, n AS c
                     FROM sr),
              a AS (SELECT event_type,
                           CAST(count(*) AS BIGINT) AS n_points,
                           CAST(sum(t) AS BIGINT) AS st,
                           CAST(sum(c) AS BIGINT) AS sc,
                           CAST(sum(t * t) AS BIGINT) AS stt,
                           CAST(sum(t * c) AS BIGINT) AS stc,
                           CAST(sum(c * c) AS BIGINT) AS scc
                    FROM rb GROUP BY 1),
              m AS (SELECT event_type, n_points, st, sc, stt, stc, scc,
                           n_points * stc - st * sc AS dnum,
                           n_points * stt - st * st AS dden,
                           n_points * scc - sc * sc AS sccx
                    FROM a)
              SELECT event_type, n_points,
                     CASE WHEN dden = 0 THEN NULL
                          ELSE CAST((dnum * 1000) // dden AS BIGINT)
                     END AS slope_milli,
                     CASE WHEN dden = 0 THEN NULL
                          ELSE CAST(floor((CAST(sc AS DOUBLE)
                              / CAST(n_points AS DOUBLE)
                            - (CAST(dnum AS DOUBLE)
                               / CAST(dden AS DOUBLE))
                              * (CAST(st AS DOUBLE)
                                 / CAST(n_points AS DOUBLE)))
                            * 1e6 + 0.5) AS BIGINT)
                     END AS intercept_micro,
                     CASE WHEN dden = 0 OR sccx = 0 THEN NULL
                          ELSE CAST(floor(CAST(dnum AS DOUBLE)
                              * CAST(dnum AS DOUBLE)
                            / (CAST(dden AS DOUBLE)
                               * CAST(sccx AS DOUBLE))
                            * 1e6 + 0.5) AS BIGINT)
                     END AS r2_micro
              FROM m"""),
      "per-type OLS slope + intercept + R² (exact moments, fixed shapes)"),

    // Mann-Kendall monotone-trend test on the SAME per-type daily
    // series as x14/x15 — the distribution-free significance readout
    // their OLS slope assumes away (no linearity/normality; S moves at
    // most n-1 per outlier). Exact BIGINT S + tie correction; one
    // fixed-shape z with continuity correction.
    "x16_mann_kendall" -> QueryDef(
      (s, dir) => graft.ext.TimeSeries.mannKendall(
          t(s, dir, "events")
            .groupBy(col("event_type"),
              expr("(ts div 1000) div 86400000000").as("day"))
            .agg(count(lit(1)).as("n")),
          "event_type", "day", "n")
        .withColumnRenamed("key", "event_type"),
      Some("""WITH sr AS (SELECT event_type,
                     epoch_us(ts) // 86400000000 AS t,
                     CAST(count(*) AS BIGINT) AS v
                   FROM events GROUP BY 1, 2),
              p AS (SELECT a.event_type,
                           CAST(sum(CASE WHEN b.v > a.v THEN 1
                                         WHEN b.v < a.v THEN -1
                                         ELSE 0 END) AS BIGINT) AS s_stat
                    FROM sr a JOIN sr b
                      ON b.event_type = a.event_type AND a.t < b.t
                    GROUP BY 1),
              nn AS (SELECT event_type, CAST(count(*) AS BIGINT)
                              AS n_points
                     FROM sr GROUP BY 1),
              tt AS (SELECT event_type, CAST(sum(c * (c - 1)
                              * (c * 2 + 5)) AS BIGINT) AS tie_term
                     FROM (SELECT event_type, v,
                                  CAST(count(*) AS BIGINT) AS c
                           FROM sr GROUP BY 1, 2)
                     GROUP BY 1)
              SELECT nn.event_type, nn.n_points,
                     CAST(coalesce(p.s_stat, 0) AS BIGINT) AS s_stat,
                     tt.tie_term,
                     CASE WHEN CAST(nn.n_points * (nn.n_points - 1)
                              * (nn.n_points * 2 + 5) - tt.tie_term
                              AS DOUBLE) / 18.0 > 0
                          THEN CAST(floor(
                            (CASE WHEN p.s_stat > 0
                                  THEN CAST(p.s_stat - 1 AS DOUBLE)
                                    / sqrt(CAST(nn.n_points
                                        * (nn.n_points - 1)
                                        * (nn.n_points * 2 + 5)
                                        - tt.tie_term AS DOUBLE) / 18.0)
                                  WHEN p.s_stat < 0
                                  THEN CAST(p.s_stat + 1 AS DOUBLE)
                                    / sqrt(CAST(nn.n_points
                                        * (nn.n_points - 1)
                                        * (nn.n_points * 2 + 5)
                                        - tt.tie_term AS DOUBLE) / 18.0)
                                  ELSE 0.0 END) * 1e6 + 0.5) AS BIGINT)
                          ELSE NULL END AS z_micro
              FROM nn JOIN tt USING (event_type)
              LEFT JOIN p ON p.event_type = nn.event_type"""),
      "Mann-Kendall monotone-trend z per event type (tie-corrected)"),

    // Theil-Sen robust slope per type over the SAME daily series as
    // x14/x15/x16 — the estimator completing the trend triptych: OLS
    // slope (outlier-dragged), MK significance (distribution-free), and
    // now the median-of-pairwise-slopes magnitude (29.3% breakdown).
    // Every pair slope is an exact truncating-division micro integer
    // (Spark div ≡ DuckDB integer //), the median an exact order stat.
    "x17_theil_sen" -> QueryDef(
      (s, dir) => graft.ext.TimeSeries.theilSen(
          t(s, dir, "events")
            .groupBy(col("event_type"),
              expr("(ts div 1000) div 86400000000").as("day"))
            .agg(count(lit(1)).as("n")),
          "event_type", "day", "n")
        .withColumnRenamed("key", "event_type"),
      Some("""WITH sr AS (SELECT event_type,
                     epoch_us(ts) // 86400000000 AS t,
                     CAST(count(*) AS BIGINT) AS v
                   FROM events GROUP BY 1, 2),
              sl AS (SELECT a.event_type,
                            ((b.v - a.v) * 1000000) // (b.t - a.t)
                              AS slope_micro
                     FROM sr a JOIN sr b
                       ON b.event_type = a.event_type AND a.t < b.t),
              c AS (SELECT event_type, slope_micro,
                           CAST(count(*) AS BIGINT) AS c
                    FROM sl GROUP BY 1, 2),
              cum AS (SELECT event_type, slope_micro,
                             CAST(sum(c) OVER (PARTITION BY event_type
                               ORDER BY slope_micro
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
                               AS cum
                      FROM c),
              tot AS (SELECT event_type, CAST(sum(c) AS BIGINT)
                               AS n_pairs
                      FROM c GROUP BY 1),
              md AS (SELECT cum.event_type,
                            min(cum.slope_micro) AS slope_med_micro
                     FROM cum JOIN tot USING (event_type)
                     WHERE cum.cum >= (tot.n_pairs + 1) // 2
                     GROUP BY 1),
              nn AS (SELECT event_type, CAST(count(*) AS BIGINT)
                              AS n_points
                     FROM sr GROUP BY 1)
              SELECT nn.event_type, nn.n_points,
                     CAST(coalesce(tot.n_pairs, 0) AS BIGINT) AS n_pairs,
                     md.slope_med_micro
              FROM nn LEFT JOIN tot USING (event_type)
              LEFT JOIN md USING (event_type)"""),
      "Theil-Sen median pairwise slope per event type (exact micro)"),

    // Spearman rank correlation between the daily view and click
    // volumes — "do the two funnel mouths co-move monotonically": both
    // series midranked over days (x2-integer midranks), Σd² an exact
    // BIGINT, ρ one fixed-shape double over two exact scalars.
    "x18_spearman" -> QueryDef(
      (s, dir) => graft.ext.Experiment.spearman(
        t(s, dir, "events")
          .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("x"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("y")),
        "x", "y"),
      Some("""WITH sr AS (SELECT epoch_us(ts) // 86400000000 AS day,
                     CAST(sum(CASE WHEN event_type = 'view' THEN 1
                                   ELSE 0 END) AS BIGINT) AS x,
                     CAST(sum(CASE WHEN event_type = 'click' THEN 1
                                   ELSE 0 END) AS BIGINT) AS y
                   FROM events GROUP BY 1),
              cx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS c
                     FROM sr GROUP BY 1),
              rx AS (SELECT v, 2 * CAST(sum(c) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) - c + 1
                       AS r2
                     FROM cx),
              cy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS c
                     FROM sr GROUP BY 1),
              ry AS (SELECT v, 2 * CAST(sum(c) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) - c + 1
                       AS r2
                     FROM cy),
              j AS (SELECT rx.r2 AS r2x, ry.r2 AS r2y
                    FROM sr JOIN rx ON rx.v = sr.x
                    JOIN ry ON ry.v = sr.y),
              a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum((r2x - r2y) * (r2x - r2y))
                             AS BIGINT) AS sum_d2q
                    FROM j)
              SELECT n, sum_d2q,
                     CASE WHEN n >= 2 THEN CAST(floor(
                       (1.0 - 1.5 * CAST(sum_d2q AS DOUBLE) /
                        (CAST(n AS DOUBLE) *
                         (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)))
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS rho_micro
              FROM a"""),
      "Spearman rank correlation of daily view vs click volumes"),

    // Kendall tau-b on the same daily view/click series as x18 — the
    // pair-based monotone-association reading (x16's Mann-Kendall IS
    // this statistic against time; this is x-vs-y): concordant /
    // discordant / per-column tie-pair counts all exact BIGINTs from
    // COMPARISONS ONLY (no subtraction anywhere — no magnitude envelope
    // at all), tau-b one fixed-shape double over exactly-representable
    // integers.
    "x19_kendall_tau" -> QueryDef(
      (s, dir) => graft.ext.Experiment.kendallTau(
        t(s, dir, "events")
          .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("x"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("y")),
        "day", "x", "y"),
      Some("""WITH sr AS (SELECT epoch_us(ts) // 86400000000 AS day,
                     CAST(sum(CASE WHEN event_type = 'view' THEN 1
                                   ELSE 0 END) AS BIGINT) AS x,
                     CAST(sum(CASE WHEN event_type = 'click' THEN 1
                                   ELSE 0 END) AS BIGINT) AS y
                   FROM events GROUP BY 1),
              p AS (SELECT (CASE WHEN b.x > a.x THEN 1
                                 WHEN b.x < a.x THEN -1 ELSE 0 END)
                         * (CASE WHEN b.y > a.y THEN 1
                                 WHEN b.y < a.y THEN -1 ELSE 0 END) AS s
                    FROM sr a JOIN sr b ON a.day < b.day),
              cd AS (SELECT CAST(coalesce(sum(CASE WHEN s = 1 THEN 1
                              ELSE 0 END), 0) AS BIGINT) AS n_conc,
                            CAST(coalesce(sum(CASE WHEN s = -1 THEN 1
                              ELSE 0 END), 0) AS BIGINT) AS n_disc
                     FROM p),
              nn AS (SELECT CAST(count(*) AS BIGINT) AS n_points FROM sr),
              tx AS (SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0)
                              AS BIGINT) AS tie_x_pairs
                     FROM (SELECT CAST(count(*) AS BIGINT) AS c
                           FROM sr GROUP BY x)),
              ty AS (SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0)
                              AS BIGINT) AS tie_y_pairs
                     FROM (SELECT CAST(count(*) AS BIGINT) AS c
                           FROM sr GROUP BY y))
              SELECT nn.n_points, cd.n_conc, cd.n_disc, tx.tie_x_pairs,
                     ty.tie_y_pairs,
                     CASE WHEN nn.n_points >= 2 AND
                       CAST(nn.n_points * (nn.n_points - 1) // 2
                         - tx.tie_x_pairs AS DOUBLE)
                       * CAST(nn.n_points * (nn.n_points - 1) // 2
                         - ty.tie_y_pairs AS DOUBLE) > 0.0
                          THEN CAST(floor(
                       CAST(cd.n_conc - cd.n_disc AS DOUBLE)
                       / sqrt(CAST(nn.n_points * (nn.n_points - 1) // 2
                           - tx.tie_x_pairs AS DOUBLE)
                         * CAST(nn.n_points * (nn.n_points - 1) // 2
                           - ty.tie_y_pairs AS DOUBLE))
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS tau_micro
              FROM nn CROSS JOIN cd CROSS JOIN tx CROSS JOIN ty"""),
      "Kendall tau-b of daily view vs click volumes (comparison-exact)"),

    // GROUPED Spearman: per event type, does daily activity VOLUME move
    // with daily VALUE — the per-segment form of x18 (a pooled rho
    // averages away sign-opposed segments); midranks taken WITHIN each
    // type via the group-partitioned cumulative (no global sweep).
    "x20_spearman_by" -> QueryDef(
      (s, dir) => graft.ext.Experiment.spearmanBy(
          t(s, dir, "events").filter(col("value").isNotNull)
            .groupBy(col("event_type"),
              expr("(ts div 1000) div 86400000000").as("day"))
            .agg(count(lit(1)).as("x"),
              sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
                .as("y")),
          "event_type", "x", "y")
        .withColumnRenamed("group", "event_type"),
      Some("""WITH sr AS (SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(count(*) AS BIGINT) AS x,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS y
                   FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
              cx AS (SELECT event_type, x AS v,
                            CAST(count(*) AS BIGINT) AS c
                     FROM sr GROUP BY 1, 2),
              rx AS (SELECT event_type, v,
                            2 * CAST(sum(c) OVER (PARTITION BY event_type
                              ORDER BY v ROWS UNBOUNDED PRECEDING)
                              AS BIGINT) - c + 1 AS r2
                     FROM cx),
              cy AS (SELECT event_type, y AS v,
                            CAST(count(*) AS BIGINT) AS c
                     FROM sr GROUP BY 1, 2),
              ry AS (SELECT event_type, v,
                            2 * CAST(sum(c) OVER (PARTITION BY event_type
                              ORDER BY v ROWS UNBOUNDED PRECEDING)
                              AS BIGINT) - c + 1 AS r2
                     FROM cy),
              j AS (SELECT sr.event_type, rx.r2 AS r2x, ry.r2 AS r2y
                    FROM sr
                    JOIN rx ON rx.event_type = sr.event_type
                      AND rx.v = sr.x
                    JOIN ry ON ry.event_type = sr.event_type
                      AND ry.v = sr.y),
              a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum((r2x - r2y) * (r2x - r2y))
                             AS BIGINT) AS sum_d2q
                    FROM j GROUP BY 1)
              SELECT event_type, n, sum_d2q,
                     CASE WHEN n >= 2 THEN CAST(floor(
                       (1.0 - 1.5 * CAST(sum_d2q AS DOUBLE) /
                        (CAST(n AS DOUBLE) *
                         (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)))
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS rho_micro
              FROM a"""),
      "per-type Spearman of daily volume vs daily value (grouped ranks)"),

    // GROUPED Kendall τ-b over the SAME per-type daily (volume, value)
    // series as x20 — the pair-based monotone reading beside x20's
    // rank-distance one, per segment (a pooled τ averages away
    // sign-opposed segments). Comparison-only signs (no subtraction, no
    // value envelope); the per-group O(n²) pair expansion rides the
    // gated per-group (ord)-grain bound and an equi-join on the type
    // key — never a global cross product.
    "x21_kendall_tau_by" -> QueryDef(
      (s, dir) => graft.ext.Experiment.kendallTauBy(
          t(s, dir, "events").filter(col("value").isNotNull)
            .groupBy(col("event_type"),
              expr("(ts div 1000) div 86400000000").as("day"))
            .agg(count(lit(1)).as("x"),
              sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
                .as("y")),
          "event_type", "day", "x", "y")
        .withColumnRenamed("group", "event_type"),
      Some("""WITH sr AS (SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(count(*) AS BIGINT) AS x,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS y
                   FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
              p AS (SELECT a.event_type,
                           (CASE WHEN b.x > a.x THEN 1
                                 WHEN b.x < a.x THEN -1 ELSE 0 END)
                         * (CASE WHEN b.y > a.y THEN 1
                                 WHEN b.y < a.y THEN -1 ELSE 0 END) AS s
                    FROM sr a JOIN sr b
                      ON a.event_type = b.event_type AND a.day < b.day),
              cd AS (SELECT event_type,
                            CAST(coalesce(sum(CASE WHEN s = 1 THEN 1
                              ELSE 0 END), 0) AS BIGINT) AS n_conc,
                            CAST(coalesce(sum(CASE WHEN s = -1 THEN 1
                              ELSE 0 END), 0) AS BIGINT) AS n_disc
                     FROM p GROUP BY 1),
              nn AS (SELECT event_type, CAST(count(*) AS BIGINT)
                              AS n_points
                     FROM sr GROUP BY 1),
              tx AS (SELECT event_type,
                            CAST(coalesce(sum(c * (c - 1) // 2), 0)
                              AS BIGINT) AS tie_x_pairs
                     FROM (SELECT event_type, CAST(count(*) AS BIGINT)
                             AS c
                           FROM sr GROUP BY event_type, x)
                     GROUP BY 1),
              ty AS (SELECT event_type,
                            CAST(coalesce(sum(c * (c - 1) // 2), 0)
                              AS BIGINT) AS tie_y_pairs
                     FROM (SELECT event_type, CAST(count(*) AS BIGINT)
                             AS c
                           FROM sr GROUP BY event_type, y)
                     GROUP BY 1)
              SELECT nn.event_type, nn.n_points,
                     CAST(coalesce(cd.n_conc, 0) AS BIGINT) AS n_conc,
                     CAST(coalesce(cd.n_disc, 0) AS BIGINT) AS n_disc,
                     tx.tie_x_pairs, ty.tie_y_pairs,
                     CASE WHEN nn.n_points >= 2 AND
                       CAST(nn.n_points * (nn.n_points - 1) // 2
                         - tx.tie_x_pairs AS DOUBLE)
                       * CAST(nn.n_points * (nn.n_points - 1) // 2
                         - ty.tie_y_pairs AS DOUBLE) > 0.0
                          THEN CAST(floor(
                       CAST(coalesce(cd.n_conc, 0)
                         - coalesce(cd.n_disc, 0) AS DOUBLE)
                       / sqrt(CAST(nn.n_points * (nn.n_points - 1) // 2
                           - tx.tie_x_pairs AS DOUBLE)
                         * CAST(nn.n_points * (nn.n_points - 1) // 2
                           - ty.tie_y_pairs AS DOUBLE))
                       * 1e6 + 0.5) AS BIGINT)
                     ELSE NULL END AS tau_micro
              FROM nn LEFT JOIN cd USING (event_type)
              JOIN tx USING (event_type) JOIN ty USING (event_type)"""),
      "per-type Kendall tau-b of daily volume vs daily value"),

    // Deterministic EXACT-k-per-language eval sample: salted-md5 rank
    // within stratum, top 20 survive — the eval-set builder a pct-rate
    // stratified sample can't be (binomial counts vs exactly k), stable
    // under growth in other strata, replayed bit-identically.
    "sp29_stratum_topk" -> QueryDef(
      (s, dir) => graft.ext.Sampling.stratumTopK(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          col("source")),
        "doc_id", "lang", k = 20),
      Some("""WITH r AS (SELECT doc_id, lang, source,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY md5(concat('stk:',
                         CAST(doc_id AS VARCHAR))), doc_id) AS rn
                   FROM documents)
              SELECT doc_id, lang, source FROM r WHERE rn <= 20"""),
      "deterministic exact-k-per-stratum sample (salted md5 rank)"),

    // Two-arm log-rank test over the SAME censored session lifetimes as
    // s10's KM curve (arms by user % 2, the welch/cuped convention) —
    // the significance readout survival analysis needs where a t-test
    // is wrong under censoring. O1 exact; per-time E/V terms
    // micro-quantized fixed shapes; chi-squared on 1 dof.
    "ab7_logrank" -> QueryDef(
      (s, dir) => {
        val gapNs = 3600L * 1000000000L
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = t(s, dir, "events")
          .withColumn("prev_ts", lag("ts", 1).over(wOrd))
          .withColumn("nw", when(col("prev_ts").isNull ||
            col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
          .withColumn("sid", sum("nw").over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sid")
          .agg(min("ts").as("t0"), max("ts").as("t1"))
        val end = sess.agg(max("t1").as("t_end"))
        val lifetimes = sess.crossJoin(broadcast(end))
          .select(expr("(t1 - t0) div 60000000000").as("t_min"),
            when(col("t_end") - col("t1") > gapNs, 1L).otherwise(0L)
              .as("death"),
            expr("user_id % 2").as("arm"))
        Attribution.logRank(lifetimes, "t_min", "death", "arm")
      },
      Some("""WITH g AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id,
                     lag(epoch_ns(ts)) OVER w AS prev_ts
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id)),
              f AS (SELECT user_id, tsn, event_id,
                           CASE WHEN prev_ts IS NULL
                                  OR tsn - prev_ts > 3600000000000
                                THEN 1 ELSE 0 END AS nw
                    FROM g),
              sx AS (SELECT user_id, tsn,
                            sum(nw) OVER (PARTITION BY user_id
                              ORDER BY tsn, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
                     FROM f),
              se AS (SELECT user_id, sid, min(tsn) AS t0, max(tsn) AS t1
                     FROM sx GROUP BY 1, 2),
              en AS (SELECT max(t1) AS t_end FROM se),
              lt AS (SELECT (t1 - t0) // 60000000000 AS t,
                            CASE WHEN en.t_end - t1 > 3600000000000
                                 THEN 1 ELSE 0 END AS death,
                            user_id % 2 AS arm
                     FROM se, en),
              bt AS (SELECT t,
                       CAST(sum(CASE WHEN arm = 1 THEN death ELSE 0 END)
                         AS BIGINT) AS d1,
                       CAST(sum(death) AS BIGINT) AS d,
                       CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                         AS BIGINT) AS c1,
                       CAST(count(*) AS BIGINT) AS c
                     FROM lt GROUP BY 1),
              rk AS (SELECT t, d1, d, c1, c,
                       CAST(sum(c) OVER wc AS BIGINT) AS cum,
                       CAST(sum(c1) OVER wc AS BIGINT) AS cum1,
                       (SELECT CAST(sum(c) AS BIGINT) FROM bt) AS n,
                       (SELECT CAST(sum(c1) AS BIGINT) FROM bt) AS n1
                     FROM bt
                     WINDOW wc AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
              tm AS (SELECT d1, d, n, n1,
                            n - cum + c AS nr,
                            n1 - cum1 + c1 AS n1r
                     FROM rk),
              q AS (SELECT n, n1, CAST(sum(d1) AS BIGINT) AS o1,
                      CAST(sum(CAST(floor(CAST(d AS DOUBLE)
                          * CAST(n1r AS DOUBLE) / CAST(nr AS DOUBLE)
                          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS e1_micro,
                      CAST(sum(CASE WHEN nr <= 1 THEN 0
                        ELSE CAST(floor(CAST(d AS DOUBLE)
                          * (CAST(n1r AS DOUBLE) / CAST(nr AS DOUBLE))
                          * (1.0 - CAST(n1r AS DOUBLE)
                               / CAST(nr AS DOUBLE))
                          * (CAST(nr AS DOUBLE) - CAST(d AS DOUBLE))
                          / (CAST(nr AS DOUBLE) - 1.0)
                          * 1e6 + 0.5) AS BIGINT) END) AS BIGINT)
                        AS v_micro
                    FROM tm GROUP BY n, n1)
              SELECT CAST(n - n1 AS BIGINT) AS n0, n1, o1, e1_micro,
                     v_micro,
                     CASE WHEN v_micro = 0 THEN NULL
                          ELSE CAST(floor(
                            (CAST(o1 AS DOUBLE)
                              - CAST(e1_micro AS DOUBLE) / 1e6)
                            * (CAST(o1 AS DOUBLE)
                              - CAST(e1_micro AS DOUBLE) / 1e6)
                            / (CAST(v_micro AS DOUBLE) / 1e6)
                            * 1e6 + 0.5) AS BIGINT)
                     END AS chi2_micro
              FROM q"""),
      "two-arm log-rank test on censored session lifetimes"),

    // Median survival + restricted mean survival time over s10's KM
    // curve — the two numbers a dashboard quotes from the curve, both
    // censoring-honest where raw lifetime means/medians are not.
    "s17_survival_summary" -> QueryDef(
      (s, dir) => {
        val gapNs = 3600L * 1000000000L
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = t(s, dir, "events")
          .withColumn("prev_ts", lag("ts", 1).over(wOrd))
          .withColumn("nw", when(col("prev_ts").isNull ||
            col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
          .withColumn("sid", sum("nw").over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sid")
          .agg(min("ts").as("t0"), max("ts").as("t1"))
        val end = sess.agg(max("t1").as("t_end"))
        val lifetimes = sess.crossJoin(broadcast(end))
          .select(expr("(t1 - t0) div 60000000000").as("t_min"),
            when(col("t_end") - col("t1") > gapNs, 1L).otherwise(0L)
              .as("death"))
        Attribution.survivalSummary(lifetimes, "t_min", "death")
      },
      Some("""WITH g AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id,
                     lag(epoch_ns(ts)) OVER w AS prev_ts
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id)),
              f AS (SELECT user_id, tsn, event_id,
                           CASE WHEN prev_ts IS NULL
                                  OR tsn - prev_ts > 3600000000000
                                THEN 1 ELSE 0 END AS nw
                    FROM g),
              sx AS (SELECT user_id, tsn,
                            sum(nw) OVER (PARTITION BY user_id
                              ORDER BY tsn, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
                     FROM f),
              se AS (SELECT user_id, sid, min(tsn) AS t0, max(tsn) AS t1
                     FROM sx GROUP BY 1, 2),
              en AS (SELECT max(t1) AS t_end FROM se),
              lt AS (SELECT (t1 - t0) // 60000000000 AS t,
                            CASE WHEN en.t_end - t1 > 3600000000000
                                 THEN 1 ELSE 0 END AS death
                     FROM se, en),
              bt AS (SELECT t, CAST(sum(death) AS BIGINT) AS n_events,
                            CAST(count(*) AS BIGINT) AS nt
                     FROM lt GROUP BY 1),
              rk AS (SELECT t, n_events,
                            (SELECT CAST(sum(nt) AS BIGINT) FROM bt)
                            - CAST(coalesce(sum(nt) OVER (ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS BIGINT)
                              AS n_risk
                     FROM bt),
              tm AS (SELECT t,
                            CASE WHEN n_events = 0 THEN 0
                                 WHEN n_risk = n_events
                                   THEN -1000000000000000
                                 ELSE CAST(floor(
                                   ln(CAST(n_risk - n_events AS DOUBLE)
                                      / CAST(n_risk AS DOUBLE))
                                   * 1e9 + 0.5) AS BIGINT)
                            END AS term
                     FROM rk),
              km AS (SELECT t,
                            round(exp(CAST(sum(term) OVER wc AS DOUBLE)
                              / 1e9), 6) AS surv
                     FROM tm
                     WINDOW wc AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
              nx AS (SELECT t, surv, lead(t) OVER (ORDER BY t) AS t_next
                     FROM km)
              SELECT min(CASE WHEN surv <= 0.5 THEN t END) AS t_median,
                     CAST(min(t) * 1000000
                       + sum(CASE WHEN t_next IS NULL THEN 0
                             ELSE CAST(floor(surv * (t_next - t) * 1e6
                               + 0.5) AS BIGINT) END) AS BIGINT)
                       AS rmst_micro,
                     max(t) AS horizon
              FROM nx"""),
      "median survival + restricted mean survival time off the KM curve"))
}
