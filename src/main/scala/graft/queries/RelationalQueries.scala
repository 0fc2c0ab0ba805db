package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin}
import graft.ext.{Incremental, Sampling, TimeSeries}
import Tables.t

/**
 * The relational surface the analytics layer adds on top of the reference
 * (SURVEY.md §2.4 "no joins anywhere" — required by the north star): joins of
 * every flavor, multi-way aggregation, windows, set ops, rollup, as-of.
 *
 * Scale posture per query is noted inline; the recurring rules:
 *  - dimensions (region/nation, and customer up to ~sf1) are broadcast —
 *    no shuffle of the fact table for dim enrichment;
 *  - fact-fact joins shuffle on the join key once, and aggregations that
 *    follow reuse that partitioning where possible;
 *  - money sums are rounded at the decimal position where the math is exact
 *    (inputs are 2-decimal), so double summation order can't flip the hash.
 */
object RelationalQueries {

  /** Run a SQL text against per-invocation UNIQUE temp-view names (round-2
   * verdict finding 2: fixed global names like `g3_customer` mutate shared
   * session state and race if query defs ever run concurrently). `sql`
   * receives the generated name for each logical table. `spark.sql` analyzes
   * eagerly, so the views are dropped before returning — no session residue,
   * and the resulting DataFrame keeps its resolved plan. */
  private def withViews(s: SparkSession, tables: (String, DataFrame)*)(
      sql: Map[String, String] => String): DataFrame = {
    val names = tables.map { case (key, df) =>
      val unique = s"graft_${key}_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      df.createOrReplaceTempView(unique)
      key -> unique
    }.toMap
    try s.sql(sql(names))
    finally names.values.foreach(s.catalog.dropTempView(_))
  }

  /** Irregular price bands for x2 (band_id, lo, hi) in integer cents —
   * half-open [lo, hi), shared verbatim by the Spark plan and the oracle.
   * Spans vary 2.5k–40k dollars so the bin replication path (not plain
   * bucketing) is what's exercised. */
  private val PriceBands: Seq[(Int, Long, Long)] = Seq(
    (0, 0L, 250000L), (1, 250000L, 500000L), (2, 500000L, 1000000L),
    (3, 1000000L, 2000000L), (4, 2000000L, 4000000L),
    (5, 4000000L, 7000000L), (6, 7000000L, 11000000L))

  val defs: Map[String, QueryDef] = Map(

    // Multi-way star join: fact orders → broadcast dims. One shuffle for the
    // final groupBy only; at 100 TB the dims stay broadcast and the fact scan
    // never re-partitions.
    "j1_star_join" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue")),
      Some("""SELECT r_name, count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS revenue
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name"""),
      "star join over broadcast dims + grouped money sum"),

    // TPC-H Q9-flavored profit rollup: fact lineitem enriched by TWO
    // broadcast dims (part, supplier→nation). One fact scan, one final
    // groupBy shuffle; at 100 TB part outgrows broadcast range and this
    // becomes the bucketed-join candidate (sources.Bucketing), but the
    // declared plan is unchanged — only the physical strategy moves.
    "j6_profit_by_type" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("p_type", "n_name")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            - col("p_retailprice") * col("l_quantity")), 2).as("profit")),
      Some("""SELECT p_type, n_name, count(*) AS n_items,
                     round(sum(l_extendedprice * (1 - l_discount)
                       - p_retailprice * l_quantity), 2) AS profit
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              GROUP BY p_type, n_name"""),
      "profit rollup: fact scan + 3 broadcast dims + grouped money math"),

    // TPC-H Q3-flavored shipping-priority query: segment-filtered customer
    // dim broadcast into orders, unshipped-revenue aggregation per order,
    // global top-10 via TakeOrderedAndProject (k rows per partition cross
    // the wire, never the aggregate). Date filters push into both fact
    // scans.
    "g9_unshipped_topk" -> QueryDef(
      (s, dir) => {
        val cutoff = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
        t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
          .join(t(s, dir, "orders").filter(col("o_orderdate") < cutoff),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "customer")
              .filter(col("c_mktsegment") === "BUILDING")),
            col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("odate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(desc("revenue"), asc("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                AND EXISTS (SELECT 1 FROM customer
                            WHERE c_custkey = o_custkey
                              AND c_mktsegment = 'BUILDING')
              GROUP BY 1, 2
              ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
      "Q3-flavored unshipped-revenue top-10 (semi-joined segment dim)"),

    // TPC-H Q18-flavored large-order detection: HAVING over a keyed
    // pre-aggregation, then ONE keyed join back to orders — the aggregate
    // side shrinks to qualifying keys before the join, so the orders scan
    // joins against a relation bounded by the selectivity of the HAVING.
    "g10_large_orders" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"))
        .filter(col("sum_qty") > 150)
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("sum_qty")),
      Some("""SELECT o_orderkey, o_custkey,
                     round(o_totalprice, 2) AS o_totalprice, sum_qty
              FROM orders
              JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
                    FROM lineitem GROUP BY 1
                    HAVING round(sum(l_quantity), 2) > 150) big
                ON o_orderkey = l_orderkey"""),
      "Q18-flavored large-order filter via HAVING pre-aggregation"),

    // Full outer join with null extension on both sides: customers with
    // no orders survive (n_orders coalesces to 0) and any order key with
    // no customer row survives symmetrically — the fixture has real
    // order-less customers (j3's anti-join finds them), so the left
    // extension is genuinely exercised. The aggregate side pre-shrinks to
    // one row per customer key before the join.
    "j7_outer_join" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val o = t(s, dir, "orders")
          .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("cust"),
            col("c_mktsegment").as("segment"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      },
      Some("""SELECT coalesce(c_custkey, o_custkey) AS cust,
                     c_mktsegment AS segment,
                     coalesce(n_orders, 0) AS n_orders
              FROM customer FULL OUTER JOIN
                   (SELECT o_custkey, count(*) AS n_orders
                    FROM orders GROUP BY 1) o
                ON c_custkey = o_custkey"""),
      "full outer join: null extension on both sides, zero-filled counts"),

    // Z-order (Morton) clustering key — the write-layout primitive behind
    // multi-dimensional row-group pruning (WriteLayout.writeZOrdered).
    // Pure shift/mask integer math, so the oracle replays the interleave
    // bit-for-bit; the gate pins engine parity of the key derivation.
    "z1_zorder_key" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.select(col("l_orderkey"), col("l_linenumber"),
          graft.sources.WriteLayout.zorderKey(
            Seq(col("l_partkey") % 256, col("l_suppkey") % 256), 8).as("z"))
      },
      Some {
        val terms = (for {
          (c, j) <- Seq("l_partkey", "l_suppkey").zipWithIndex
          i <- 0 until 8
        } yield s"(((($c % 256) >> $i) & 1) << ${i * 2 + j})").mkString(" | ")
        s"""SELECT l_orderkey, l_linenumber,
                   CAST($terms AS BIGINT) AS z
            FROM lineitem"""
      },
      "Morton/Z-order interleave key (bit-exact engine parity)"),

    // Zone-map pruning audit: z1 gates the KEY, this gates the BENEFIT —
    // simulated 1000-row files under the natural vs z-ordered layout,
    // per-file min/max stats (the parquet row-group zone maps), and the
    // file count a 2-D box predicate cannot skip in each. The z-ordered
    // layout keeps both dimensions' ranges tight per file, so its
    // files_hit collapses while the natural layout scans nearly
    // everything — the measured case for paying the clustering write.
    "z2_zonemap_prune" -> QueryDef(
      (s, dir) => {
        val base = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 256).as("pk"),
          (col("l_suppkey") % 256).as("sk"),
          graft.sources.WriteLayout.zorderKey(
            Seq(col("l_partkey") % 256, col("l_suppkey") % 256), 8).as("z"))
        graft.ext.Profile.zonemapPruneAudit(base,
          Seq(
            "natural" -> Seq(col("l_orderkey"), col("l_linenumber")),
            "zorder" -> Seq(col("z"), col("l_orderkey"),
              col("l_linenumber"))),
          fileRows = 1000,
          preds = Seq(("pk", 16L, 23L), ("sk", 40L, 47L)))
      },
      Some {
        val terms = (for {
          (c, j) <- Seq("l_partkey", "l_suppkey").zipWithIndex
          i <- 0 until 8
        } yield s"(((($c % 256) >> $i) & 1) << ${i * 2 + j})").mkString(" | ")
        def side(name: String, order: String): String =
          s"""${name}_p AS (SELECT pk, sk,
                   (row_number() OVER (ORDER BY $order) - 1) // 1000 AS f
                 FROM b),
              ${name}_f AS (SELECT f, min(pk) AS mpk, max(pk) AS xpk,
                                  min(sk) AS msk, max(sk) AS xsk
                            FROM ${name}_p GROUP BY f),
              ${name}_s AS (SELECT '$name' AS layout,
                     CAST(count(*) AS BIGINT) AS n_files,
                     CAST(sum(CASE WHEN mpk <= 23 AND xpk >= 16
                                    AND msk <= 47 AND xsk >= 40
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS files_hit
                     FROM ${name}_f)"""
        s"""WITH b AS (SELECT l_orderkey, l_linenumber,
                   l_partkey % 256 AS pk, l_suppkey % 256 AS sk,
                   CAST($terms AS BIGINT) AS z
                 FROM lineitem),
            ${side("natural", "l_orderkey, l_linenumber")},
            ${side("zorder", "z, l_orderkey, l_linenumber")}
            SELECT * FROM natural_s UNION ALL SELECT * FROM zorder_s"""
      },
      "zone-map skip audit: files hit by a 2-D box, natural vs z-order"),

    // Hilbert-curve clustering key: the oracle replays the identical
    // top-down quadrant fold as 8 chained CTEs (rotate/reflect per bit
    // level, exact integer arithmetic) — bit-exact engine parity on the
    // full relation, the z1 discipline for the better curve.
    "z3_hilbert_key" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val li = t(s, dir, "lineitem")
        li.select(col("l_orderkey"), col("l_linenumber"),
          graft.sources.WriteLayout.hilbertKey(
            col("l_partkey") % 256, col("l_suppkey") % 256, 8).as("h"))
      },
      Some {
        val levels = (7 to 0 by -1).map { i =>
          val sv = 1L << i
          val prev = if (i == 7) "hb" else s"h${i + 1}"
          s"""h$i AS (SELECT l_orderkey, l_linenumber,
                 CASE WHEN (hy & $sv) > 0 THEN hx
                      ELSE CASE WHEN (hx & $sv) > 0 THEN ${sv - 1} - hy
                           ELSE hy END
                 END AS hx,
                 CASE WHEN (hy & $sv) > 0 THEN hy
                      ELSE CASE WHEN (hx & $sv) > 0 THEN ${sv - 1} - hx
                           ELSE hx END
                 END AS hy,
                 hd + $sv * $sv *
                   xor(3 * (CASE WHEN (hx & $sv) > 0 THEN 1 ELSE 0 END),
                       (CASE WHEN (hy & $sv) > 0 THEN 1 ELSE 0 END))
                   AS hd
               FROM $prev)"""
        }.mkString(",\n")
        s"""WITH hb AS (SELECT l_orderkey, l_linenumber,
                CAST(l_partkey % 256 AS BIGINT) AS hx,
                CAST(l_suppkey % 256 AS BIGINT) AS hy,
                CAST(0 AS BIGINT) AS hd
              FROM lineitem),
            $levels
            SELECT l_orderkey, l_linenumber, CAST(hd AS BIGINT) AS h
            FROM h0"""
      },
      "Hilbert-curve clustering key (bit-exact engine parity)"),

    // Morton vs Hilbert at the same file size: z2's benefit audit run
    // over the two curves head-to-head. Hilbert's consecutive keys are
    // always adjacent cells (no power-of-two diagonal jumps), so its
    // per-file bounding boxes are at least as tight — the measured case
    // for preferring it as the clustering write's key.
    "z4_hilbert_prune" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        // materialized: each layout's globalOrder re-evaluates its input
        // through range-sampling + sort + zipWithIndex — pay the key
        // computation ONCE per row
        val base = graft.ext.Dedup.materialize(
          t(s, dir, "lineitem").select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_partkey") % 256).as("pk"),
            (col("l_suppkey") % 256).as("sk"),
            graft.sources.WriteLayout.zorderKey(
              Seq(col("l_partkey") % 256, col("l_suppkey") % 256), 8)
              .as("z"),
            graft.sources.WriteLayout.hilbertKey(
              col("l_partkey") % 256, col("l_suppkey") % 256, 8).as("h")))
        graft.ext.Profile.zonemapPruneAudit(base,
          Seq(
            "zorder" -> Seq(col("z"), col("l_orderkey"),
              col("l_linenumber")),
            "hilbert" -> Seq(col("h"), col("l_orderkey"),
              col("l_linenumber"))),
          fileRows = 1000,
          preds = Seq(("pk", 16L, 23L), ("sk", 40L, 47L)))
      },
      Some {
        val zterms = (for {
          (c, j) <- Seq("l_partkey", "l_suppkey").zipWithIndex
          i <- 0 until 8
        } yield s"(((($c % 256) >> $i) & 1) << ${i * 2 + j})")
          .mkString(" | ")
        val levels = (7 to 0 by -1).map { i =>
          val sv = 1L << i
          val prev = if (i == 7) "hb" else s"h${i + 1}"
          s"""h$i AS (SELECT l_orderkey, l_linenumber, pk, sk, z,
                 CASE WHEN (hy & $sv) > 0 THEN hx
                      ELSE CASE WHEN (hx & $sv) > 0 THEN ${sv - 1} - hy
                           ELSE hy END
                 END AS hx,
                 CASE WHEN (hy & $sv) > 0 THEN hy
                      ELSE CASE WHEN (hx & $sv) > 0 THEN ${sv - 1} - hx
                           ELSE hx END
                 END AS hy,
                 hd + $sv * $sv *
                   xor(3 * (CASE WHEN (hx & $sv) > 0 THEN 1 ELSE 0 END),
                       (CASE WHEN (hy & $sv) > 0 THEN 1 ELSE 0 END))
                   AS hd
               FROM $prev)"""
        }.mkString(",\n")
        def side(name: String, order: String): String =
          s"""${name}_p AS (SELECT pk, sk,
                   (row_number() OVER (ORDER BY $order) - 1) // 1000 AS f
                 FROM hf),
              ${name}_f AS (SELECT f, min(pk) AS mpk, max(pk) AS xpk,
                                  min(sk) AS msk, max(sk) AS xsk
                            FROM ${name}_p GROUP BY f),
              ${name}_s AS (SELECT '$name' AS layout,
                     CAST(count(*) AS BIGINT) AS n_files,
                     CAST(sum(CASE WHEN mpk <= 23 AND xpk >= 16
                                    AND msk <= 47 AND xsk >= 40
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS files_hit
                     FROM ${name}_f)"""
        s"""WITH hb AS (SELECT l_orderkey, l_linenumber,
                l_partkey % 256 AS pk, l_suppkey % 256 AS sk,
                CAST($zterms AS BIGINT) AS z,
                CAST(l_partkey % 256 AS BIGINT) AS hx,
                CAST(l_suppkey % 256 AS BIGINT) AS hy,
                CAST(0 AS BIGINT) AS hd
              FROM lineitem),
            $levels,
            hf AS (SELECT l_orderkey, l_linenumber, pk, sk, z,
                          hd AS h FROM h0),
            ${side("zorder", "z, l_orderkey, l_linenumber")},
            ${side("hilbert", "h, l_orderkey, l_linenumber")}
            SELECT * FROM zorder_s UNION ALL SELECT * FROM hilbert_s"""
      },
      "zone-map skip audit: Morton vs Hilbert at the same file size"),

    // Small-file compaction PLAN (the Delta-OPTIMIZE bin-packing
    // arithmetic, relationally): per-dir running-byte fill to the
    // target — path order preserved so a clustered layout's sort
    // survives the rewrite; the audit "files before vs after" is one
    // agg over this plan. WriteLayout.compactTable EXECUTES the same
    // arithmetic with the staged-swap publish (spec-gated — filesystem
    // semantics have no SQL oracle).
    "z5_compaction_plan" -> QueryDef(
      (s, dir) => graft.sources.WriteLayout.compactionPlan(
        t(s, dir, "orders").select(
          col("o_orderpriority").as("dir"),
          lpad(col("o_orderkey").cast("string"), 12, "0").as("path"),
          floor(col("o_totalprice") * 100).cast("long").as("bytes")),
        targetBytes = 1000000L),
      Some("""WITH f AS (SELECT o_orderpriority AS dir,
                     lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS path,
                     CAST(floor(o_totalprice * 100) AS BIGINT) AS bytes
                   FROM orders)
              SELECT dir, path, bytes,
                     CAST((sum(bytes) OVER (PARTITION BY dir
                             ORDER BY path)
                           - bytes) // 1000000 AS BIGINT) AS out_file
              FROM f"""),
      "small-file compaction plan: per-dir running-byte bin fill"),

    // File-grain Bloom data-skipping audit: z2/z4 prune RANGE boxes via
    // min/max zones; a scattered POINT lookup passes every zone, and
    // only a per-file Bloom image (parquet column bloom filters) prunes
    // it. Natural-order files, probe l_partkey = 17: bloom_pass
    // collapses to ~the true-hit files while zones would scan 60/60.
    "z6_file_bloom_prune" -> QueryDef(
      (s, dir) => graft.ext.Profile.fileBloomPruneAudit(
        t(s, dir, "lineitem"),
        Seq(col("l_orderkey"), col("l_linenumber")),
        fileRows = 1000, keyCol = "l_partkey", probe = "17"),
      Some {
        val b = graft.ext.Sketches.BloomBits
        // local mirror of Dedup.seededHash's SQL form (the d30 oracle's
        // hash expression)
        def sqlH(expr0: String, seed: Int): String =
          s"('0x' || substr(md5('$seed:' || $expr0), 1, 8))::BIGINT"
        def bitExprs(src: String): String =
          (0 until graft.ext.Sketches.BloomHashes).map(i =>
            s"SELECT f, (${sqlH(src,
              graft.ext.Sketches.BloomSeedBase + i)}) % $b AS bit " +
              "FROM fl").mkString(" UNION ALL ")
        val probeExprs =
          (0 until graft.ext.Sketches.BloomHashes).map(i =>
            s"SELECT (${sqlH("'17'",
              graft.ext.Sketches.BloomSeedBase + i)}) % $b AS bit")
            .mkString(" UNION ALL ")
        s"""WITH fl AS (
                SELECT (row_number() OVER (ORDER BY l_orderkey,
                          l_linenumber) - 1) // 1000 AS f,
                       CAST(l_partkey AS VARCHAR) AS k
                FROM lineitem),
            fb AS (SELECT DISTINCT f, bit FROM (${bitExprs("k")})),
            pb AS (SELECT DISTINCT bit FROM ($probeExprs)),
            pass AS (SELECT f FROM fb JOIN pb USING (bit)
                     GROUP BY f
                     HAVING count(*) = (SELECT count(*) FROM pb)),
            hit AS (SELECT DISTINCT f FROM fl WHERE k = '17')
            SELECT (SELECT CAST(count(DISTINCT f) AS BIGINT) FROM fl)
                     AS n_files,
                   (SELECT CAST(count(*) AS BIGINT) FROM pass)
                     AS files_bloom_pass,
                   (SELECT CAST(count(*) AS BIGINT) FROM hit)
                     AS files_true_hit"""
      },
      "file-grain Bloom skipping: point-lookup pruning zones cannot do"),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    // MATCH each other — the join-matrix variant a plain `=` can never
    // produce (it drops NULL rows from both sides). Keys are derived with
    // nullif so each side carries a genuine NULL group; the only
    // cross-side match IS the null pair, which a plain equi join returns
    // zero rows for. Plans as a hash join (null-safe equality is still an
    // equi key to Spark).
    "j8_nullsafe_join" -> QueryDef(
      (s, dir) => {
        val l = t(s, dir, "orders")
          .groupBy(expr("nullif(o_orderpriority, '1-URGENT')").as("k"))
          .agg(count(lit(1)).as("n_l"))
        val r = t(s, dir, "events")
          .groupBy(expr("nullif(event_type, 'error')").as("k2"))
          .agg(count(lit(1)).as("n_r"))
        l.join(r, col("k") <=> col("k2"))
          .select(col("k"), col("n_l"), col("n_r"))
      },
      Some("""WITH l AS (
                SELECT nullif(o_orderpriority, '1-URGENT') AS k,
                       count(*) AS n_l
                FROM orders GROUP BY 1),
              r AS (
                SELECT nullif(event_type, 'error') AS k2, count(*) AS n_r
                FROM events GROUP BY 1)
              SELECT l.k, l.n_l, r.n_r
              FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k2"""),
      "null-safe equality join: NULL keys match (still hash-planned)"),

    // Correlated LATERAL subquery (Spark 3.2+ lateral join): top-2
    // customers by balance PER nation, written as the per-row subquery a
    // SQL user reaches for. Catalyst decorrelates it into a join +
    // per-group limit — the declarative twin of w1's window top-n — so no
    // driver loop and no N subquery executions survive planning. Ties
    // broken by name for a deterministic hash.
    "j9_lateral_topn" -> QueryDef(
      (s, dir) => withViews(s, "nation" -> t(s, dir, "nation"),
        "customer" -> t(s, dir, "customer")) { v =>
        s"""SELECT n.n_name, c.c_name, c.c_acctbal
            FROM ${v("nation")} n
            JOIN LATERAL (
              SELECT c_name, c_acctbal FROM ${v("customer")}
              WHERE c_nationkey = n.n_nationkey
              ORDER BY c_acctbal DESC, c_name
              LIMIT 2) c"""
      },
      Some("""SELECT n.n_name, c.c_name, c.c_acctbal
              FROM nation n
              JOIN LATERAL (
                SELECT c_name, c_acctbal FROM customer
                WHERE c_nationkey = n.n_nationkey
                ORDER BY c_acctbal DESC, c_name
                LIMIT 2) c ON true"""),
      "correlated LATERAL top-n per outer row (decorrelated by Catalyst)"),

    // Semi join (EXISTS): customers that placed at least one order, by nation.
    "j2_semi_join" -> QueryDef(
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n")),
      Some("""SELECT c_nationkey, count(*) AS n FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              GROUP BY c_nationkey"""),
      "left-semi join + group count"),

    // Anti join (NOT EXISTS): customers that never emitted an event.
    "j3_anti_join" -> QueryDef(
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "events"), col("c_custkey") === col("user_id"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n")),
      Some("""SELECT c_mktsegment, count(*) AS n FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
              GROUP BY c_mktsegment"""),
      "left-anti join + group count"),

    // TPC-H Q1-flavored pricing summary: single scan, partial+final hash agg,
    // 4-group output. Filters push into the parquet scan.
    "g1_pricing_summary" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, l_linestatus,
                     round(sum(l_quantity), 2) AS sum_qty,
                     round(sum(l_extendedprice), 2) AS sum_base,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                     round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                     count(*) AS n_rows
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
              GROUP BY l_returnflag, l_linestatus"""),
      "pricing summary: filtered scan + multi-aggregate"),

    // Distinct aggregation (two-phase shuffle: distinct expand then agg).
    "g2_distinct_agg" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
                     count(*) AS n_rows
              FROM lineitem GROUP BY l_returnflag"""),
      "count-distinct aggregation"),

    // Rollup (grouping sets): region → nation → grand total. Expressed via
    // spark.sql — the Dataset rollup API after multi-joins trips Spark 4.1's
    // ambiguous-self-join detector even with fresh aliases (Expand re-refs).
    "g3_rollup" -> QueryDef(
      (s, dir) => withViews(s,
          "customer" -> t(s, dir, "customer"),
          "nation" -> t(s, dir, "nation"),
          "region" -> t(s, dir, "region")) { v =>
        s"""
          SELECT coalesce(r_name, '(all)') AS region,
                 coalesce(n_name, '(all)') AS nation,
                 count(*) AS n, round(sum(c_acctbal), 2) AS acct_sum
          FROM ${v("customer")}
          JOIN ${v("nation")} ON c_nationkey = n_nationkey
          JOIN ${v("region")} ON n_regionkey = r_regionkey
          GROUP BY ROLLUP (r_name, n_name)"""
      },
      Some("""SELECT coalesce(r_name, '(all)') AS region,
                     coalesce(n_name, '(all)') AS nation,
                     count(*) AS n, round(sum(c_acctbal), 2) AS acct_sum
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY ROLLUP (r_name, n_name)"""),
      "rollup grouping sets over dim join"),

    // Conditional aggregation (pivot-shaped without PIVOT).
    "g4_conditional_agg" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          round(sum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))), 2).as("purchase_value"),
          round(sum(when(col("event_type") === "click", col("value")).otherwise(lit(0.0))), 2).as("click_value"),
          count(when(col("event_type") === "error", lit(1))).as("n_errors")),
      Some("""SELECT user_id,
                     round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value,
                     round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 2) AS click_value,
                     count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
              FROM events GROUP BY user_id"""),
      "conditional (pivot-shaped) aggregation"),

    // Partitioned window: top-3 orders per customer (deterministic tie-break).
    "w1_topn_per_group" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey")
            .orderBy(desc("o_totalprice"), asc("o_orderkey"))))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn"),
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) WHERE rn <= 3"""),
      "top-N per group via partitioned row_number"),

    // Same result as w1 through the custom bounded-heap aggregate: map-side
    // partial top-k, k rows per group shuffled, no full window sort. Since
    // round 3 this is the `TypedTopK` TypedImperativeAggregate (primitive
    // parallel-array buffer, serialized only at shuffle boundaries) — the
    // udaf/ExpressionEncoder form it replaces round-tripped the buffer
    // through Catalyst serialization on every reduce (round-2 verdict
    // finding 3; equivalence + A/B pinned in TopKAggregatorSpec). Oracle
    // identical to w1's.
    "w4_topk_agg" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(graft.functions.GraftFunctions.topK(
            col("o_totalprice"), col("o_orderkey"), 3).as("top"))
          .select(col("o_custkey"), posexplode(col("top")))
          .select(col("o_custkey"), col("col.id").as("o_orderkey"),
            (col("pos") + 1).cast("int").as("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) WHERE rn <= 3"""),
      "top-N per group via custom bounded-heap Aggregator (no window sort)"),

    // Running sum per user over event time (ts is long nanos on the Spark
    // side — see GraftSession nanosAsLong; DuckDB compares via epoch_ns).
    // Full window-function surface beyond ranking/frames: lag/lead offsets
    // and ntile bucketing in one pass over the per-user event order. Gaps
    // and ordering use MICROsecond precision on both sides: DuckDB's
    // parquet reader truncates TIMESTAMP(NANOS) to its native us timestamp,
    // so ns-level arithmetic would silently diverge (event_id breaks any
    // sub-us ordering ties deterministically).
    "w5_lead_lag_ntile" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        t(s, dir, "events")
          .withColumn("ts_us", expr("ts div 1000"))
          .select(
            col("event_id"), col("user_id"),
            (col("ts_us") - lag("ts_us", 1).over(w)).as("gap_us"),
            lead("event_type", 1).over(w).as("next_type"),
            ntile(4).over(w).as("quartile"))
      },
      Some("""SELECT event_id, user_id,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
                     lead(event_type) OVER w AS next_type,
                     CAST(ntile(4) OVER w AS INTEGER) AS quartile
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)"""),
      "lag/lead offsets + ntile buckets over per-user event order"),

    "w2_running_sum" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .withColumn("run_total", round(
          sum("value").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .select("event_id", "user_id", "run_total"),
      Some("""SELECT event_id, user_id,
                     round(sum(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
              FROM events"""),
      "per-key running sum ordered by event time"),

    // Sessionization (batch form): 1-hour-gap sessions per user via lag +
    // running flag sum — the standard scalable pattern (one shuffle on user).
    "s1_sessionize" -> QueryDef(
      (s, dir) => {
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gapNs = 3600L * 1000000000L
        t(s, dir, "events")
          .withColumn("prev_ts", lag("ts", 1).over(wOrd))
          .withColumn("new_sess",
            when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L)
              .otherwise(0L))
          .groupBy("user_id")
          .agg(sum("new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
      },
      Some("""WITH g AS (
                SELECT user_id, epoch_ns(ts) AS tsn, event_id,
                       lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                         ORDER BY epoch_ns(ts), event_id) AS prev_ts
                FROM events)
              SELECT user_id,
                     CAST(sum(CASE WHEN prev_ts IS NULL
                                    OR tsn - prev_ts > 3600000000000
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                     count(*) AS n_events
              FROM g GROUP BY user_id"""),
      "gap-based sessionization via lag + flag-sum"),

    // Conversation assembly: s1's sessions serialized into per-session
    // training DOCUMENTS (ordered type:props turns, newline-joined) —
    // the chat/SFT prep step that makes interaction logs feed the same
    // dedup/quality/packing machinery the documents table does. The
    // ordered concat is an array_sort(collect_list(struct)) in the
    // engine and an ORDER BY string_agg in the oracle.
    "s6_conversation" -> QueryDef(
      (s, dir) => graft.ext.TextAnalysis.conversationAssembly(
        t(s, dir, "events")),
      Some("""WITH g AS (
                SELECT user_id, epoch_ns(ts) AS tsn, event_id,
                       event_type || ':' || coalesce(props, '') AS turn,
                       lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                         ORDER BY epoch_ns(ts), event_id) AS prev_ts
                FROM events),
              sx AS (
                SELECT user_id, tsn, event_id, turn,
                       sum(CASE WHEN prev_ts IS NULL
                                 OR tsn - prev_ts > 3600000000000
                                THEN 1 ELSE 0 END)
                         OVER (PARTITION BY user_id
                               ORDER BY tsn, event_id) AS session_id
                FROM g)
              SELECT user_id,
                     CAST(session_id AS BIGINT) AS session_id,
                     CAST(count(*) AS BIGINT) AS n_turns,
                     min(tsn) AS ts_start,
                     max(tsn) AS ts_end,
                     string_agg(turn, chr(10) ORDER BY tsn, event_id)
                       AS text
              FROM sx GROUP BY user_id, session_id"""),
      "conversation assembly: sessions serialized as training documents"),

    // First-order Markov next-event model: per-user lead() pairs (one
    // window sort, (ts, event_id) total order) -> transition counts ->
    // row-normalized probabilities in EXACT integer micro-units
    // ((c*1e6) div row_total — no doubles anywhere). The behavioral
    // transition matrix that prices "what follows a view?" for session
    // simulation and next-event prediction.
    "s7_markov_transitions" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("from_type"),
            lead(col("event_type"), 1).over(w).as("to_type"))
          .filter(col("to_type").isNotNull)
          .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        val totals = pairs.groupBy("from_type")
          .agg(sum("n").as("n_from"))
        pairs.join(totals, Seq("from_type"))
          .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
            expr("(n * 1000000L) div n_from").as("p_micro"))
      },
      Some("""WITH g AS (
                SELECT event_type AS from_type,
                       lead(event_type) OVER (PARTITION BY user_id
                         ORDER BY epoch_ns(ts), event_id) AS to_type
                FROM events),
              c AS (SELECT from_type, to_type,
                           CAST(count(*) AS BIGINT) AS n
                    FROM g WHERE to_type IS NOT NULL
                    GROUP BY from_type, to_type),
              tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
                      FROM c GROUP BY from_type)
              SELECT c.from_type, c.to_type, c.n, tot.n_from,
                     (c.n * 1000000) // tot.n_from AS p_micro
              FROM c JOIN tot ON tot.from_type = c.from_type"""),
      "first-order Markov transition matrix, exact integer probabilities"),

    // Spark's declarative session_window (gap-merged event-time sessions)
    // in batch form — same semantics as s1's lag+flag-sum derivation, and
    // the oracle IS that derivation, so the built-in operator is
    // cross-checked against the classic formulation. One shuffle per key,
    // session merge handled by the operator (no self-join).
    "s4_session_window" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
        .groupBy(col("user_id"),
          session_window(col("event_ts"), "1 hour").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("sess_start"),
          unix_micros(col("sw.end")).as("sess_end"),
          col("n_events")),
      Some("""WITH g AS (
                SELECT user_id, epoch_us(ts) AS tsu,
                       lag(epoch_us(ts)) OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts)) AS prev
                FROM events),
              flagged AS (
                SELECT user_id, tsu,
                       sum(CASE WHEN prev IS NULL
                                  OR tsu - prev > 3600000000 THEN 1
                                ELSE 0 END) OVER (PARTITION BY user_id
                         ORDER BY tsu ROWS UNBOUNDED PRECEDING) AS sess_id
                FROM g)
              SELECT user_id, min(tsu) AS sess_start,
                     max(tsu) + 3600000000 AS sess_end,
                     count(*) AS n_events
              FROM flagged GROUP BY user_id, sess_id"""),
      "built-in session_window sessions == classic lag+flag-sum derivation"),

    // Sweep-line peak concurrency: max simultaneous 5-minute event
    // intervals per type + the first instant the peak is reached. Endpoint
    // deltas pre-aggregate to per-(key, instant) NET values (half-open
    // intervals: an end at t frees its slot before a start at t takes it),
    // so the running sum's order key is unique per partition and one
    // per-key window sort answers the capacity question — never an
    // interval self-join.
    "s5_peak_concurrency" -> QueryDef(
      (s, dir) => graft.ext.TimeSeries.peakConcurrency(
        t(s, dir, "events"), "event_type", "ts",
        durationNs = 300L * 1000000000L),
      Some("""WITH ep AS (
                SELECT event_type, epoch_ns(ts) AS t, 1 AS delta FROM events
                UNION ALL
                SELECT event_type, epoch_ns(ts) + 300000000000, -1 FROM events),
              net AS (SELECT event_type, t, CAST(sum(delta) AS BIGINT) AS net
                      FROM ep GROUP BY 1, 2),
              r AS (SELECT event_type, t,
                           sum(net) OVER (PARTITION BY event_type ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS run
                    FROM net),
              p AS (SELECT event_type, max(run) AS peak FROM r GROUP BY 1)
              SELECT r.event_type, CAST(p.peak AS BIGINT) AS peak,
                     CAST(min(r.t) FILTER (WHERE r.run = p.peak) AS BIGINT)
                       AS first_peak_ts
              FROM r JOIN p USING (event_type)
              GROUP BY 1, 2"""),
      "sweep-line peak concurrency per event type (+ first instant reached)"),

    // OHLC bar resampling: per (event_type, hour) open/high/low/close +
    // micro-quantized value sum. Open/close are struct-min/max argmin
    // rides of ONE hash-agg (no per-bar window sort — the oracle's
    // row_number formulation is what the operator avoids); the (ts,
    // event_id) tie-break makes both endpoints total-ordered.
    "x7_ohlc_resample" -> QueryDef(
      (s, dir) => graft.ext.TimeSeries.ohlcBars(
        t(s, dir, "events"), "event_type", "ts", "value", "event_id",
        barNs = 3600L * 1000000000L),
      Some("""WITH g AS (SELECT event_type,
                     (epoch_ns(ts) // 3600000000000) * 3600000000000
                       AS bar_start,
                     epoch_ns(ts) AS tns, event_id, value
                     FROM events),
              rn AS (SELECT *,
                       row_number() OVER (PARTITION BY event_type, bar_start
                         ORDER BY tns, event_id) AS ro,
                       row_number() OVER (PARTITION BY event_type, bar_start
                         ORDER BY tns DESC, event_id DESC) AS rc
                     FROM g)
              SELECT event_type, bar_start,
                     max(CASE WHEN ro = 1 THEN value END) AS open,
                     max(value) AS high, min(value) AS low,
                     max(CASE WHEN rc = 1 THEN value END) AS close,
                     CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))
                       AS BIGINT) AS v_micro,
                     count(*) AS n
              FROM rn GROUP BY event_type, bar_start"""),
      "OHLC bar resampling: argmin/argmax endpoints in one hash-agg"),

    // EWMA smoothing + spike detection over per-(type, hour) counts:
    // alpha = 1/2 truncated at 12 lags — every weight dyadic, integer
    // counts times 2^-i exact in IEEE doubles, so the smoothed series
    // and the spike flag replay bit-for-bit with NO quantization. One
    // per-key window sort (a lag chain, not a self-join).
    "x8_ewma_spike" -> QueryDef(
      (s, dir) => graft.ext.TimeSeries.ewmaAnomaly(
        t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("ts div 3600000000000").as("bucket"))
          .agg(count(lit(1)).as("n")),
        "event_type", "bucket", "n"),
      Some {
        val ep = (1 to 12)
          .map(i => s"coalesce(lag(n, $i) OVER w, 0) * power(0.5, $i)")
          .mkString(" + ")
        s"""WITH s AS (SELECT event_type,
                     epoch_ns(ts) // 3600000000000 AS bucket,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            e AS (SELECT event_type, bucket, n,
                         ($ep) AS ep,
                         row_number() OVER w AS rn
                  FROM s
                  WINDOW w AS (PARTITION BY event_type ORDER BY bucket))
            SELECT event_type, bucket, n,
                   CAST(n AS DOUBLE) * 0.5 + ep * 0.5 AS ewma,
                   (rn > 12 AND CAST(n AS DOUBLE) > 2.0 * ep + 5.0)
                     AS is_spike
            FROM e"""
      },
      "EWMA (alpha=1/2, dyadic-exact) smoothing + spike flags per type"),

    // One-sided CUSUM change detection (Page 1954) over the same
    // per-(type, hour) counts as x8: the sequential small-shift detector,
    // folded into ONE window sort via the prefix-sum identity
    // S_n = C_n − min(0, min_{t≤n} C_t). Pure BIGINT arithmetic — the
    // oracle replays sum/min/least on identical integers.
    "x9_cusum" -> QueryDef(
      (s, dir) => graft.ext.TimeSeries.cusum(
        t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("ts div 3600000000000").as("bucket"))
          .agg(count(lit(1)).as("n")),
        "event_type", "bucket", "n",
        target = 10L, slack = 2L, threshold = 50L),
      Some("""WITH s AS (SELECT event_type,
                     epoch_ns(ts) // 3600000000000 AS bucket,
                     CAST(count(*) AS BIGINT) AS n
                     FROM events GROUP BY 1, 2),
              c AS (SELECT event_type, bucket, n,
                           CAST(sum(n - 10 - 2) OVER w AS BIGINT) AS c
                    FROM s
                    WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING))
              SELECT event_type, bucket, n,
                     c - least(0, min(c) OVER w) AS s_stat,
                     (c - least(0, min(c) OVER w)) > 50 AS is_alarm
              FROM c
              WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                           ROWS UNBOUNDED PRECEDING)"""),
      "one-sided CUSUM drift detector via the prefix-sum identity"),

    // Seasonal-baseline deviations: per (type, hour-of-day) all-days mean
    // as the baseline, each (type, day, hour) cell scored against it —
    // the detector for daily-rhythm traffic where a trailing smoother
    // chases the cycle itself. Day/hod by pure integer division on epoch
    // ns (no calendar functions — their week/zone conventions differ
    // cross-engine); baseline over the FULL day span.
    "x10_seasonal_baseline" -> QueryDef(
      (s, dir) => graft.ext.TimeSeries.seasonalDeviation(
        t(s, dir, "events"), "event_type", "ts"),
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
                       FROM cells GROUP BY event_type, hod)
              SELECT c.event_type, c.day, c.hod, c.n, b.baseline_micro,
                     (c.n * 1000000 > 3 * b.baseline_micro AND c.n >= 5)
                       AS is_anomaly
              FROM cells c JOIN base b
                ON b.event_type = c.event_type AND b.hod = c.hod"""),
      "seasonal-baseline anomaly cells (integer day/hod, full-span mean)"),

    // Recency-decayed per-user value: Σ value·2^(−⌊age_days/7⌋), age from
    // the observed max timestamp (one broadcast scalar). The staircase
    // dyadic decay keeps every weight an exact power of two — value/2^k
    // is pure exponent arithmetic — and per-event micro-quantization
    // makes the keyed sums partitioning-independent. One scan + one
    // hash-agg; at 100 TB this is a map-side-combined groupBy, nothing
    // iterative, nothing windowed.
    "x11_decayed_value" -> QueryDef(
      (s, dir) => graft.ext.TimeSeries.decayedValue(
        t(s, dir, "events"), "user_id", "ts", "value", halfLifeDays = 7),
      Some("""WITH r AS (SELECT max(epoch_ns(ts)) AS t_ref FROM events),
              g AS (SELECT user_id, value,
                      ((r.t_ref - epoch_ns(ts)) // 86400000000000) // 7 AS k
                    FROM events, r)
              SELECT user_id,
                     CAST(count(*) AS BIGINT) AS n_events,
                     CAST(sum(CASE WHEN k < 63 THEN
                         CAST(floor(value / (CAST(1 AS BIGINT) << k)
                           * 1e6 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS decayed_micro,
                     CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))
                       AS BIGINT) AS raw_micro
              FROM g GROUP BY user_id"""),
      "recency-decayed value rollup (staircase dyadic half-life decay)"),

    // Ordered-step conversion funnel: first view, first click AFTER that
    // view, first purchase AFTER that click — the shared strict-after
    // chain (graft.ext.Attribution.funnelStageTimes, ONE copy of the
    // rule for s2/s13/the streaming twin). Each stage is one keyed
    // hash-agg over a type-filtered scan joined to the (one-row-per-user,
    // AQE-broadcastable) previous stage — no window sort over the full
    // event stream, no per-user event collection; stages stay keyed passes
    // at any scale. Timestamps compared at MICROsecond precision on both
    // sides (w2/w5 convention: DuckDB's parquet reader truncates
    // TIMESTAMP_NS to us, so ns-precision outputs can never hash-match).
    "s2_funnel" -> QueryDef(
      (s, dir) => graft.ext.Attribution.funnelStageTimes(
        t(s, dir, "events")),
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
                WHERE e.event_type = 'purchase' GROUP BY 1)
              SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
              FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""),
      "ordered-step conversion funnel via staged keyed aggregations"),

    // Cohort retention matrix: users bucketed by first-active day, activity
    // counted per (cohort, day-offset). Two keyed shuffles total (distinct
    // activity days, then cohort join + agg) — the denominator for any
    // retention dashboard, scale-independent of per-user event counts.
    "s3_retention" -> QueryDef(
      (s, dir) => {
        val day = to_date(timestamp_micros(expr("ts div 1000")))
        val act = t(s, dir, "events")
          .select(col("user_id"), day.as("day")).distinct()
        val cohort = act.groupBy("user_id").agg(min("day").as("cohort_day"))
        act.join(cohort, "user_id")
          .groupBy(col("cohort_day"),
            datediff(col("day"), col("cohort_day")).as("day_offset"))
          .agg(countDistinct("user_id").as("n_users"))
      },
      Some("""WITH act AS (
                SELECT DISTINCT user_id,
                       CAST(date_trunc('day', ts) AS DATE) AS day
                FROM events),
              coh AS (
                SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
              SELECT c.cohort_day,
                     CAST(a.day - c.cohort_day AS INTEGER) AS day_offset,
                     count(DISTINCT a.user_id) AS n_users
              FROM act a JOIN coh c USING (user_id)
              GROUP BY 1, 2"""),
      "cohort retention matrix: first-active cohort x day offset"),

    // Rolling-frame features per key (feature-engineering staple): bounded
    // 7-row trailing frame, so state per row is O(frame), not O(history).
    // One shuffle + one sort per key — same cost envelope as w2. Sum
    // rounded at the 2-decimal position where the input is exact; min/max
    // are order-independent.
    "w6_rolling" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-6, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            round(sum("value").over(w), 2).as("roll_sum"),
            min("value").over(w).as("roll_min"),
            max("value").over(w).as("roll_max"),
            count(lit(1)).over(w).as("roll_n"))
      },
      Some("""SELECT event_id, user_id,
                     round(sum(value) OVER w, 2) AS roll_sum,
                     min(value) OVER w AS roll_min,
                     max(value) OVER w AS roll_max,
                     count(*) OVER w AS roll_n
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""),
      "trailing 7-row rolling features per key (bounded frame state)"),

    // Event-TIME rolling features: RANGE frame over the raw nanos order
    // key (trailing 1 hour), the value-based sibling of w6's ROWS frame —
    // frame membership follows the clock, not a row count, so bursty and
    // sparse keys window correctly. Equal-timestamp rows are peers in
    // both engines (RANGE semantics), which ROWS could only approximate
    // with a tie-break. Same single per-key sort as every window op.
    "w9_time_rolling" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
          .rangeBetween(-3600L * 1000000000L, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            round(sum("value").over(w), 2).as("hr_sum"),
            count(lit(1)).over(w).as("hr_n"))
      },
      Some("""SELECT event_id, user_id,
                     round(sum(value) OVER w, 2) AS hr_sum,
                     count(*) OVER w AS hr_n
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
                           RANGE BETWEEN 3600000000000 PRECEDING
                                 AND CURRENT ROW)"""),
      "trailing 1-hour event-time rolling features (RANGE frame)"),

    // Per-key OLS trend (value-over-time slope) with EXACT integer moment
    // sums: y in cents, x in whole seconds from the key's first event, so
    // Σx, Σy, Σxy, Σx² are exact BIGINTs in both engines and the slope is
    // one deterministic double division at the end — group-wise regression
    // without order-dependent floating-point accumulation. One shuffle for
    // the per-key min, one for the moment agg. Degenerate keys (all events
    // in the same second) are excluded on both sides (denominator 0).
    "w7_trend" -> QueryDef(
      (s, dir) => {
        // MICROsecond basis on both sides (w2/w5/s2 convention): DuckDB's
        // parquet reader truncates TIMESTAMP_NS to us, so raw-ns second
        // bucketing could disagree within 999 ns of a second boundary.
        val e = t(s, dir, "events").select(col("user_id"),
          expr("ts div 1000").as("tsu"),
          floor(col("value") * 100 + 0.5).cast("long").as("y"))
        val x = e.withColumn("x",
          expr("(tsu - min(tsu) OVER (PARTITION BY user_id)) div 1000000"))
        val a = x.groupBy("user_id").agg(
          count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        a.filter(col("n") * col("sxx") - col("sx") * col("sx") > 0)
          .select(col("user_id"), col("n"),
            round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"))
      },
      Some("""WITH e AS (
                SELECT user_id, epoch_us(ts) AS tsu,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
                FROM events),
              m AS (SELECT user_id, min(tsu) AS t0 FROM e GROUP BY 1),
              x AS (SELECT e.user_id, (tsu - t0) // 1000000 AS x, y
                    FROM e JOIN m USING (user_id)),
              a AS (SELECT user_id, count(*) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(y) AS BIGINT) AS sy,
                           CAST(sum(x * y) AS BIGINT) AS sxy,
                           CAST(sum(x * x) AS BIGINT) AS sxx
                    FROM x GROUP BY 1)
              SELECT user_id, n,
                     round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (n * sxx - sx * sx), 6) AS slope
              FROM a WHERE n * sxx - sx * sx > 0"""),
      "per-key OLS trend from exact integer moment sums"),

    // The remaining ranking/distribution window functions in one per-key
    // pass: percent_rank, cume_dist (both exact rational row-count ratios
    // — deterministic doubles), nth_value and first_value over the running
    // frame. Completes the window surface next to w1/w2/w5.
    "w8_rank_dist" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cdist"),
            first("event_id").over(wf).as("first_ev"),
            nth_value(col("event_id"), 2).over(wf).as("second_ev"))
      },
      Some("""SELECT event_id, user_id,
                     round(percent_rank() OVER w, 6) AS pct_rank,
                     round(cume_dist() OVER w, 6) AS cdist,
                     first_value(event_id) OVER wf AS first_ev,
                     nth_value(event_id, 2) OVER wf AS second_ev
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                     wf AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""),
      "percent_rank / cume_dist / first_value / nth_value per key"),

    // Tumbling-window aggregation in batch form (the streaming variant is
    // StreamingAnalytics.windowedTypeCounts; same grouping semantics).
    // Window starts exported as epoch micros to sidestep tz-encoding drift.
    "w3_tumbling_counts" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        // Integer division (`div`), not `/`: Spark's `/` on longs is double
        // division, and ns-epoch magnitudes (~1.7e18) exceed double's 2^53
        // mantissa — the truncating cast could land micros off by one and
        // shift boundary events into the wrong window vs the exact oracle.
        .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("w_start"),
          col("event_type"), col("n")),
      Some("""SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS w_start,
                     event_type, count(*) AS n
              FROM events GROUP BY 1, 2"""),
      "tumbling event-time window aggregation (batch form)"),

    // Exact interpolated percentiles per group.
    "g5_percentiles" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
          count(lit(1)).as("n")),
      Some("""SELECT o_orderpriority,
                     round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
                     round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
                     count(*) AS n
              FROM orders GROUP BY o_orderpriority"""),
      "exact interpolated percentiles per group"),

    // Explicit GROUPING SETS (the general form rollup/cube specialize):
    // disjoint aggregation levels in ONE pass over the fact scan (Expand +
    // single hash-agg), with grouping_id() disambiguating the all-rows set
    // from a genuine NULL group. Completes the grouping-variant matrix
    // next to g3 (rollup) and g8 (cube).
    "g12_grouping_sets" -> QueryDef(
      (s, dir) => withViews(s, "lineitem" -> t(s, dir, "lineitem")) { n =>
        s"""SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   count(*) AS n_rows,
                   grouping_id(l_returnflag, l_linestatus) AS gid
            FROM ${n("lineitem")}
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
      },
      Some("""SELECT l_returnflag, l_linestatus,
                     round(sum(l_quantity), 2) AS sum_qty,
                     count(*) AS n_rows,
                     CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                       AS BIGINT) AS gid
              FROM lineitem
              GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""),
      "explicit GROUPING SETS with grouping_id disambiguation"),

    // Referential-integrity audit: orphan counts along every FK edge of
    // the star — each branch one anti-join whose dim side broadcasts (or
    // bloom-prunes) at scale; the first data-quality gate after a drop
    // lands, next to dq1's per-column profile.
    "dq2_orphans" -> QueryDef(
      (s, dir) => {
        def orphans(name: String, fact: DataFrame, factKey: String,
            dim: DataFrame, dimKey: String) =
          fact.join(dim, col(factKey) === col(dimKey), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
            .select(lit(name).as("fk_edge"), col("n_orphans"))
        orphans("lineitem->orders", t(s, dir, "lineitem"), "l_orderkey",
            t(s, dir, "orders"), "o_orderkey")
          .unionByName(orphans("lineitem->part", t(s, dir, "lineitem"),
            "l_partkey", t(s, dir, "part"), "p_partkey"))
          .unionByName(orphans("orders->customer", t(s, dir, "orders"),
            "o_custkey", t(s, dir, "customer"), "c_custkey"))
          .unionByName(orphans("events->customer", t(s, dir, "events"),
            "user_id", t(s, dir, "customer"), "c_custkey"))
      },
      Some("""SELECT 'lineitem->orders' AS fk_edge, count(*) AS n_orphans
              FROM lineitem WHERE NOT EXISTS
                (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
              UNION ALL
              SELECT 'lineitem->part', count(*) FROM lineitem
              WHERE NOT EXISTS
                (SELECT 1 FROM part WHERE p_partkey = l_partkey)
              UNION ALL
              SELECT 'orders->customer', count(*) FROM orders
              WHERE NOT EXISTS
                (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
              UNION ALL
              SELECT 'events->customer', count(*) FROM events
              WHERE NOT EXISTS
                (SELECT 1 FROM customer WHERE c_custkey = user_id)"""),
      "referential-integrity audit: orphan counts per FK edge"),

    // Functional-dependency audit (Profile.fdViolations): the lhs values
    // mapping to more than one distinct rhs — a declared dependency that
    // drifted. One audits a dependency the fixtures genuinely violate
    // (nation does not determine market segment), one a true key that
    // must come back clean (o_orderkey -> o_custkey: zero rows).
    "dq3_fd_audit" -> QueryDef(
      (s, dir) => {
        val violated = graft.ext.Profile
          .fdViolations(t(s, dir, "customer"), "c_nationkey", "c_mktsegment")
          .select(lit("customer: c_nationkey->c_mktsegment").as("fd"),
            col("lhs_value"), col("n_rhs"))
        val holds = graft.ext.Profile
          .fdViolations(t(s, dir, "orders"), "o_orderkey", "o_custkey")
          .select(lit("orders: o_orderkey->o_custkey").as("fd"),
            col("lhs_value"), col("n_rhs"))
        violated.unionByName(holds)
      },
      Some("""SELECT 'customer: c_nationkey->c_mktsegment' AS fd,
                     CAST(c_nationkey AS VARCHAR) AS lhs_value,
                     count(DISTINCT c_mktsegment)
                       + max(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)
                       AS n_rhs
              FROM customer GROUP BY c_nationkey
              HAVING count(DISTINCT c_mktsegment)
                       + max(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) > 1
              UNION ALL
              SELECT 'orders: o_orderkey->o_custkey',
                     CAST(o_orderkey AS VARCHAR),
                     count(DISTINCT o_custkey)
                       + max(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
              FROM orders GROUP BY o_orderkey
              HAVING count(DISTINCT o_custkey)
                       + max(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) > 1"""),
      "functional-dependency audit: violating keys per declared FD"),

    // Winsorized aggregation (robust-stats cleaning): per-group P10/P90
    // computed once on the pre-aggregated group relation, broadcast back
    // onto the fact rows (AQE: the percentile relation is group-cardinality,
    // tiny), every value clipped into [P10, P90], then the robust sum —
    // outlier capping without a per-row sort or UDF. Clip bounds are
    // rounded to the exact 2-decimal grid BEFORE clipping so both engines
    // clip against identical constants.
    "g11_winsorize" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val bounds = o.groupBy("o_orderpriority").agg(
          round(expr("percentile(o_totalprice, 0.1)"), 2).as("lo"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("hi"))
        o.join(broadcast(bounds), Seq("o_orderpriority"))
          .select(col("o_orderpriority"),
            greatest(col("lo"), least(col("hi"), col("o_totalprice")))
              .as("clipped"))
          .groupBy("o_orderpriority")
          .agg(round(sum("clipped"), 2).as("wins_sum"),
            count(lit(1)).as("n"))
      },
      Some("""WITH b AS (
                SELECT o_orderpriority,
                       round(quantile_cont(o_totalprice, 0.1), 2) AS lo,
                       round(quantile_cont(o_totalprice, 0.9), 2) AS hi
                FROM orders GROUP BY 1)
              SELECT o.o_orderpriority,
                     round(sum(greatest(b.lo, least(b.hi, o.o_totalprice))), 2)
                       AS wins_sum,
                     count(*) AS n
              FROM orders o JOIN b USING (o_orderpriority)
              GROUP BY 1"""),
      "winsorized group sums: P10/P90 clipping via broadcast bounds"),

    // Sketch accuracy gate for quantiles, same pattern as g6b — and
    // SCALE-INDEPENDENT in BOTH directions: a relative-error tolerance is
    // fragile at small groups (the two central elements of a 30-row group
    // can legitimately sit >1% apart), while a two-central-elements value
    // bracket is fragile at LARGE groups — the sketch only guarantees rank
    // error <= n/accuracy, so past ~10k rows/group it may legitimately
    // return an element a few ranks outside the bracket (round-3 advice).
    // The gate therefore tests RANK distance directly: the count of
    // elements strictly between the sketch value and the exact median IS
    // the sketch's rank displacement (ties only shrink the count, which is
    // conservative in the safe direction), and must stay within
    // ceil(n/accuracy)+1 — the sketch's own contract at every scale.
    "g5b_approx_percentile" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val p = o.groupBy("o_orderpriority").agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx"))
        o.join(broadcast(p), "o_orderpriority")
          .groupBy("o_orderpriority")
          .agg(
            min("p50").as("p50u"), min("approx").as("approxu"),
            count(lit(1)).as("n"),
            sum(when(
              col("o_totalprice") > least(col("approx"), col("p50")) &&
                col("o_totalprice") < greatest(col("approx"), col("p50")),
              1L).otherwise(0L)).as("between_n"))
          .select(col("o_orderpriority"),
            round(col("p50u"), 2).as("p50_exact"),
            (col("between_n") <=
              ceil(col("n").cast("double") / 10000.0).cast("long") + lit(1L))
              .as("within_tol"))
      },
      Some("""SELECT o_orderpriority,
                     round(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
                     true AS within_tol
              FROM orders GROUP BY o_orderpriority"""),
      "approx_percentile within its rank-error contract of the exact median"),

    // Sketch-based distinct (HLL++). No oracle: sketch estimates are
    // engine-specific — the driver records the rows-only check; the exact
    // distinct lives in g2_distinct_agg.
    "g6_approx_distinct" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts")),
      None,
      "HLL++ approximate distinct (rows-only check)"),

    // Oracle-checked companion to g6: the sketch estimate must land within
    // tolerance of the exact distinct. Spark emits (exact, within_tol); the
    // oracle computes the exact counts and asserts `true` — the hash compare
    // then FAILS if any group's HLL estimate drifts out of tolerance, turning
    // sketch quality into a hard gate without requiring DuckDB to reproduce
    // Spark's HLL++ bit-for-bit (sketches are engine-specific). The rsd
    // parameter (0.02) is a relative STANDARD DEVIATION, not a bound — a
    // 1-sigma gate would flap on legitimate data/scale changes, so the gate
    // is 3×rsd (≈3 sigma, <0.3% false-alarm per group).
    "g6b_approx_error" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
          countDistinct(col("l_partkey")).as("exact"))
        .select(col("l_returnflag"), col("exact").as("exact_parts"),
          (abs(col("approx") - col("exact")).cast("double") / col("exact") <= 0.06)
            .as("within_tol")),
      Some("""SELECT l_returnflag,
                     count(DISTINCT l_partkey) AS exact_parts,
                     true AS within_tol
              FROM lineitem GROUP BY l_returnflag"""),
      "HLL++ estimate within 3x rsd of exact distinct (hard-checked)"),

    // Salted hot-key join under the oracle gate: 80% of lineitem rows are
    // forced onto one derived key, the salted plan (operators/Skew) runs on
    // the Spark side, and the oracle is the PLAIN join in DuckDB — green
    // means salting is result-identical on a genuinely skewed input.
    "k1_salted_skew_join" -> QueryDef(
      (s, dir) => {
        val big = t(s, dir, "lineitem").select(
          when(col("l_orderkey") % 10 < 8, lit(0L))
            .otherwise(col("l_orderkey") % 25).as("skew_key"),
          col("l_quantity"))
        val dim = t(s, dir, "nation").select(
          col("n_nationkey").cast("long").as("skew_key"), col("n_name"))
        graft.operators.Skew.saltedJoin(big, dim, "skew_key", factor = 8)
          .groupBy("n_name")
          .agg(round(sum("l_quantity"), 2).as("sum_qty"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT n_name, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
              FROM (SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
                                ELSE l_orderkey % 25 END AS skew_key, l_quantity
                    FROM lineitem) l
              JOIN nation ON n_nationkey = skew_key
              GROUP BY n_name"""),
      "salted hot-key join == plain join on a deliberately skewed input"),

    // Set ops: order-placing customer keys minus event-emitting user ids.
    "set1_except" -> QueryDef(
      (s, dir) => t(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
        .except(t(s, dir, "events").select(col("user_id").as("k")).distinct()),
      Some("""SELECT DISTINCT o_custkey AS k FROM orders
              EXCEPT
              SELECT DISTINCT user_id AS k FROM events"""),
      "EXCEPT set difference"),

    // Set ops: nation keys present on both customer and supplier sides.
    "set2_intersect" -> QueryDef(
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("k")).distinct()
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("k")).distinct()),
      Some("""SELECT DISTINCT c_nationkey AS k FROM customer
              INTERSECT
              SELECT DISTINCT s_nationkey AS k FROM supplier"""),
      "INTERSECT"),

    // Cube: all grouping-set combinations over two dims.
    "g8_cube" -> QueryDef(
      (s, dir) => withViews(s, "orders" -> t(s, dir, "orders")) { v =>
        s"""
          SELECT coalesce(o_orderstatus, '(all)') AS status,
                 coalesce(o_orderpriority, '(all)') AS priority,
                 count(*) AS n, round(sum(o_totalprice), 2) AS revenue
          FROM ${v("orders")}
          GROUP BY CUBE (o_orderstatus, o_orderpriority)"""
      },
      Some("""SELECT coalesce(o_orderstatus, '(all)') AS status,
                     coalesce(o_orderpriority, '(all)') AS priority,
                     count(*) AS n, round(sum(o_totalprice), 2) AS revenue
              FROM orders
              GROUP BY CUBE (o_orderstatus, o_orderpriority)"""),
      "cube grouping sets"),

    // Cross join (cartesian): the one join shape with no key.
    "j4_cross_join" -> QueryDef(
      (s, dir) => t(s, dir, "region").select(col("r_name").as("ra"))
        .crossJoin(t(s, dir, "region").select(col("r_name").as("rb"))),
      Some("""SELECT a.r_name AS ra, b.r_name AS rb
              FROM region a CROSS JOIN region b"""),
      "cartesian product (bounded dims only)"),

    // Scalar subquery in a filter (exact threshold: max/2, no fp drift).
    "j5_scalar_subquery" -> QueryDef(
      (s, dir) => withViews(s, "customer" -> t(s, dir, "customer")) { v =>
        s"""
          SELECT c_nationkey, count(*) AS n
          FROM ${v("customer")}
          WHERE c_acctbal > (SELECT max(c_acctbal) FROM ${v("customer")}) / 2
          GROUP BY c_nationkey"""
      },
      Some("""SELECT c_nationkey, count(*) AS n
              FROM customer
              WHERE c_acctbal > (SELECT max(c_acctbal) FROM customer) / 2
              GROUP BY c_nationkey"""),
      "scalar subquery threshold filter"),

    // Pivot (typed column-per-category totals).
    "g7_pivot" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(round(sum("value"), 2))
        .toDF("user_id", "click", "view", "purchase", "signup", "error"),
      Some("""SELECT user_id,
                     round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
                     round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view,
                     round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
                     round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
                     round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error
              FROM events GROUP BY user_id"""),
      "pivot: column-per-category aggregation"),

    // As-of join (custom operator): each event picks up the latest order of
    // the same customer at-or-before the event time. Right side is
    // pre-aggregated to unique (key, time) for determinism. Implementation:
    // graft.operators.AsOfJoin — single shuffle union/sort, no range join.
    "x1_asof_join" -> QueryDef(
      (s, dir) => {
        val events = t(s, dir, "events").filter(col("user_id") >= 1)
        val orders = t(s, dir, "orders")
          .groupBy("o_custkey", "o_orderdate")
          .agg(max("o_orderkey").as("last_orderkey"))
          .select(col("o_custkey"),
            // o_orderdate is TIMESTAMP_NTZ; session tz is pinned UTC, so the
            // cast is a pure reinterpretation, matching DuckDB's epoch_ns.
            (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L).as("ts"),
            col("last_orderkey"))
          .withColumnRenamed("o_custkey", "user_id")
        AsOfJoin.asofBackward(
          events.select("event_id", "user_id", "ts"), orders,
          key = "user_id", time = "ts", rightVals = Seq("last_orderkey"))
          .select("event_id", "user_id", "last_orderkey")
      },
      Some("""SELECT e.event_id, e.user_id, r.last_orderkey
              FROM (SELECT event_id, user_id, ts FROM events WHERE user_id >= 1) e
              ASOF LEFT JOIN (
                SELECT o_custkey, o_orderdate,
                       max(o_orderkey) AS last_orderkey
                FROM orders GROUP BY 1, 2) r
              ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate"""),
      "backward as-of join via union/sort operator (single shuffle)"),

    // Forward as-of: each event attaches the user's NEXT order at-or-after
    // the event time — same single-shuffle union/sort machinery as x1 with
    // the scan direction reversed; DuckDB replays via ASOF with `<=`.
    "x4_asof_forward" -> QueryDef(
      (s, dir) => {
        val events = t(s, dir, "events").filter(col("user_id") >= 1)
        val orders = t(s, dir, "orders")
          .groupBy("o_custkey", "o_orderdate")
          .agg(max("o_orderkey").as("next_orderkey"))
          .select(col("o_custkey"),
            (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L).as("ts"),
            col("next_orderkey"))
          .withColumnRenamed("o_custkey", "user_id")
        AsOfJoin.asofForward(
          events.select("event_id", "user_id", "ts"), orders,
          key = "user_id", time = "ts", rightVals = Seq("next_orderkey"))
          .select("event_id", "user_id", "next_orderkey")
      },
      Some("""SELECT e.event_id, e.user_id, r.next_orderkey
              FROM (SELECT event_id, user_id, ts FROM events WHERE user_id >= 1) e
              ASOF LEFT JOIN (
                SELECT o_custkey, o_orderdate,
                       max(o_orderkey) AS next_orderkey
                FROM orders GROUP BY 1, 2) r
              ON e.user_id = r.o_custkey AND e.ts <= r.o_orderdate"""),
      "forward as-of join: next right row at-or-after each event"),

    // As-of with a LOOKBACK BOUND — the standard time-series tolerance
    // contract ("latest order at most 30 days old"): a match farther back
    // than the bound is dropped (value nulled, row kept), exactly pandas
    // merge_asof(tolerance=...). DuckDB oracles it by carrying the matched
    // time out of a plain ASOF join and applying the bound afterwards.
    // Times are epoch-ns longs on the Spark side, so the tolerance is an
    // exact integer; DuckDB compares the timestamp difference to the same
    // 30-day interval.
    "x5_asof_tolerance" -> QueryDef(
      (s, dir) => {
        val events = t(s, dir, "events").filter(col("user_id") >= 1)
        val orders = t(s, dir, "orders")
          .groupBy("o_custkey", "o_orderdate")
          .agg(max("o_orderkey").as("last_orderkey"))
          .select(col("o_custkey"),
            (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L).as("ts"),
            col("last_orderkey"))
          .withColumnRenamed("o_custkey", "user_id")
        AsOfJoin.asofBackward(
          events.select("event_id", "user_id", "ts"), orders,
          key = "user_id", time = "ts", rightVals = Seq("last_orderkey"),
          tolerance = Some(30L * 86400L * 1000000000L))
          .select("event_id", "user_id", "last_orderkey")
      },
      Some("""SELECT event_id, user_id,
                     CASE WHEN ts - matched_ts <= INTERVAL 30 DAY
                          THEN last_orderkey END AS last_orderkey
              FROM (
                SELECT e.event_id, e.user_id, e.ts,
                       r.o_orderdate AS matched_ts, r.last_orderkey
                FROM (SELECT event_id, user_id, ts FROM events
                      WHERE user_id >= 1) e
                ASOF LEFT JOIN (
                  SELECT o_custkey, o_orderdate,
                         max(o_orderkey) AS last_orderkey
                  FROM orders GROUP BY 1, 2) r
                ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate)"""),
      "as-of join with lookback tolerance: stale matches dropped"),

    // Interval join with NO equality key: price-band assignment. A bare
    // `p >= lo AND p < hi` join is a BroadcastNestedLoopJoin in Spark —
    // O(|fact|·|bands|) and a full broadcast; RangeJoin.binnedRangeJoin
    // replicates each band to the fixed-width bins it overlaps and
    // equi-joins on the bin (one hash join, pair met in exactly one bin).
    // Plan lock (no BNLJ) in RangeJoinSpec. Prices in exact integer cents:
    // both engines compute floor(double*100) on identical IEEE doubles.
    "x2_range_join" -> QueryDef(
      (s, dir) => {
        val pts = t(s, dir, "lineitem")
          .select(floor(col("l_extendedprice") * 100).cast("long").as("p"))
        val bands = s.createDataFrame(PriceBands)
          .toDF("band_id", "lo", "hi")
        RangeJoin.binnedRangeJoin(pts, "p", bands, "lo", "hi",
            binWidth = 250000L)
          .groupBy("band_id")
          .agg(count(lit(1)).as("n_items"),
            sum("p").cast("long").as("sum_cents"))
      },
      Some(s"""WITH pts AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS p
                            FROM lineitem),
                    bands(band_id, lo, hi) AS (VALUES ${PriceBands.map {
                      case (b, lo, hi) => s"($b, $lo, $hi)" }.mkString(", ")})
               SELECT band_id, count(*) AS n_items,
                      CAST(sum(p) AS BIGINT) AS sum_cents
               FROM pts JOIN bands ON p >= lo AND p < hi
               GROUP BY band_id"""),
      "equality-free interval join via bin-replication blocking (no BNLJ)"),

    // The same interval join written NAIVELY (plain `p >= lo AND p < hi`
    // condition, no operator API) with the RangeJoinRewrite optimizer rule
    // enabled: the rule must re-plan it as the bin-replicated hash join —
    // auto-derived width, hybrid outlier branch — and produce oracle-exact
    // results. The plan is REQUIRED to carry the rewrite's bin key, so the
    // gate fails loudly if the rule ever silently stops firing; the result
    // materializes eagerly under the conf (set/restore around the build)
    // so the enable flag never leaks into the rest of the gate.
    "x6_range_rewrite" -> QueryDef(
      (s, dir) => {
        // Defensive rule injection for externally-built sessions (mirrors
        // the GraftFunctions.register pattern): sessions built without
        // GraftExtensions get the rule via experimental.extraOptimizations.
        // The presence check covers BOTH registration surfaces — the
        // extension-injected copy lives in the optimizer's
        // extendedOperatorOptimizationRules, not in experimental, so a
        // GraftSession would otherwise accrete a duplicate instance with
        // its own width cache (extra sampling jobs whenever the rule is
        // enabled; caught in review). A duplicate would still be
        // RESULT-safe: the rewrite is idempotent (the binned join gains an
        // equi key, the wide residual is shape-guarded).
        val hasRule =
          s.sessionState.optimizer.extendedOperatorOptimizationRules
            .exists(_.isInstanceOf[graft.plans.RangeJoinRewrite]) ||
          s.experimental.extraOptimizations
            .exists(_.isInstanceOf[graft.plans.RangeJoinRewrite])
        if (!hasRule)
          s.experimental.extraOptimizations ++=
            Seq(graft.plans.RangeJoinRewrite(s))
        val prev = s.conf.getOption("spark.graft.rangeJoinRewrite.enabled")
        s.conf.set("spark.graft.rangeJoinRewrite.enabled", "true")
        try {
          val pts = t(s, dir, "lineitem")
            .select(floor(col("l_extendedprice") * 100).cast("long").as("p"))
          val bands = s.createDataFrame(PriceBands)
            .toDF("band_id", "lo", "hi")
          val joined = pts.join(bands,
              col("p") >= col("lo") && col("p") < col("hi"))
            .groupBy("band_id")
            .agg(count(lit(1)).as("n_items"),
              sum("p").cast("long").as("sum_cents"))
          require(joined.queryExecution.optimizedPlan.toString
              .contains("__graft_bin"),
            "RangeJoinRewrite did not fire on the naive interval join")
          val rows = joined.collect()
          s.createDataFrame(
            java.util.Arrays.asList(rows: _*), joined.schema)
        } finally prev match {
          case Some(v) => s.conf.set("spark.graft.rangeJoinRewrite.enabled", v)
          case None => s.conf.unset("spark.graft.rangeJoinRewrite.enabled")
        }
      },
      Some(s"""WITH pts AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS p
                            FROM lineitem),
                    bands(band_id, lo, hi) AS (VALUES ${PriceBands.map {
                      case (b, lo, hi) => s"($b, $lo, $hi)" }.mkString(", ")})
               SELECT band_id, count(*) AS n_items,
                      CAST(sum(p) AS BIGINT) AS sum_cents
               FROM pts JOIN bands ON p >= lo AND p < hi
               GROUP BY band_id"""),
      "naive interval join re-planned by the optimizer rule (oracle-gated)"),

    // Time-series densification: per-user daily event series with missing
    // days zero-filled and a gauge column carried forward. Grid generated
    // per key by sequence()+explode (narrow, bounded by per-key span), 1:1
    // keyed fill join, single-sort carry-forward window.
    "x3_gap_fill" -> QueryDef(
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          // ts is LONG ns; `div` keeps the epoch math exact (see w3).
          .groupBy(col("user_id"),
            to_date(timestamp_micros(expr("ts div 1000"))).as("day"))
          .agg(count(lit(1)).as("n_events"),
            max("event_id").as("last_event_id"))
        TimeSeries.gapFill(daily, key = "user_id", period = "day",
          step = "1 day", zeroFill = Seq("n_events"),
          carryForward = Seq("last_event_id"))
      },
      Some("""WITH daily AS (
                SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                       count(*) AS n_events, max(event_id) AS last_event_id
                FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
              bounds AS (
                SELECT user_id, min(day) AS d0, max(day) AS d1
                FROM daily GROUP BY 1),
              grid AS (
                SELECT user_id,
                       CAST(unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                                                   INTERVAL 1 DAY)) AS DATE) AS day
                FROM bounds)
              SELECT g.user_id, g.day,
                     coalesce(d.n_events, 0) AS n_events,
                     last_value(d.last_event_id IGNORE NULLS) OVER (
                       PARTITION BY g.user_id ORDER BY g.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS last_event_id
              FROM grid g LEFT JOIN daily d USING (user_id, day)"""),
      "time-series gap fill: dense per-key calendar grid, zero-fill + ffill"),

    // ---- incremental ingest (MERGE / CDC apply) ----

    // Last-writer-wins compaction of a change stream: one keyed struct-max
    // hash-agg (partial-aggregatable, no window sort) — the pass that keeps
    // the downstream merge join 1:1. The change stream is derived
    // deterministically from `documents` (md5 buckets), so DuckDB replays
    // both its construction and the max-version cut.
    "i2_cdc_latest" -> QueryDef(
      (s, dir) => Incremental.latestPerKey(
        cdcChanges(s, dir), "doc_id", "version", "op", Seq("val")),
      Some(s"""WITH $CdcChangesCtes
               SELECT doc_id, version, op, val FROM latest"""),
      "CDC compaction: last-writer-wins per key via struct-max hash-agg"),

    // MERGE INTO semantics on plain tables: ONE full-outer shuffle join of
    // base against the compacted change set — D drops the base row, U/I
    // payload wins, unmatched base passes through. With the base bucketed on
    // the merge key the base-side shuffle disappears (co-located merge), the
    // LSM/Delta-style shape an incremental batch runs at 100 TB.
    "i1_cdc_apply" -> QueryDef(
      (s, dir) => {
        val base = t(s, dir, "documents")
          .select(col("doc_id"), concat(col("source"), lit(":v0")).as("val"))
        Incremental.apply(base,
          Incremental.latestPerKey(
            cdcChanges(s, dir), "doc_id", "version", "op", Seq("val")),
          "doc_id", "op", Seq("val"))
      },
      Some(s"""WITH $CdcChangesCtes
               SELECT coalesce(b.doc_id, l.doc_id) AS doc_id,
                      coalesce(l.val, b.val) AS val
               FROM (SELECT doc_id, source || ':v0' AS val FROM documents) b
               FULL OUTER JOIN latest l ON b.doc_id = l.doc_id
               WHERE l.op IS NULL OR l.op <> 'D'"""),
      "MERGE/CDC apply: full-outer keyed merge with delete/upsert semantics"),

    // Snapshot diff — the reverse of i1: derive the added/removed/changed
    // change set separating two corpus drops (the "what must I reprocess?"
    // question an incremental pipeline asks of a new delivery). One
    // full-outer keyed join, null-safe per-column compare, delta-sized
    // output. The "current" snapshot is built from the same table by
    // deterministic arithmetic so the oracle replays it verbatim.
    "i4_snapshot_diff" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cur = docs.filter(col("doc_id") % 31 =!= 7)
          .withColumn("text",
            when(col("doc_id") % 17 === 3, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
          .unionByName(docs.filter(col("doc_id") % 50 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000L))
        Incremental.snapshotDiff(docs, cur, "doc_id",
          Seq("text", "lang", "source"))
      },
      Some("""WITH cur AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 17 = 3 THEN text || ' v2'
                            ELSE text END AS text,
                       lang, source
                FROM documents WHERE doc_id % 31 <> 7
                UNION ALL
                SELECT doc_id + 1000000, text, lang, source
                FROM documents WHERE doc_id % 50 = 0)
              SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
                     CASE WHEN c.doc_id IS NULL THEN 'removed'
                          WHEN p.doc_id IS NULL THEN 'added'
                          WHEN (p.text IS DISTINCT FROM c.text)
                            OR (p.lang IS DISTINCT FROM c.lang)
                            OR (p.source IS DISTINCT FROM c.source)
                          THEN 'changed' END AS change
              FROM documents p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
              WHERE CASE WHEN c.doc_id IS NULL THEN 'removed'
                         WHEN p.doc_id IS NULL THEN 'added'
                         WHEN (p.text IS DISTINCT FROM c.text)
                           OR (p.lang IS DISTINCT FROM c.lang)
                           OR (p.source IS DISTINCT FROM c.source)
                         THEN 'changed' END IS NOT NULL"""),
      "snapshot diff: added/removed/changed change-set between two drops"),

    // Join-fanout pre-flight audit: the top-10 events.user_id x
    // orders.o_custkey keys by output contribution n_left*n_right - the
    // exact hot-key check run BEFORE a big join (decides salting).
    // Two narrow keyed counts + a count-grain join + TakeOrdered.
    "dq5_join_fanout" -> QueryDef(
      (s, dir) => graft.ext.Profile.joinFanout(
        t(s, dir, "events"), t(s, dir, "orders"),
        "user_id", "o_custkey", topN = 10),
      Some("""WITH lc AS (SELECT user_id AS key, count(*) AS n_left
                          FROM events WHERE user_id IS NOT NULL
                          GROUP BY 1),
              rc AS (SELECT o_custkey AS key, count(*) AS n_right
                     FROM orders WHERE o_custkey IS NOT NULL
                     GROUP BY 1)
              SELECT CAST(key AS VARCHAR) AS key, n_left, n_right,
                     CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
                       AS n_out
              FROM lc JOIN rc USING (key)
              ORDER BY n_out DESC, key
              LIMIT 10"""),
      "join-fanout pre-flight: top hot keys by exact output contribution"),

    // The snapshot->CDC bridge: i4's diff WITH payloads, shaped as the
    // change relation i1's MERGE consumes (I/U/D + current values, NULL
    // payload on deletes) - how a whole-drop supplier feeds an
    // incremental table. apply(prev, these changes) == cur is pinned in
    // the spec; the gate replays the emitted change relation itself.
    "i5_snapshot_to_cdc" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cur = docs.filter(col("doc_id") % 31 =!= 7)
          .withColumn("text",
            when(col("doc_id") % 17 === 3, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
          .unionByName(docs.filter(col("doc_id") % 50 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000L))
        Incremental.snapshotChanges(docs, cur, "doc_id",
          Seq("text", "lang"), version = 1L)
      },
      Some("""WITH cur AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 17 = 3 THEN text || ' v2'
                            ELSE text END AS text,
                       lang
                FROM documents WHERE doc_id % 31 <> 7
                UNION ALL
                SELECT doc_id + 1000000, text, lang
                FROM documents WHERE doc_id % 50 = 0),
              d AS (
                SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
                       CASE WHEN c.doc_id IS NULL THEN 'D'
                            WHEN p.doc_id IS NULL THEN 'I'
                            WHEN (p.text IS DISTINCT FROM c.text)
                              OR (p.lang IS DISTINCT FROM c.lang)
                            THEN 'U' END AS op,
                       c.text AS text, c.lang AS lang
                FROM documents p FULL OUTER JOIN cur c
                  ON p.doc_id = c.doc_id)
              SELECT doc_id, CAST(1 AS BIGINT) AS version, op, text, lang
              FROM d WHERE op IS NOT NULL"""),
      "snapshot-to-CDC bridge: I/U/D change relation between two drops"),

    // Incremental aggregate maintenance (IVM): the new per-source
    // (count, sum n_chars) aggregate derived from the OLD aggregate +
    // the i5 change set - no rescan of unaffected rows. The oracle is
    // the FULL RECOMPUTE over the changed table, so the gate proves
    // incremental == recompute cross-engine. U rows here genuinely
    // mutate the aggregated value (n_chars + 7), not just the text.
    "i6_ivm_agg" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cur = docs.filter(col("doc_id") % 31 =!= 7)
          .withColumn("n_chars",
            when(col("doc_id") % 17 === 3, col("n_chars") + 7)
              .otherwise(col("n_chars")))
          .unionByName(docs.filter(col("doc_id") % 50 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000L))
        val changes = Incremental.snapshotChanges(docs, cur, "doc_id",
          Seq("n_chars", "source"), version = 1L)
        val prevAgg = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars").cast("long")).as("s"))
        Incremental.maintainAgg(prevAgg, docs, changes,
          "doc_id", "op", "source", "n_chars")
      },
      Some("""WITH cur AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 17 = 3 THEN n_chars + 7
                            ELSE n_chars END AS n_chars,
                       source
                FROM documents WHERE doc_id % 31 <> 7
                UNION ALL
                SELECT doc_id + 1000000, n_chars, source
                FROM documents WHERE doc_id % 50 = 0)
              SELECT source AS g, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(n_chars) AS BIGINT) AS s
              FROM cur GROUP BY 1"""),
      "incremental view maintenance: old agg + CDC deltas == full recompute"),

    // SCD2 history build: every non-delete change becomes a versioned
    // dimension row with a [valid_from, valid_to) validity interval;
    // valid_to = the NEXT change's version (any op — a delete closes its
    // predecessor), open interval = current. One shuffle + one sort per
    // key (lead window) — the warehouse-standard history derivation, cost
    // identical to w2 at any scale.
    "i3_scd2" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("doc_id").orderBy("version")
        cdcChanges(s, dir)
          .withColumn("valid_to", lead("version", 1).over(w))
          .filter(col("op") =!= "D")
          .select(col("doc_id"), col("version").as("valid_from"),
            col("valid_to"), col("val"),
            col("valid_to").isNull.as("is_current"))
      },
      Some(s"""WITH $CdcChangesCtes,
               led AS (
                 SELECT doc_id, version AS valid_from,
                        lead(version) OVER (PARTITION BY doc_id
                          ORDER BY version) AS valid_to,
                        op, val
                 FROM ch)
               SELECT doc_id, valid_from, valid_to, val,
                      valid_to IS NULL AS is_current
               FROM led WHERE op <> 'D'"""),
      "SCD2 dimension history: validity intervals via per-key lead window"))

  /** Deterministic CDC change stream derived from `documents`: keys in the
   * low half of the "cdc" md5 bucket carry 1–3 versions; each (key, version)
   * draws an op (20% D / 40% U / 40% I) from the "op" bucket and a payload
   * `source:vN` — every step md5-replayable in the oracle. */
  private def cdcChanges(s: SparkSession, dir: String): DataFrame = {
    import Sampling.hashBucket
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .filter(hashBucket(col("doc_id"), "cdc") < 50)
      .withColumn("version",
        explode(sequence(lit(1L), hashBucket(col("doc_id"), "nv") % 3 + 1)))
      .withColumn("op", {
        val h = hashBucket(concat(col("doc_id").cast("string"), lit(":"),
          col("version").cast("string")), "op")
        when(h < 20, "D").when(h < 60, "U").otherwise("I")
      })
      .withColumn("val",
        concat(col("source"), lit(":v"), col("version").cast("string")))
      .select("doc_id", "version", "op", "val")
  }

  /** DuckDB mirror of `cdcChanges` + `Incremental.latestPerKey`, ending in
   * `latest(doc_id, version, op, val)`. The window ORDER BY replays the
   * struct-max field order (version, op, val). */
  private def CdcChangesCtes: String =
    """base AS (
         SELECT doc_id, source,
                ('0x' || substr(md5('nv:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bn
         FROM documents
         WHERE ('0x' || substr(md5('cdc:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 50),
       v AS (
         SELECT doc_id, source,
                unnest(generate_series(1, bn % 3 + 1)) AS version
         FROM base),
       ch AS (
         SELECT doc_id, version,
                CASE WHEN h < 20 THEN 'D' WHEN h < 60 THEN 'U' ELSE 'I' END AS op,
                source || ':v' || version::VARCHAR AS val
         FROM (SELECT doc_id, source, version,
                      ('0x' || substr(md5('op:' || doc_id::VARCHAR || ':' || version::VARCHAR), 1, 8))::BIGINT % 100 AS h
               FROM v)),
       latest AS (
         SELECT doc_id, version, op, val FROM (
           SELECT doc_id, version, op, val,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY version DESC, op DESC, val DESC) AS rn
           FROM ch) WHERE rn = 1)"""
}
