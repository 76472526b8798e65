package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-governance operators — the release/compliance half of a training
  * -data pipeline that the curation ops (dedup / quality / PII masking)
  * don't cover: k-anonymity release auditing (flat suppression AND the
  * Samarati-style generalization hierarchy), differentially-private
  * aggregate release, deletion-request (right-to-be-forgotten)
  * propagation auditing, the PII-mask release audit, and
  * distribution-drift measurement between corpus snapshots. The
  * reference relay (main.go:103-155) moves raw change events with no
  * governance layer at all; these are the checks a consumer of that
  * feed must run before any derived dataset leaves the pipeline. The
  * streaming complements live in `streaming/ForgetFilter` (tombstone
  * guard) and `streaming/DriftMonitor` (windowed PSI).
  *
  * Scale design (the 100 TB contract, shared across the family):
  *  - every op is AGGREGATION-SHAPED — one partial-aggregated pass over
  *    the fact table reduces to a group frame (QI cells / event types /
  *    sources / 10 histogram buckets) and ALL release logic
  *    (suppression, lattice climb, noise, smoothing, PSI terms) runs on
  *    that compact frame; the corpus is scanned once and never
  *    re-shuffled;
  *  - determinism under partitioning: counts are longs (associative),
  *    every double that meets an `ln`/division is quantized to 1e-6
  *    micro-longs immediately after (the text_bigram_lm convention), so
  *    the released numbers are bit-identical at any parallelism;
  *  - the DP seed and the deletion list derive from the md5-bucket
  *    convention (AssemblyQueries.bucket) — reproducible in any engine,
  *    no RNG state to coordinate across executors.
  */
object GovernanceQueries extends QueryPack {

  /** md5 bucket in [0, 1e6) — delegates to the repo-wide
    * [[graft.functions.Hashing.md5Bucket]] (DuckDB twin:
    * `('0x' || substr(md5(x),1,8))::BIGINT % 1000000`). */
  private def bucket(key: Column): Column =
    graft.functions.Hashing.md5Bucket(key)

  def queries: Seq[Q] = Seq(

    // k-ANONYMITY release audit (k = 5) over the event feed: the
    // quasi-identifier is (event_type, hour-of-day, day-of-month) — the
    // classic "when + what" re-identification surface of an event log.
    // Groups smaller than k are SUPPRESSED and roll up into one
    // '__suppressed__' row (always emitted, 0 when nothing suppressed)
    // so the release row set is exhaustive: released rows + the rollup
    // account for every input row. ONE shuffle on the QI key — the
    // k-cut is a conditional REGROUP of the |groups| frame (the
    // gov_k_generalize mapped-key pattern; a filter-per-branch union
    // would re-plan the corpus aggregation twice), and the
    // always-present rollup row comes from a 1-row zero spine unioned
    // onto the group frame, never the corpus. The fixture exercises
    // both regimes: sf0.001 suppresses nearly everything (sparse
    // groups), sf0.1 releases nearly everything.
    Q("gov_k_anon",
      (s, dir) => {
        // k is the SHARED default (streaming/KAnonGate.DefaultK): the
        // live gate in GovernancePipeline reads the same constant, so
        // the batch audit and the stream cannot drift (the
        // gov_l_diversity/DiversityGate.DefaultL convention). The
        // oracle SQL below hardcodes 5 — KAnonGateSpec pins the value.
        val k = graft.streaming.KAnonGate.DefaultK
        val g = t(s, dir, "events")
          .groupBy(col("event_type"),
            hour(col("ts")).cast("long").as("h"),
            dayofmonth(col("ts")).cast("long").as("d"))
          .agg(count(lit(1)).as("n"))
        val spine = s.range(1).select(
          lit("__suppressed__").as("event_type"),
          lit(-1L).as("h"), lit(-1L).as("d"), lit(0L).as("n"))
        g.select(
            when(col("n") >= k, col("event_type")).otherwise("__suppressed__")
              .as("event_type"),
            when(col("n") >= k, col("h")).otherwise(-1L).as("h"),
            when(col("n") >= k, col("d")).otherwise(-1L).as("d"),
            col("n"))
          .unionByName(spine)
          .groupBy("event_type", "h", "d")
          .agg(sum("n").as("n"))
          .orderBy("event_type", "h", "d")
      },
      Some("""WITH g AS (SELECT event_type,
                                extract(hour FROM ts) AS h,
                                extract(day FROM ts) AS d,
                                count(*) AS n
                         FROM events GROUP BY 1, 2, 3)
              SELECT event_type, h, d, n FROM g WHERE n >= 5
              UNION ALL
              SELECT '__suppressed__', -1, -1,
                     CAST(COALESCE(sum(n), 0) AS BIGINT)
              FROM g WHERE n < 5
              ORDER BY event_type, h, d""")),

    // k-ANONYMITY with a GENERALIZATION HIERARCHY (k = 5, local
    // recoding): instead of suppressing every sub-k cell outright
    // (gov_k_anon), each cell climbs the lattice (type, hour, day) →
    // (type, hour) → (type) until its rows land in a group of ≥ k —
    // the Samarati/Sweeney release with the residual-count subtlety
    // done right: a fallback level's test uses the count of rows that
    // ACTUALLY generalize there (the sub-k residue), not the level's
    // full count — a (type, hour) pair with 10 rows split 6+4 releases
    // the 6 at level 0 and must NOT release the 4 alone at level 1.
    // Scale shape: ONE corpus shuffle builds the cell frame; the whole
    // lattice climb is two window layers + one re-aggregation on that
    // |cells| frame (plan-asserted ceiling); the suppressed residue
    // appears as its own rollup rows only when nonempty. The fixture
    // exercises every level across SFs (sf0.001 mostly level 2/3,
    // sf0.1 mostly level 0).
    Q("gov_k_generalize",
      (s, dir) => {
        val k = graft.streaming.KAnonGate.DefaultK // shared bar, see gov_k_anon
        val c0 = t(s, dir, "events")
          .groupBy(col("event_type"),
            hour(col("ts")).cast("long").as("h"),
            dayofmonth(col("ts")).cast("long").as("d"))
          .agg(count(lit(1)).as("n"))
        val w1 = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type", "h")
        val wt = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
        val lv = c0
          .withColumn("r1",
            coalesce(sum(when(col("n") < k, col("n"))).over(w1), lit(0L)))
          .withColumn("r2",
            coalesce(sum(when(col("n") < k && col("r1") < k, col("n")))
              .over(wt), lit(0L)))
          .withColumn("level",
            when(col("n") >= k, 0L).when(col("r1") >= k, 1L)
              .when(col("r2") >= k, 2L).otherwise(3L))
        lv.groupBy(
            when(col("level") === 3L, "__suppressed__")
              .otherwise(col("event_type")).as("event_type"),
            when(col("level") >= 2L, -1L).otherwise(col("h")).as("h"),
            when(col("level") >= 1L, -1L).otherwise(col("d")).as("d"),
            col("level"))
          .agg(sum("n").as("n"))
          .orderBy("level", "event_type", "h", "d")
      },
      Some("""WITH c0 AS (SELECT event_type AS t,
                                 extract(hour FROM ts) AS h,
                                 extract(day FROM ts) AS d,
                                 count(*) AS n
                          FROM events GROUP BY 1, 2, 3),
                w1 AS (SELECT *, COALESCE(sum(CASE WHEN n < 5 THEN n END)
                                   OVER (PARTITION BY t, h), 0) AS r1
                       FROM c0),
                w2 AS (SELECT *, COALESCE(sum(CASE WHEN n < 5 AND r1 < 5 THEN n END)
                                   OVER (PARTITION BY t), 0) AS r2
                       FROM w1),
                lv AS (SELECT *, CASE WHEN n >= 5 THEN 0
                                      WHEN r1 >= 5 THEN 1
                                      WHEN r2 >= 5 THEN 2
                                      ELSE 3 END AS lvl
                       FROM w2)
              SELECT CASE WHEN lvl = 3 THEN '__suppressed__' ELSE t END AS event_type,
                     CAST(CASE WHEN lvl >= 2 THEN -1 ELSE h END AS BIGINT) AS h,
                     CAST(CASE WHEN lvl >= 1 THEN -1 ELSE d END AS BIGINT) AS d,
                     CAST(lvl AS BIGINT) AS level,
                     CAST(sum(n) AS BIGINT) AS n
              FROM lv GROUP BY 1, 2, 3, 4
              ORDER BY level, event_type, h, d""")),

    // The k DIAL measured — the eval op the anonymity family was
    // missing (dedup has its banding sweep, ANN its nprobe curve; k was
    // chosen blind): for k ∈ {2, 5, 10, 20}, how much utility the
    // suppression release keeps (released/suppressed rows, released
    // cells) and what it costs in re-identification exposure — the
    // Bayardo–Agrawal discernibility metric DM* (each released record
    // costs its cell size, each suppressed record costs the corpus
    // size; exact long arithmetic, Σn² stays under 2^63 for corpora to
    // ~3e9 rows/cell — a bigger corpus pre-scales, the gov_t_closeness
    // note). ONE corpus shuffle builds the cell frame (lazy local
    // checkpoint — the vec_ivf_recall move, without it Catalyst
    // re-plans the corpus scan once per k branch); all four k rows are
    // aggregations of that ≤|cells| frame.
    Q("gov_k_eval",
      (s, dir) => {
        val ct = t(s, dir, "events")
          .groupBy(col("event_type"),
            hour(col("ts")).cast("long").as("h"),
            dayofmonth(col("ts")).cast("long").as("d"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(eager = false)
        val total = ct.agg(sum("n")).head().getLong(0)
        Seq(2L, 5L, 10L, 20L).map { k =>
          ct.agg(
              sum(when(col("n") >= k, col("n")).otherwise(0L)).as("released_n"),
              sum(when(col("n") < k, col("n")).otherwise(0L)).as("suppressed_n"),
              sum(when(col("n") >= k, 1L).otherwise(0L)).as("cells"),
              (sum(when(col("n") >= k, col("n") * col("n")).otherwise(0L)) +
                sum(when(col("n") < k, col("n")).otherwise(0L)) * lit(total))
                .as("dm_cost"))
            .select(lit(k).as("k"), col("released_n"), col("suppressed_n"),
              col("cells"), col("dm_cost"))
        }.reduce(_ unionByName _).orderBy("k")
      },
      Some("""WITH ct AS (SELECT event_type,
                                 extract(hour FROM ts) AS h,
                                 extract(day FROM ts) AS d,
                                 count(*) AS n
                          FROM events GROUP BY 1, 2, 3),
                tot AS (SELECT sum(n) AS total FROM ct),
                ks AS (SELECT unnest([2, 5, 10, 20]) AS k)
              SELECT k,
                     CAST(COALESCE(sum(CASE WHEN n >= k THEN n END), 0)
                          AS BIGINT) AS released_n,
                     CAST(COALESCE(sum(CASE WHEN n < k THEN n END), 0)
                          AS BIGINT) AS suppressed_n,
                     CAST(COALESCE(sum(CASE WHEN n >= k THEN 1 END), 0)
                          AS BIGINT) AS cells,
                     CAST(COALESCE(sum(CASE WHEN n >= k THEN n * n END), 0)
                          + COALESCE(sum(CASE WHEN n < k THEN n END), 0)
                            * max(total) AS BIGINT) AS dm_cost
              FROM ct CROSS JOIN ks CROSS JOIN tot
              GROUP BY k ORDER BY k""")),

    // ℓ-DIVERSITY release audit (distinct ℓ = 3, Machanavajjhala et al.
    // 2007): k-anonymity bounds group SIZE but a uniform group still
    // leaks its members' sensitive value; distinct ℓ-diversity requires
    // each released QI cell to carry ≥ ℓ DISTINCT sensitive values. QI
    // here is the (hour, day-of-month) "when" cell and the sensitive
    // attribute is event_type (what the user did) — a cell of 40 rows
    // that are all 'purchase' still re-identifies behavior and is
    // suppressed. Same scale contract as gov_k_anon: ONE corpus shuffle
    // to the (cell, type) frame; diversity is a count over the frame
    // (distinct-of-≤|types| collapses into the frame's row count, no
    // count_distinct Expand on the corpus); suppressed cells roll up
    // into the always-present (-1, -1) row. The fixture exercises both
    // regimes (sf0.001 cells are sparse/uniform, sf0.1 nearly all pass).
    Q("gov_l_diversity",
      (s, dir) => {
        // ℓ is the SHARED default (streaming/DiversityGate.DefaultL):
        // the live gate in GovernancePipeline reads the same constant,
        // so the batch audit and the stream cannot drift apart. The
        // oracle SQL below hardcodes the value — DiversityGateSpec pins
        // DefaultL == 3 so a constant change breaks loudly, not as a
        // silent oracle mismatch.
        val l = graft.streaming.DiversityGate.DefaultL
        val ct = t(s, dir, "events")
          .groupBy(
            hour(col("ts")).cast("long").as("h"),
            dayofmonth(col("ts")).cast("long").as("d"),
            col("event_type"))
          .agg(count(lit(1)).as("n_ct"))
        val cell = ct.groupBy("h", "d")
          .agg(sum("n_ct").as("n"), count(lit(1)).as("l_div"))
        val spine = s.range(1).select(
          lit(-1L).as("h"), lit(-1L).as("d"), lit(0L).as("n"),
          lit(0L).as("l_div"))
        cell.select(
            when(col("l_div") >= l, col("h")).otherwise(-1L).as("h"),
            when(col("l_div") >= l, col("d")).otherwise(-1L).as("d"),
            col("n"),
            when(col("l_div") >= l, col("l_div")).otherwise(0L).as("l_div"))
          .unionByName(spine)
          .groupBy("h", "d", "l_div")
          .agg(sum("n").as("n"))
          .select("h", "d", "n", "l_div")
          .orderBy("h", "d")
      },
      Some("""WITH ct AS (SELECT extract(hour FROM ts) AS h,
                                 extract(day FROM ts) AS d,
                                 event_type, count(*) AS n_ct
                          FROM events GROUP BY 1, 2, 3),
                cell AS (SELECT h, d, sum(n_ct) AS n, count(*) AS l_div
                         FROM ct GROUP BY 1, 2)
              SELECT h, d, CAST(n AS BIGINT) AS n,
                     CAST(l_div AS BIGINT) AS l_div
              FROM cell WHERE l_div >= 3
              UNION ALL
              SELECT -1, -1, CAST(COALESCE(sum(n), 0) AS BIGINT), 0
              FROM cell WHERE l_div < 3
              ORDER BY h, d""")),

    // t-CLOSENESS measurement (Li, Li & Venkatasubramanian 2007, with
    // the categorical ground metric, under which the earth-mover
    // distance IS the total-variation distance): even an ℓ-diverse cell
    // leaks when its sensitive-value DISTRIBUTION skews far from the
    // corpus-wide one. Per QI cell (hour, day), TVD(cell types ‖ global
    // types) in micro-units plus the release flag at t = 0.2. EXACT
    // integer arithmetic end to end: the per-type term is the
    // cross-multiplied |n_ct·N − n_t·n_c| (a long, no division), absent
    // types contribute (N − Σ_present n_t)·n_c in closed form (no type
    // spine join), and the single division quantizes the final sum to
    // micro-longs — bit-stable at any parallelism, same release in any
    // engine. Scale: ONE corpus shuffle to the (cell, type) frame
    // (≤ |cells|·|types| rows); every marginal (per-type, corpus total,
    // per-cell) is a WINDOW over that frame — a separate `glob`/`tot`
    // aggregation would make Catalyst re-plan the corpus scan once per
    // reference (measured: 3 corpus shuffles); the whole-frame window
    // funnels the ≤|cells|·|types| frame through one partition, which
    // is the point — release logic runs on the frame, never the corpus.
    Q("gov_t_closeness",
      (s, dir) => {
        val ct = t(s, dir, "events")
          .groupBy(
            hour(col("ts")).cast("long").as("h"),
            dayofmonth(col("ts")).cast("long").as("d"),
            col("event_type"))
          .agg(count(lit(1)).as("n_ct"))
        val wT = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
        val wc = org.apache.spark.sql.expressions.Window.partitionBy("h", "d")
        val f = ct
          .withColumn("n_t", sum("n_ct").over(wT))
          .withColumn("nn", sum("n_ct").over(wAll))
          // exact-arithmetic CAPACITY guard, folded into the column every
          // product below reads (load-bearing, so pruning can't skip it):
          // num_total ≤ 2·n_c·nn·10^6 ≤ 2·nn²·10^6 exceeds decimal(38,0)
          // once nn > ~7.07e15 events, and with ANSI off a decimal
          // overflow yields NULL silently — the exact failure class the
          // widening exists to prevent. Past the bound, fail loudly.
          .withColumn("nn",
            when(col("nn") <= lit(7000000000000000L), col("nn"))
              .otherwise(raise_error(concat(
                lit("gov_t_closeness: corpus exceeds the exact decimal(38,0) " +
                  "capacity (~7.07e15 events) — tvd_micro would overflow to " +
                  "NULL; nn="), col("nn")))))
          .withColumn("n_c", sum("n_ct").over(wc))
          .withColumn("snt", sum("n_t").over(wc))
        f.groupBy("h", "d", "n_c", "snt", "nn")
          // the cross-multiplied numerator is bounded by 2·n_c·nn, so a
          // long intermediate silently wraps once n_c·nn nears 2^62 —
          // reachable around ~1e9 events (hit by the sf10 decade
          // probes). Widen the PRODUCTS to decimal(38,0): exact integer
          // arithmetic to 10^38, enough for corpora to ~7e15 events
          // (2·nn²·10^6 < 10^38), with the guard above failing loudly
          // beyond; the quotient (≤ 1e6) still lands in a long.
          .agg(sum(abs(col("n_ct").cast("decimal(38,0)") * col("nn")
              - col("n_t").cast("decimal(38,0)") * col("n_c")))
            .as("num_present"))
          // `div`, not `/`: Spark's / is DOUBLE division, and a floor
          // over a ~2^45 double quotient can land on the wrong side of
          // an integer; integral div keeps the release exact
          .withColumn("num_total",
            (col("num_present")
              + (col("nn") - col("snt")).cast("decimal(38,0)") * col("n_c"))
              * lit(1000000L))
          .select(col("h"), col("d"), col("n_c").as("n"),
            expr("num_total div (cast(2 as decimal(38,0)) * n_c * nn)")
              .as("tvd_micro"))
          .withColumn("released", col("tvd_micro") <= 200000L)
          .orderBy("h", "d")
      },
      Some("""WITH ct AS (SELECT extract(hour FROM ts) AS h,
                                 extract(day FROM ts) AS d,
                                 event_type, count(*) AS n_ct
                          FROM events GROUP BY 1, 2, 3),
                gm AS (SELECT event_type, sum(n_ct) AS n_t FROM ct GROUP BY 1),
                tot AS (SELECT sum(n_ct) AS nn FROM ct),
                f AS (SELECT h, d, n_ct, n_t, nn,
                             sum(n_ct) OVER (PARTITION BY h, d) AS n_c,
                             sum(n_t) OVER (PARTITION BY h, d) AS snt
                      FROM ct JOIN gm USING (event_type) CROSS JOIN tot)
              SELECT h, d, CAST(n_c AS BIGINT) AS n,
                     CAST((sum(abs(CAST(n_ct AS HUGEINT) * nn
                                   - CAST(n_t AS HUGEINT) * n_c))
                           + (CAST(nn AS HUGEINT) - snt) * n_c) * 1000000
                          // (2 * CAST(n_c AS HUGEINT) * nn) AS BIGINT) AS tvd_micro,
                     CAST((sum(abs(CAST(n_ct AS HUGEINT) * nn
                                   - CAST(n_t AS HUGEINT) * n_c))
                           + (CAST(nn AS HUGEINT) - snt) * n_c) * 1000000
                          // (2 * CAST(n_c AS HUGEINT) * nn) <= 200000 AS BOOLEAN) AS released
              FROM f GROUP BY h, d, n_c, snt, nn
              ORDER BY h, d""")),

    // The ℓ DIAL measured — gov_k_eval's symmetry for the diversity
    // bar (k has its utility/DM* sweep; ℓ = 3 was chosen blind): for
    // ℓ ∈ {2, 3, 5, 10}, how much the distinct-ℓ-diversity release
    // keeps (released/suppressed rows, released cells) and the
    // diversity actually delivered (the minimum distinct-type count
    // over released cells — the bar the release PROVES, ≥ ℓ by
    // construction, read directly instead of trusted). ONE corpus
    // shuffle to the (h, d, type) frame, one re-aggregation to the
    // cell frame (lazy local checkpoint — four ℓ branches would
    // otherwise re-plan the corpus scan); all four rows are
    // aggregations of the ≤|cells| frame.
    Q("gov_l_eval",
      (s, dir) => {
        val cell = t(s, dir, "events")
          .groupBy(
            hour(col("ts")).cast("long").as("h"),
            dayofmonth(col("ts")).cast("long").as("d"),
            col("event_type"))
          .agg(count(lit(1)).as("n_ct"))
          .groupBy("h", "d")
          .agg(sum("n_ct").as("n"), count(lit(1)).as("l_div"))
          .localCheckpoint(eager = false)
        Seq(2L, 3L, 5L, 10L).map { l =>
          cell.agg(
              sum(when(col("l_div") >= l, col("n")).otherwise(0L))
                .as("released_n"),
              sum(when(col("l_div") < l, col("n")).otherwise(0L))
                .as("suppressed_n"),
              sum(when(col("l_div") >= l, 1L).otherwise(0L)).as("cells"),
              coalesce(min(when(col("l_div") >= l, col("l_div"))), lit(0L))
                .as("min_l_released"))
            .select(lit(l).as("l"), col("released_n"), col("suppressed_n"),
              col("cells"), col("min_l_released"))
        }.reduce(_ unionByName _).orderBy("l")
      },
      Some("""WITH ct AS (SELECT extract(hour FROM ts) AS h,
                                 extract(day FROM ts) AS d,
                                 event_type, count(*) AS n_ct
                          FROM events GROUP BY 1, 2, 3),
                cell AS (SELECT h, d, sum(n_ct) AS n, count(*) AS l_div
                         FROM ct GROUP BY 1, 2),
                ls AS (SELECT unnest([2, 3, 5, 10]) AS l)
              SELECT l,
                     CAST(COALESCE(sum(CASE WHEN l_div >= l THEN n END), 0)
                          AS BIGINT) AS released_n,
                     CAST(COALESCE(sum(CASE WHEN l_div < l THEN n END), 0)
                          AS BIGINT) AS suppressed_n,
                     CAST(COALESCE(sum(CASE WHEN l_div >= l THEN 1 END), 0)
                          AS BIGINT) AS cells,
                     CAST(COALESCE(min(CASE WHEN l_div >= l THEN l_div END), 0)
                          AS BIGINT) AS min_l_released
              FROM cell CROSS JOIN ls
              GROUP BY l ORDER BY l""")),

    // The t DIAL measured — the third rung's sweep (k and ℓ have
    // theirs; t = 0.2 was chosen blind): for t ∈ {0.10, 0.20, 0.30,
    // 0.50} (micro-units), what the t-closeness release keeps and the
    // worst skew it admits (max released TVD — the disclosure bound
    // the release actually delivers, ≤ t by construction, read not
    // trusted). The per-cell TVD is gov_t_closeness's exact integer
    // arithmetic, computed ONCE (lazy local checkpoint on the scored
    // cell frame); the four thresholds are aggregations of it.
    Q("gov_t_eval",
      (s, dir) => {
        val ct = t(s, dir, "events")
          .groupBy(
            hour(col("ts")).cast("long").as("h"),
            dayofmonth(col("ts")).cast("long").as("d"),
            col("event_type"))
          .agg(count(lit(1)).as("n_ct"))
        val wT = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
        val wc = org.apache.spark.sql.expressions.Window.partitionBy("h", "d")
        val scored = ct
          .withColumn("n_t", sum("n_ct").over(wT))
          .withColumn("nn", sum("n_ct").over(wAll))
          .withColumn("n_c", sum("n_ct").over(wc))
          .withColumn("snt", sum("n_t").over(wc))
          .groupBy("h", "d", "n_c", "snt", "nn")
          // decimal(38,0) products — the gov_t_closeness overflow guard
          // (a long numerator wraps silently near ~1e9 events)
          .agg(sum(abs(col("n_ct").cast("decimal(38,0)") * col("nn")
              - col("n_t").cast("decimal(38,0)") * col("n_c")))
            .as("num_present"))
          .withColumn("num_total",
            (col("num_present")
              + (col("nn") - col("snt")).cast("decimal(38,0)") * col("n_c"))
              * lit(1000000L))
          .select(col("n_c").as("n"),
            expr("num_total div (cast(2 as decimal(38,0)) * n_c * nn)")
              .as("tvd_micro"))
          .localCheckpoint(eager = false)
        Seq(100000L, 200000L, 300000L, 500000L).map { tm =>
          scored.agg(
              sum(when(col("tvd_micro") <= tm, col("n")).otherwise(0L))
                .as("released_n"),
              sum(when(col("tvd_micro") > tm, col("n")).otherwise(0L))
                .as("suppressed_n"),
              sum(when(col("tvd_micro") <= tm, 1L).otherwise(0L)).as("cells"),
              coalesce(max(when(col("tvd_micro") <= tm, col("tvd_micro"))),
                lit(0L)).as("max_tvd_released_micro"))
            .select(lit(tm).as("t_micro"), col("released_n"),
              col("suppressed_n"), col("cells"),
              col("max_tvd_released_micro"))
        }.reduce(_ unionByName _).orderBy("t_micro")
      },
      Some("""WITH ct AS (SELECT extract(hour FROM ts) AS h,
                                 extract(day FROM ts) AS d,
                                 event_type, count(*) AS n_ct
                          FROM events GROUP BY 1, 2, 3),
                gm AS (SELECT event_type, sum(n_ct) AS n_t FROM ct GROUP BY 1),
                tot AS (SELECT sum(n_ct) AS nn FROM ct),
                f AS (SELECT h, d, n_ct, n_t, nn,
                             sum(n_ct) OVER (PARTITION BY h, d) AS n_c,
                             sum(n_t) OVER (PARTITION BY h, d) AS snt
                      FROM ct JOIN gm USING (event_type) CROSS JOIN tot),
                scored AS (SELECT h, d, CAST(n_c AS BIGINT) AS n,
                                  CAST((sum(abs(CAST(n_ct AS HUGEINT) * nn
                                                - CAST(n_t AS HUGEINT) * n_c))
                                        + (CAST(nn AS HUGEINT) - snt) * n_c) * 1000000
                                       // (2 * CAST(n_c AS HUGEINT) * nn) AS BIGINT) AS tvd_micro
                           FROM f GROUP BY h, d, n_c, snt, nn),
                ts_ AS (SELECT unnest([100000, 200000, 300000, 500000]) AS t_micro)
              SELECT t_micro,
                     CAST(COALESCE(sum(CASE WHEN tvd_micro <= t_micro THEN n END), 0)
                          AS BIGINT) AS released_n,
                     CAST(COALESCE(sum(CASE WHEN tvd_micro > t_micro THEN n END), 0)
                          AS BIGINT) AS suppressed_n,
                     CAST(COALESCE(sum(CASE WHEN tvd_micro <= t_micro THEN 1 END), 0)
                          AS BIGINT) AS cells,
                     CAST(COALESCE(max(CASE WHEN tvd_micro <= t_micro THEN tvd_micro END), 0)
                          AS BIGINT) AS max_tvd_released_micro
              FROM scored CROSS JOIN ts_
              GROUP BY t_micro ORDER BY t_micro""")),

    // DIFFERENTIALLY-PRIVATE count release (ε = 0.5 Laplace): per-type
    // event counts plus Laplace(1/ε) noise, released in micro-units so
    // the noisy value never re-rounds. The noise is SEEDED from the
    // group key itself (md5 bucket → u ∈ (−0.5, 0.5) → inverse-CDF
    // −(1/ε)·sign(u)·ln(1−2|u|)) — deterministic, engine-reproducible,
    // and quantized to micro-longs before it meets the count, so the
    // release is bit-stable under any partitioning. Real deployments
    // would draw u from a fresh CSPRNG per release; the inverse-CDF,
    // the sensitivity-1 count, and the max(0, ·) clamp are exactly the
    // published mechanism. One count aggregation; noise is a
    // projection on the |types|-row frame.
    Q("gov_dp_counts",
      (s, dir) => {
        // mechanism single-sourced with the streaming windowed release
        // (streaming/DpRelease) so batch and stream can never diverge
        t(s, dir, "events")
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .select(col("event_type"),
            graft.streaming.DpRelease
              .releasedMicro(col("n"), col("event_type"), eps = 0.5)
              .as("released_micro"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, count(*) AS n
                         FROM events GROUP BY 1),
                s AS (SELECT event_type, n,
                             ((('0x' || substr(md5(event_type), 1, 8))::BIGINT
                               % 1000000) + 0.5) / 1e6 - 0.5 AS u
                      FROM g)
              SELECT event_type,
                     greatest(0, n * 1000000 +
                       CAST(round((-1.0 / 0.5) * sign(u)
                              * ln(1.0 - 2.0 * abs(u)) * 1e6, 0) AS BIGINT))
                       AS released_micro
              FROM s ORDER BY event_type""")),

    // DIFFERENTIALLY-PRIVATE histogram release — the vector-valued
    // companion of gov_dp_counts (the two canonical DP release shapes:
    // a scalar count and a histogram): the document length histogram
    // (doc_drift_psi's fixed 10-bucket scheme, single-sourced from the
    // streaming twin) released with independent seeded Laplace(1/ε)
    // noise per cell. Disjoint cells ⇒ sensitivity 1 for the whole
    // vector, so ONE ε covers the release (parallel composition — the
    // published result); the seed is the bucket id, the mechanism is
    // DpRelease.laplaceMicro verbatim. One corpus scan into the
    // 10-row spine-densified histogram; noise is a projection on it.
    Q("gov_dp_hist",
      (s, dir) => {
        val d = t(s, dir, "documents").select(
          graft.streaming.DriftMonitor.lengthBucket(col("n_chars")).as("b"))
        val spine = s.range(0, 10).select(col("id").as("b"), lit(0L).as("c"))
        d.groupBy("b").agg(count(lit(1)).as("c"))
          .unionByName(spine)
          .groupBy("b").agg(sum("c").as("n"))
          .select(col("b"),
            graft.streaming.DpRelease
              .releasedMicro(col("n"), col("b").cast("string"), eps = 0.5)
              .as("released_micro"))
          .orderBy("b")
      },
      Some("""WITH d AS (SELECT greatest(0, least(9, COALESCE(n_chars, 0) // 50)) AS b FROM documents),
                c AS (SELECT t.b,
                             CAST(COALESCE(count(d.b), 0) AS BIGINT) AS n
                      FROM range(0, 10) t(b) LEFT JOIN d ON d.b = t.b
                      GROUP BY t.b),
                s AS (SELECT b, n,
                             ((('0x' || substr(md5(b::VARCHAR), 1, 8))::BIGINT
                               % 1000000) + 0.5) / 1e6 - 0.5 AS u
                      FROM c)
              SELECT b,
                     greatest(0, n * 1000000 +
                       CAST(round((-1.0 / 0.5) * sign(u)
                              * ln(1.0 - 2.0 * abs(u)) * 1e6, 0) AS BIGINT))
                       AS released_micro
              FROM s ORDER BY b""")),

    // ε-COMPOSITION LEDGER — the budget accounting the DP family was
    // missing: the engine releases scalar counts (gov_dp_counts, ε=0.5
    // per event type), a histogram (gov_dp_hist, ε=0.5 over 10 doc-
    // length buckets), and windowed streaming counts (DpRelease at one
    // release per closed (hour, key) cell); nothing totalled the spend,
    // and "can we publish all of these?" is a composition question.
    // Per family: releases made on this corpus, ε per release, the
    // family's ε under PARALLEL composition (McSherry 2009, PINQ: each
    // input record lands in exactly ONE cell of a partition, so
    // releasing every cell costs max — here all equal, so just ε), and
    // the naive SEQUENTIAL bound (Dwork–McSherry–Nissim–Smith 2006:
    // ε's add over releases touching the SAME records — what the
    // family would cost if its cells overlapped). The per-dataset
    // '__total__' rows then compose ACROSS families sequentially —
    // dp_counts and dp_windowed both read every events row, so their
    // family ε's add; GovernanceSpec pins the disjointness hypothesis
    // (one removed row perturbs at most one cell per family) and the
    // ledger arithmetic. All ε's in exact micro-longs. Scale: ONE
    // corpus shuffle builds the (hour, type) cell frame (lazy local
    // checkpoint — the gov_k_eval move); both event-family counts are
    // aggregates of that ≤|cells| frame; the histogram family is a
    // constant 10 (the release is spine-densified to 10 rows at any
    // corpus size, no scan needed for its CARDINALITY).
    Q("gov_eps_ledger",
      (s, dir) => {
        val epsMicro = 500000L // ε = 0.5, the family's declared budget
        val cells = t(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(eager = false)
        val nTypes = cells.select("event_type").distinct().count()
        val nWindowCells = cells.count()
        val fam = Seq(
          ("documents", "dp_hist", 10L),
          ("events", "dp_counts", nTypes),
          ("events", "dp_windowed", nWindowCells))
          .map { case (ds, f, n) =>
            s.range(1).select(lit(ds).as("dataset"), lit(f).as("family"),
              lit(n).as("releases_n"),
              lit(epsMicro).as("eps_each_micro"),
              lit(epsMicro).as("eps_parallel_micro"),
              lit(n * epsMicro).as("eps_seq_bound_micro"))
          }.reduce(_ unionByName _)
        val totals = fam.groupBy("dataset")
          .agg(sum("releases_n").as("releases_n"),
            sum("eps_parallel_micro").as("eps_parallel_micro"),
            sum("eps_seq_bound_micro").as("eps_seq_bound_micro"))
          .select(col("dataset"), lit("__total__").as("family"),
            col("releases_n"), lit(0L).as("eps_each_micro"),
            col("eps_parallel_micro"), col("eps_seq_bound_micro"))
        fam.unionByName(totals).orderBy("dataset", "family")
      },
      Some("""WITH cells AS (SELECT date_trunc('hour', ts) AS w,
                                    event_type, count(*) AS n
                             FROM events GROUP BY 1, 2),
                fam AS (
                  SELECT 'documents' AS dataset, 'dp_hist' AS family,
                         CAST(10 AS BIGINT) AS releases_n
                  UNION ALL
                  SELECT 'events', 'dp_counts',
                         CAST(count(DISTINCT event_type) AS BIGINT)
                  FROM cells
                  UNION ALL
                  SELECT 'events', 'dp_windowed', CAST(count(*) AS BIGINT)
                  FROM cells),
                f AS (SELECT dataset, family, releases_n,
                             CAST(500000 AS BIGINT) AS eps_each_micro,
                             CAST(500000 AS BIGINT) AS eps_parallel_micro,
                             CAST(releases_n * 500000 AS BIGINT)
                               AS eps_seq_bound_micro
                      FROM fam)
              SELECT * FROM f
              UNION ALL
              SELECT dataset, '__total__',
                     CAST(sum(releases_n) AS BIGINT),
                     CAST(0 AS BIGINT),
                     CAST(sum(eps_parallel_micro) AS BIGINT),
                     CAST(sum(eps_seq_bound_micro) AS BIGINT)
              FROM f GROUP BY dataset
              ORDER BY dataset, family""")),

    // DELETION-REQUEST propagation audit (right to be forgotten): the
    // delete list is every user whose md5 bucket < 10% (standing in
    // for the accumulated GDPR/CCPA request table), and the audit
    // reports, per event type, what the purge removes: kept rows,
    // purged rows, distinct purged users. The purge itself is the same
    // predicate applied as a filter — a zero-shuffle projection that
    // runs identically on the batch corpus or the live relay stream;
    // this op is the before-you-delete accounting. Single scan into a
    // (type, user) pre-aggregation — the distinct-user count collapses
    // into a plain sum over the group frame (no Expand doubling the
    // scan), and the md5 request-list membership evaluates once per
    // (type, user) group instead of once per event; the second shuffle
    // carries |types| rows. A join-form equivalent (broadcast LEFT
    // ANTI against the request table) is what a foreign-key purge
    // would use — join_anti pins that plan shape.
    Q("gov_forget_audit",
      (s, dir) => {
        val del = bucket(col("user_id").cast("string")) < 100000L
        t(s, dir, "events")
          .groupBy("event_type", "user_id")
          .agg(count(lit(1)).as("n"))
          .withColumn("del", del)
          .groupBy("event_type")
          .agg(
            sum(when(col("del"), 0L).otherwise(col("n"))).as("kept_n"),
            sum(when(col("del"), col("n")).otherwise(0L)).as("purged_n"),
            sum(when(col("del"), 1L).otherwise(0L)).as("purged_users"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
                     CAST(sum(CASE WHEN (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT
                                         % 1000000) < 100000
                              THEN 0 ELSE 1 END) AS BIGINT) AS kept_n,
                     CAST(sum(CASE WHEN (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT
                                         % 1000000) < 100000
                              THEN 1 ELSE 0 END) AS BIGINT) AS purged_n,
                     count(DISTINCT CASE WHEN (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT
                                               % 1000000) < 100000
                                    THEN user_id END) AS purged_users
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // The PURGE APPLIED — the other half of gov_forget_audit's
    // accounting: the CDC latest-state materialization (what a
    // downstream keeps current from the relay) with every requested
    // user's row REMOVED, via the foreign-key purge plan the audit's
    // scaladoc references: the request list is derived as its own
    // small table (in production, the consent/deletion-request
    // collection riding the same change feed) and consumed as a
    // BROADCAST LEFT ANTI join — no corpus re-shuffle, the snapshot
    // streams past the broadcast filter once. GovernanceSpec asserts
    // the anti join is broadcast and the survivors are disjoint from
    // an independently-derived request list.
    Q("gov_forget_apply",
      (s, dir) => {
        val latest = graft.cdc.ChangeEvents.latestState(
          t(s, dir, "events"),
          keyCols = Seq("user_id"),
          orderDesc = Seq(col("ts"), col("event_id")))
        val requests = t(s, dir, "events")
          .select(col("user_id"))
          .where(bucket(col("user_id").cast("string")) < 100000L)
          .distinct()
        // value quantizes to micro-longs (the rel_q9 convention): a
        // half-INTEGER tie is binary-exact below 2^51 so both engines
        // round it away from zero identically, whereas round(x, 2)'s
        // half-CENT ties are not representable and Spark (decimal-string
        // HALF_UP) and DuckDB (binary half-away-from-zero) can disagree.
        latest.join(broadcast(requests), Seq("user_id"), "left_anti")
          .select(col("user_id"),
            col("event_id").as("last_event_id"),
            col("event_type").as("last_type"),
            round(col("value") * lit(1e6), 0).cast("long")
              .as("last_value_micro"))
          .orderBy("user_id")
      },
      Some("""WITH latest AS (
                SELECT * FROM (SELECT *, row_number() OVER
                        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                      FROM events) WHERE rn = 1),
                req AS (SELECT DISTINCT user_id FROM events
                        WHERE (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT
                               % 1000000) < 100000)
              SELECT user_id, event_id AS last_event_id,
                     event_type AS last_type,
                     CAST(round(value * 1e6, 0) AS BIGINT) AS last_value_micro
              FROM latest
              WHERE user_id NOT IN (SELECT user_id FROM req)
              ORDER BY user_id""")),

    // PII-MASKING release audit — the measurement twin the masking
    // stage was missing (dedup has its banding eval, ANN its recall
    // curve, the classifier its eval + calibration; the mask shipped
    // unmeasured): per source, how much PII the feed carries (docs
    // affected, hits by kind) and the RESIDUAL after masking — the
    // release gate is residual_after_mask = 0, counted by re-running
    // the detectors on the masked text rather than trusted by
    // construction. Same deterministic contact-line injection as
    // text_pii_mask (the fixture carries no real PII, so the audit's
    // positives are planted arithmetic, identical in both engines).
    // One corpus scan into a |sources|-row conditional aggregation;
    // all counts are exact longs.
    Q("gov_pii_audit",
      (s, dir) => {
        val contact = concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
        val masked = graft.text.TextFunctions.maskPii(contact)
        val e = regexp_count(contact, lit(graft.text.TextFunctions.EmailRe))
          .cast("long")
        val p = regexp_count(contact, lit(graft.text.TextFunctions.PhoneRe))
          .cast("long")
        val resid =
          (regexp_count(masked, lit(graft.text.TextFunctions.EmailRe)) +
            regexp_count(masked, lit(graft.text.TextFunctions.PhoneRe)))
            .cast("long")
        t(s, dir, "documents")
          .select(col("source"), e.as("e"), p.as("p"), resid.as("resid"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("e") > 0L || col("p") > 0L, 1L).otherwise(0L))
              .as("docs_with_pii"),
            sum("e").as("n_emails"),
            sum("p").as("n_phones"),
            sum("resid").as("residual_after_mask"))
          .orderBy("source")
      },
      Some("""WITH injected AS (
                SELECT source,
                       text || ' contact user' || doc_id || '@example.com or +1-555-'
                            || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS c
                FROM documents),
                m AS (SELECT source,
                             len(regexp_extract_all(c, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS e,
                             len(regexp_extract_all(c, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS p,
                             len(regexp_extract_all(
                                   regexp_replace(
                                     regexp_replace(c, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
                                     '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
                                   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
                             + len(regexp_extract_all(
                                   regexp_replace(
                                     regexp_replace(c, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
                                     '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
                                   '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS resid
                      FROM injected)
              SELECT source,
                     count(*) AS n_docs,
                     CAST(sum(CASE WHEN e > 0 OR p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
                     CAST(sum(e) AS BIGINT) AS n_emails,
                     CAST(sum(p) AS BIGINT) AS n_phones,
                     CAST(sum(resid) AS BIGINT) AS residual_after_mask
              FROM m GROUP BY source ORDER BY source""")),

    // SNAPSHOT-DRIFT PSI: population stability index of the document
    // length distribution between two corpus halves (md5-split "ref"
    // vs "cur" snapshots — in production, last week's corpus vs this
    // week's ingest). Fixed-edge histogram (10 × 50-char buckets,
    // capped — learned edges would couple the two snapshots), add-1
    // smoothing so empty buckets stay finite, per-bucket term
    // (p−q)·ln(p/q) quantized to micro-longs, and the headline PSI is
    // the EXACT long sum of the terms (bucket = −1 row). One
    // conditional-count pass over the corpus reduces to a 10-row
    // frame joined against a generated bucket spine; the PSI
    // arithmetic never touches more than 10 rows, so the monitor costs
    // one scan at any corpus size — and the same histogram aggregation
    // runs unchanged on a stream (streaming/DriftMonitor).
    Q("doc_drift_psi",
      (s, dir) => {
        // bucket scheme single-sourced from the streaming twin so the
        // batch query and DriftMonitor can never bin differently
        val d = t(s, dir, "documents").select(
          graft.streaming.DriftMonitor.lengthBucket(col("n_chars")).as("b"),
          (bucket(col("doc_id").cast("string")) < 500000L).as("ref"))
        // the empty-bucket spine densifies via UNION + re-aggregate, not a
        // spine join: a window over a joined spark.range frame trips
        // Spark's ambiguous-self-join detector, and the union form costs
        // one extra ≤20-row exchange while keeping the corpus to ONE scan
        val agged = d.groupBy("b").agg(
          sum(when(col("ref"), 1L).otherwise(0L)).as("rn"),
          sum(when(col("ref"), 0L).otherwise(1L)).as("cn"))
        val spine = s.range(0, 10).select(col("id").as("b"),
          lit(0L).as("rn"), lit(0L).as("cn"))
        val counts = agged.unionByName(spine)
          .groupBy("b").agg(sum("rn").as("ref_n"), sum("cn").as("cur_n"))
        // smoothing totals via a constant-partition window over the 10-row
        // counts frame — a tot-aggregate branch would re-plan the whole
        // corpus scan per consumer
        val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
        val p = (col("ref_n") + lit(1L)).cast("double") /
          (sum("ref_n").over(w) + lit(10L)).cast("double")
        val q = (col("cur_n") + lit(1L)).cast("double") /
          (sum("cur_n").over(w) + lit(10L)).cast("double")
        val terms = counts
          .select(col("b"), col("ref_n"), col("cur_n"),
            round((p - q) * log(p / q) * lit(1e6), 0).cast("long")
              .as("term_micro"))
        // the headline total row (b = −1) comes out of the SAME pass via
        // rollup: singleton groups reproduce the bucket rows, the grand
        // total is the exact long sum of the micro terms
        terms.rollup("b")
          .agg(sum("ref_n").as("ref_n"), sum("cur_n").as("cur_n"),
            sum("term_micro").as("term_micro"))
          .select(coalesce(col("b"), lit(-1L)).as("b"),
            col("ref_n"), col("cur_n"), col("term_micro"))
          .orderBy("b")
      },
      Some("""WITH d AS (SELECT greatest(0, least(9, COALESCE(n_chars, 0) // 50)) AS b,
                                (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                                 % 1000000) < 500000 AS ref
                         FROM documents),
                c AS (SELECT t.b,
                             CAST(COALESCE(sum(CASE WHEN ref THEN 1 ELSE 0 END), 0) AS BIGINT) AS ref_n,
                             CAST(COALESCE(sum(CASE WHEN ref THEN 0 ELSE 1 END), 0) AS BIGINT) AS cur_n
                      FROM range(0, 10) t(b) LEFT JOIN d ON d.b = t.b
                      GROUP BY t.b),
                tot AS (SELECT CAST(sum(ref_n) + 10 AS BIGINT) AS nr,
                               CAST(sum(cur_n) + 10 AS BIGINT) AS nc FROM c),
                terms AS (SELECT b, ref_n, cur_n,
                                 CAST(round(((ref_n + 1.0) / nr - (cur_n + 1.0) / nc)
                                        * ln(((ref_n + 1.0) / nr) / ((cur_n + 1.0) / nc))
                                        * 1e6, 0) AS BIGINT) AS term_micro
                          FROM c, tot)
              SELECT b, ref_n, cur_n, term_micro FROM terms
              UNION ALL
              SELECT -1, CAST(sum(ref_n) AS BIGINT), CAST(sum(cur_n) AS BIGINT),
                     CAST(sum(term_micro) AS BIGINT)
              FROM terms
              ORDER BY b"""))
  )
}
