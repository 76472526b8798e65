package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.cdc.ChangeEvents
import graft.functions.ExtJson.ext_json_canonical

/** The reference's CDC semantics (SURVEY.md §2.1 R1–R9) re-expressed as
  * relational ops over the `events` fixture, which stands in for the change
  * stream (`event_type`↔`operationType`, `user_id`↔`documentKey`,
  * `props`↔`fullDocument` — FIXTURES.md §2).
  *
  * Every query ends in a total-order ORDER BY so the DuckDB oracle
  * hash-compare is deterministic (SURVEY.md §7.6). All are narrow or
  * single-shuffle plans: filters/projections push into the parquet scan;
  * the only shuffles are the window partitionBy in `cdc_latest_state` and
  * the final global sorts (which at cluster scale are range-partition
  * sorts, not single-node).
  */
object CdcQueries extends QueryPack {

  /** The event-analog of the document-op whitelist (reference panics on the
    * rest — main.go:111-116; `error` plays the role of `invalidate`).
    */
  private val opWhitelist = Seq("click", "purchase", "signup", "view")

  override val queries: Seq[Q] = Seq(

    // R5 (main.go:113): dynamic content-based topic routing "{db}.{coll}".
    Q("cdc_route",
      (s, dir) => t(s, dir, "events")
        .select(
          col("event_id"),
          ChangeEvents.topicColumn(lit("db"), col("event_type")).as("topic"))
        .orderBy("event_id"),
      Some("""SELECT event_id, 'db' || '.' || event_type AS topic
              FROM events ORDER BY event_id""")),

    // R7 (main.go:123-131): Kafka-Connect key envelope, byte-exact.
    Q("cdc_key_envelope",
      (s, dir) => t(s, dir, "events")
        .select(
          col("event_id"),
          ChangeEvents.connectKeyEnvelope(col("user_id").cast("string")).as("key"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                     '{"schema":{"type":"string","optional":false},"payload":"'
                       || CAST(user_id AS VARCHAR) || '"}' AS key
              FROM events ORDER BY event_id""")),

    // §2.2: keep only document ops; invalidate-analogs dead-letter.
    Q("cdc_op_filter",
      (s, dir) => t(s, dir, "events")
        .filter(col("event_type").isin(opWhitelist: _*))
        .select("event_id", "event_type")
        .orderBy("event_id"),
      Some("""SELECT event_id, event_type FROM events
              WHERE event_type IN ('click','purchase','signup','view')
              ORDER BY event_id""")),

    // R4 (main.go:111-116): schema-on-read field extraction from the
    // dynamic JSON payload (the reference's bson.M access).
    Q("cdc_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
              FROM events ORDER BY event_id""")),

    // R8 (main.go:138): canonical ExtJSON value rendering via the native
    // ExtJsonCanonical expression; DuckDB oracle assembles the same bytes
    // independently by string concat.
    Q("cdc_value_extjson",
      (s, dir) => t(s, dir, "events")
        .select(
          col("event_id"),
          ext_json_canonical(struct(
            col("event_id"),
            col("user_id"),
            col("event_type").as("op"))).as("value"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                     '{"event_id":{"$numberLong":"' || event_id
                       || '"},"user_id":{"$numberLong":"' || user_id
                       || '"},"op":"' || event_type || '"}' AS value
              FROM events ORDER BY event_id""")),

    // §2.2 delivery semantics: replay compensation — dedup by key.
    Q("cdc_dedup",
      (s, dir) => t(s, dir, "events")
        .select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type"),
      Some("""SELECT DISTINCT user_id, event_type FROM events
              ORDER BY user_id, event_type""")),

    // Materialized latest state per key (UpdateLookup post-image view,
    // main.go:92): last event wins, deterministic tie-break on event_id.
    Q("cdc_latest_state",
      (s, dir) => ChangeEvents.latestState(
          t(s, dir, "events"),
          keyCols = Seq("user_id"),
          orderDesc = Seq(col("ts"), col("event_id")))
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          round(col("value"), 2).as("last_value"))
        .orderBy("user_id"),
      Some("""SELECT user_id, event_id AS last_event_id,
                     event_type AS last_type, round(value, 2) AS last_value
              FROM (SELECT *, row_number() OVER
                      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                    FROM events)
              WHERE rn = 1 ORDER BY user_id""")),

    // Aggregate over the CDC-materialized view: the latest-state table
    // (what a downstream keeps current from the relay) queried like any
    // other table — current-state counts and balances per last event
    // type. Window to materialize + one partial+final agg; at scale the
    // view is incrementally maintained by the streaming latest-state
    // operators and only this small aggregation runs per refresh.
    Q("cdc_latest_agg",
      (s, dir) => ChangeEvents.latestState(
          t(s, dir, "events"),
          keyCols = Seq("user_id"),
          orderDesc = Seq(col("ts"), col("event_id")))
        .groupBy(col("event_type").as("last_type"))
        .agg(count(lit(1)).as("n_users"),
          round(sum("value"), 2).as("sum_last_value"))
        .orderBy("last_type"),
      Some("""SELECT event_type AS last_type, count(*) AS n_users,
                     round(sum(value), 2) AS sum_last_value
              FROM (SELECT *, row_number() OVER
                      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                    FROM events)
              WHERE rn = 1
              GROUP BY last_type ORDER BY last_type""")),

    // Point-in-time SNAPSHOT from the change log — "what did the table
    // look like AS OF T?": the time-travel read a CDC-fed lake serves
    // from its event history (the batch shadow of resuming the reference's
    // change stream at a token and materializing, main.go:91-95). The cut
    // here derives from the log itself (midpoint of the observed span, one
    // tiny agg broadcast back) so the query is scale-free; in production T
    // is a LITERAL and the ts predicate pushes into the scan — time-
    // partitioned logs prune to the prefix ≤ T before any row reads.
    // Integer-µs arithmetic both sides (epoch span ≪ 2^63).
    Q("cdc_snapshot_at",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val cut = ev.agg(min(unix_micros(col("ts"))).as("mn"),
            max(unix_micros(col("ts"))).as("mx"))
          .select(expr("(mn + mx) div 2").as("cut"))
        ChangeEvents.latestState(
            ev.crossJoin(broadcast(cut))
              .filter(unix_micros(col("ts")) <= col("cut")),
            keyCols = Seq("user_id"),
            orderDesc = Seq(col("ts"), col("event_id")))
          .select(
            col("user_id"),
            col("event_id").as("last_event_id"),
            col("event_type").as("last_type"),
            round(col("value"), 2).as("last_value"))
          .orderBy("user_id")
      },
      Some("""WITH cut AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS c
                           FROM events)
              SELECT user_id, event_id AS last_event_id,
                     event_type AS last_type, round(value, 2) AS last_value
              FROM (SELECT *, row_number() OVER
                      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                    FROM events, cut WHERE epoch_us(ts) <= c)
              WHERE rn = 1 ORDER BY user_id""")),

    // R2/R4: projection + predicate, pushed into the parquet scan.
    Q("proj_filter",
      (s, dir) => t(s, dir, "events")
        .filter(col("value") > 10 && col("event_type") =!= "error")
        .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"))
        .orderBy("event_id"),
      Some("""SELECT event_id, event_type, round(value, 2) AS value
              FROM events WHERE value > 10 AND event_type <> 'error'
              ORDER BY event_id""")),

    // CDC MERGE (apply): fold the latest change per key into a base
    // snapshot — the canonical materialization step downstream of any
    // change relay (Debezium→lakehouse MERGE INTO). Semantics: the last
    // event per key wins (deterministic ts/event_id order); an
    // `error`-typed last event is the delete/invalidate analog and
    // REMOVES the key; any other last event UPSERTS its value; base rows
    // without changes pass through. Shape at 100 TB: one window shuffle
    // on the (small) change stream + one key-partitioned FULL OUTER join
    // against the snapshot — the snapshot side needs no shuffle at all
    // when it is bucketed/partitioned on the key (SharedBucketedTables
    // pattern), which is how an hourly MERGE over a 100 TB table stays
    // bounded by the delta size, not the table size.
    Q("cdc_merge_apply",
      (s, dir) => {
        val changes = ChangeEvents.latestState(
            t(s, dir, "events"),
            keyCols = Seq("user_id"),
            orderDesc = Seq(col("ts"), col("event_id")))
          .select(col("user_id"), col("event_type").as("last_type"),
            col("value").as("new_value"))
        val base = t(s, dir, "customer")
          .select(col("c_custkey").as("key"), col("c_acctbal").as("balance"))
        base.join(changes, col("key") === col("user_id"), "full_outer")
          .filter(coalesce(col("last_type"), lit("")) =!= "error")
          .select(
            coalesce(col("key"), col("user_id")).as("key"),
            round(when(col("user_id").isNotNull, col("new_value"))
              .otherwise(col("balance")), 2).as("balance"),
            when(col("user_id").isNotNull, lit("cdc")).otherwise(lit("base"))
              .as("src"))
          .orderBy("key")
      },
      Some("""WITH latest AS (
                SELECT user_id, event_type AS last_type, value AS new_value
                FROM (SELECT *, row_number() OVER
                        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                      FROM events)
                WHERE rn = 1)
              SELECT COALESCE(c.c_custkey, l.user_id) AS key,
                     round(CASE WHEN l.user_id IS NOT NULL THEN l.new_value
                                ELSE c.c_acctbal END, 2) AS balance,
                     CASE WHEN l.user_id IS NOT NULL THEN 'cdc'
                          ELSE 'base' END AS src
              FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.user_id
              WHERE COALESCE(l.last_type, '') <> 'error'
              ORDER BY key""")),

    // Stream-static enrichment (batch analog of joining the change
    // stream against a dimension table before producing): every event
    // picks up its customer's segment/nation via a BROADCAST of the dim
    // side — the event stream itself never shuffles, which is the only
    // shape that works when the left side is unbounded.
    Q("cdc_enrich",
      (s, dir) => t(s, dir, "events")
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))),
          col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("c_mktsegment").as("segment"),
          col("c_nationkey").as("nation"),
          round(col("value"), 2).as("value"))
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id, event_type,
                     c_mktsegment AS segment, c_nationkey AS nation,
                     round(value, 2) AS value
              FROM events JOIN customer ON user_id = c_custkey
              ORDER BY event_id""")),

    // STREAM-STREAM enrichment, batch twin: every purchase picks up the
    // same user's view events from its trailing 1-hour window — the
    // exact code path (StreamStreamJoin.intervalEnrich) the streaming
    // interval join runs, executed over batch frames (the watermark
    // nodes eliminate for batch children), so DuckDB can oracle the
    // join semantics the MemoryStream tests exercise live. Scale shape:
    // one key shuffle per side into a symmetric hash join; streaming
    // state stays finite because the interval is two-sided.
    Q("cdc_stream_enrich",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
            col("ts").as("p_ts"), col("value"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
            col("ts").as("v_ts"))
        graft.streaming.StreamStreamJoin.intervalEnrich(
            purchases, "p_user", "p_ts", views, "v_user", "v_ts", "1 HOUR")
          .select(col("p_id"), col("p_user").as("user_id"), col("v_id"),
            round(col("value"), 2).as("value"))
          .orderBy("p_id", "v_id")
      },
      Some("""SELECT p.event_id AS p_id, p.user_id AS user_id,
                     v.event_id AS v_id, round(p.value, 2) AS value
              FROM events p JOIN events v ON p.user_id = v.user_id
              WHERE p.event_type = 'purchase' AND v.event_type = 'view'
                AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
              ORDER BY p_id, v_id""")),

    // The OUTER flavor of the stream-stream enrichment: EVERY purchase
    // survives, null-padded when no view fell in its trailing hour — in
    // streaming, the null row is emitted only once the watermark proves
    // no match can arrive (the state-eviction-driven case the
    // StatefulStreamingSpec left-outer test pins). Same shared code
    // path; null sort order pinned FIRST on the nullable column so both
    // engines hash identically.
    Q("cdc_stream_enrich_outer",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
            col("ts").as("p_ts"), col("value"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
            col("ts").as("v_ts"))
        graft.streaming.StreamStreamJoin.intervalEnrich(
            purchases, "p_user", "p_ts", views, "v_user", "v_ts", "1 HOUR",
            joinType = "left_outer")
          .select(col("p_id"), col("p_user").as("user_id"), col("v_id"),
            round(col("value"), 2).as("value"))
          .orderBy(col("p_id"), col("v_id").asc_nulls_first)
      },
      Some("""SELECT p.event_id AS p_id, p.user_id AS user_id,
                     v.event_id AS v_id, round(p.value, 2) AS value
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
                ON p.user_id = v.user_id
               AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
              ORDER BY p_id, v_id NULLS FIRST""")),

    // SCD TYPE-2 dimension history from the change stream — the thing a
    // CDC consumer most often materializes: per key, consecutive
    // duplicate states collapse (change detection via lag), each
    // surviving version gets [valid_from, valid_to) from its own ts and
    // the NEXT version's ts (lead), open-ended for the current row.
    // Both windows share the user_id partitioning, so the whole history
    // build is ONE key shuffle however large the stream; the change
    // event_id doubles as the surrogate version key, making the output
    // order (and the oracle hash) exact. µs-precision timestamps so
    // same-second flips can't alias.
    Q("cdc_scd2",
      (s, dir) => {
        val byKey = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
        t(s, dir, "events")
          .withColumn("prev_state", lag("event_type", 1).over(byKey))
          .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
          .withColumn("next_ts", lead("ts", 1).over(byKey))
          .select(
            col("user_id"),
            col("event_id").as("version_id"),
            col("event_type").as("state"),
            date_format(col("ts"), fmt).as("valid_from"),
            date_format(col("next_ts"), fmt).as("valid_to"),
            when(col("next_ts").isNull, lit(1)).otherwise(lit(0)).as("is_current"))
          .orderBy("user_id", "version_id")
      },
      Some("""WITH changes AS (
                SELECT user_id, event_id, event_type, ts
                FROM (SELECT *, lag(event_type) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
                      FROM events)
                WHERE prev_state IS NULL OR prev_state <> event_type),
              versioned AS (
                SELECT user_id, event_id AS version_id, event_type AS state, ts,
                       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         AS next_ts
                FROM changes)
              SELECT user_id, version_id, state,
                     strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
                     strftime(next_ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
                     CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS is_current
              FROM versioned ORDER BY user_id, version_id""")),

    // POINT-IN-TIME enrichment against the SCD2 history — the
    // feature-store primitive (training-serving skew dies here): each
    // purchase picks the dimension version that was VALID AT ITS
    // TIMESTAMP, never a later one. The relational statement is an
    // interval join (ts ∈ [valid_from, valid_to)), which is what the
    // oracle runs — but the Spark plan is the union-and-last-non-null
    // trick: version starts and facts interleave in ONE (user_id)
    // window sort (kind orders a version before a same-µs fact, so a
    // state change and the purchase that caused it resolve like the
    // interval semantics say), and the running last-non-null carries
    // the current version onto every fact. One key shuffle, NO join at
    // all — the interval join's O(facts × versions-per-key) probe work
    // becomes a linear merge, which is why feature stores backfill this
    // way at scale. Zero-width versions (two changes at one µs) drop
    // out naturally: the later change overwrites before any fact reads.
    Q("cdc_pit_enrich",
      (s, dir) => {
        val byKey = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val ev = t(s, dir, "events")
        val versions = ev
          .withColumn("prev_state", lag("event_type", 1).over(byKey))
          .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
          .select(col("user_id"), col("ts"), lit(0).as("kind"),
            col("event_id"), col("event_id").as("version_id"),
            col("event_type").as("state"))
        val facts = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("kind"),
            col("event_id"), lit(null).cast("long").as("version_id"),
            lit(null).cast("string").as("state"))
        val merged = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("kind"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        versions.unionByName(facts)
          .withColumn("cur_version",
            last("version_id", ignoreNulls = true).over(merged))
          .withColumn("cur_state", last("state", ignoreNulls = true).over(merged))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("user_id"),
            col("cur_version").as("version_id"), col("cur_state").as("state"))
          .orderBy("event_id")
      },
      Some("""WITH changes AS (
                SELECT user_id, event_id, event_type, ts
                FROM (SELECT *, lag(event_type) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                      FROM events)
                WHERE prev IS NULL OR prev <> event_type),
              versions AS (
                SELECT user_id, event_id AS version_id, event_type AS state,
                       ts AS vf,
                       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         AS vt
                FROM changes),
              p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase')
              SELECT p.event_id, p.user_id, v.version_id, v.state
              FROM p JOIN versions v
                ON p.user_id = v.user_id AND p.ts >= v.vf
               AND (v.vt IS NULL OR p.ts < v.vt)
              ORDER BY p.event_id""")),

    // Incremental view maintenance with retractions — the aggregate a
    // downstream keeps current WITHOUT ever recomputing it from the
    // latest-state table. Each change event emits up to two delta rows
    // against SUM(value)/COUNT(*) GROUP BY current-type: an addition
    // (+value, +1) into its own group and, when the key was seen before,
    // a retraction (−prev_value, −1) out of the group the key previously
    // occupied (lag over the key window = the "old image" a real CDC
    // update carries). Folding the deltas reproduces the latest-state
    // aggregate exactly — which is what the oracle checks: the SQL is
    // the MATERIALIZED form (row_number latest state → group), the Spark
    // side is the DELTA form, and they must hash-equal. One key shuffle
    // for the lag window; both delta rows come out of a single in-row
    // inline_outer (no second pass, no union rescan); the group-by folds
    // with partial aggregation. At 100 TB the deltas are the day's
    // change volume, not the table — this is why a relay consumer's
    // dashboard refresh is O(changes), not O(state).
    Q("cdc_incr_agg",
      (s, dir) => {
        val byKey = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("prev_type", lag("event_type", 1).over(byKey))
          .withColumn("prev_value", lag("value", 1).over(byKey))
          .select(explode(array(
            struct(col("event_type").as("grp"), col("value").as("dv"),
              lit(1L).as("dn")),
            struct(col("prev_type").as("grp"), (-col("prev_value")).as("dv"),
              lit(-1L).as("dn")))).as("delta"))
          .filter(col("delta.grp").isNotNull)
          .groupBy(col("delta.grp").as("last_type"))
          .agg(sum("delta.dn").as("n_users"),
            round(sum("delta.dv"), 2).as("sum_last_value"))
          .orderBy("last_type")
      },
      Some("""SELECT event_type AS last_type, count(*) AS n_users,
                     round(sum(value), 2) AS sum_last_value
              FROM (SELECT *, row_number() OVER
                      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                    FROM events)
              WHERE rn = 1
              GROUP BY last_type ORDER BY last_type""")))
}
