package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.StreamingOps

/** Structured Streaming flows exposed through the driver contract: the
  * stream is bounded (all of events.parquet), so the final state is
  * deterministic and checked against a batch DuckDB oracle.
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "s01_stream_window_agg" -> { (s, d) =>
      StreamingOps.runBoundedWindowAgg(s, d, "s01_sink")
    },

    "s02_stream_sessionization" -> { (s, d) =>
      StreamingOps.runBoundedSessionAgg(s, d, "s02_sink")
    },

    "s03_stream_first_seen" -> { (s, d) =>
      StreamingOps.runBoundedFirstSeen(s, d, "s03_sink")
    },

    "s04_stream_stream_join" -> { (s, d) =>
      StreamingOps.runBoundedAttribution(s, d, "s04_sink")
    },

    "s05_stream_dedup_delivery" -> { (s, d) =>
      StreamingOps.runBoundedDedupDelivery(s, d, "s05_sink")
    },

    "s06_stream_static_enrichment" -> { (s, d) =>
      StreamingOps.runBoundedEnrichment(s, d, "s06_sink")
    },

    "s07_stream_foreachbatch_upsert" -> { (s, d) =>
      StreamingOps.runBoundedForeachBatchUpsert(s, d, "s07_sink")
    },

    "s08_stream_left_outer_join" -> { (s, d) =>
      StreamingOps.runBoundedLeftOuterAttribution(s, d, "s08_sink")
    },

    "s09_stream_incremental_dedup" -> { (s, d) =>
      StreamingOps.runBoundedIncrementalDedup(s, d, "s09_sink")
    },

    "s10_stream_transform_with_state" -> { (s, d) =>
      StreamingOps.runBoundedTransformWithState(s, d, "s10_sink")
    },

    "s11_stream_hll_cardinality" -> { (s, d) =>
      StreamingOps.runBoundedStreamingHll(s, d, "s11_sink")
    },

    "s12_stream_quality_router" -> { (s, d) =>
      StreamingOps.runBoundedQualityRouter(s, d, "s12_sink")
    },

    "s13_stream_heavy_hitters" -> { (s, d) =>
      StreamingOps.runBoundedStreamingHeavyHitters(s, d, "s13_sink")
    },

    "s14_stream_anomaly_flags" -> { (s, d) =>
      StreamingOps.runBoundedAnomalyFlags(s, d, "s14_sink")
    },

    "s15_stream_funnel" -> { (s, d) =>
      StreamingOps.runBoundedFunnel(s, d, "s15_sink")
    },

    "s16_stream_late_data" -> { (s, d) =>
      StreamingOps.runBoundedLateDataAudit(s, d, "s16_sink")
    },

    "s17_stream_semi_join" -> { (s, d) =>
      StreamingOps.runBoundedSemiConversion(s, d, "s17_sink")
    },

    "s18_stream_rocksdb_state" -> { (s, d) =>
      StreamingOps.runBoundedWindowAggRocksDB(s, d, "s18_sink")
    },

    "s19_stream_checkpoint_recovery" -> { (s, d) =>
      StreamingOps.runBoundedCheckpointRecovery(s, d, "s19_sink")
    },

    "s20_stream_scd2_enrichment" -> { (s, d) =>
      StreamingOps.runBoundedScd2Enrichment(s, d, "s20_sink")
    },

    "s21_stream_available_now" -> { (s, d) =>
      StreamingOps.runBoundedAvailableNow(s, d, "s21_sink")
    },

    "s22_stream_rocksdb_recovery" -> { (s, d) =>
      StreamingOps.runBoundedRocksDbRecovery(s, d, "s22_sink")
    },

    "s23_stream_drift_monitor" -> { (s, d) =>
      StreamingOps.runBoundedDriftMonitor(s, d, "s23_sink")
    },

    "s24_stream_decontamination" -> { (s, d) =>
      StreamingOps.runBoundedStreamDecontamination(s, d, "s24_sink")
    },

    "s25_stream_filter_funnel" -> { (s, d) =>
      StreamingOps.runBoundedStreamFilterFunnel(s, d, "s25_sink")
    }
  )

  val oracleSql: Map[String, String] = Map(
    // the streaming funnel's complete-mode counters must equal the
    // batch d142 report
    "s25_stream_filter_funnel" ->
      """WITH b AS (
        |  SELECT source,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents
        |), sig AS (
        |  SELECT source, CAST(len(toks) AS BIGINT) AS n_words, n_chars,
        |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop
        |  FROM b
        |)
        |SELECT source,
        |  CASE
        |    WHEN n_words < 10 OR n_words > 5000 THEN '1_length'
        |    WHEN n_chars < n_words * 3 OR n_chars > n_words * 12 THEN '2_word_shape'
        |    WHEN n_stop * 50 < n_words THEN '3_stopword'
        |    ELSE '4_kept' END AS stage,
        |  CAST(count(1) AS BIGINT) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS n_tokens
        |FROM sig GROUP BY 1, 2 ORDER BY source, stage""".stripMargin,
    // the streaming quarantine log must reproduce the batch d133
    // result exactly — same planted corpus, same gram hashes
    "s24_stream_decontamination" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text || ' zzz' AS text
        |  FROM documents WHERE doc_id % 10 = 0
        |), g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 6),
        |      i -> ('0x' || substring(md5(array_to_string(toks[i : i + 7], ' ')), 1, 15))::BIGINT)) AS ghs
        |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM corpus)
        |  WHERE len(toks) >= 8
        |), tg AS (
        |  SELECT doc_id, gh FROM g, unnest(ghs) AS u(gh)
        |  WHERE NOT (doc_id % 50 = 0 AND doc_id < 1000000)
        |), eg AS (
        |  SELECT DISTINCT gh FROM g, unnest(ghs) AS u(gh)
        |  WHERE doc_id % 50 = 0 AND doc_id < 1000000
        |)
        |SELECT doc_id, CAST(count(1) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN e.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        |FROM tg t LEFT JOIN eg e ON t.gh = e.gh
        |GROUP BY doc_id
        |HAVING sum(CASE WHEN e.gh IS NOT NULL THEN 1 ELSE 0 END) > 0
        |ORDER BY doc_id""".stripMargin,
    // exact per-(day, type) distinct users; the HLL accuracy bound
    // (7.5% relative or 4 absolute) is pinned TRUE — register merges
    // are deterministic, so the streaming estimate is stable run-to-run
    "s11_stream_hll_cardinality" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  event_type, count(DISTINCT user_id) AS n_exact, TRUE AS within_tol
        |FROM events
        |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    // batch restatement: duplicate deliveries collapse to DISTINCT over
    // text-derived columns; the historical set suppresses 20% of hashes
    "s09_stream_incremental_dedup" ->
      """WITH stream AS (
        |  SELECT text, n_chars FROM documents
        |  UNION ALL
        |  SELECT text, n_chars FROM documents WHERE doc_id % 10 = 0
        |), hist AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 = 1
        |)
        |SELECT DISTINCT md5(text) AS text_hash, n_chars
        |FROM stream
        |WHERE md5(text) NOT IN (SELECT h FROM hist)
        |ORDER BY text_hash""".stripMargin,

    // batch restatement of the transformWithState running totals: the
    // bounded run is one micro-batch, so the emitted rows are the final
    // per-user state
    "s10_stream_transform_with_state" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, count(1) AS n_events, max(value) AS max_value,
        |  CAST(max(CASE WHEN rn = 1 THEN event_id END) AS BIGINT) AS last_event_id
        |FROM ranked GROUP BY user_id ORDER BY user_id""".stripMargin,
    // batch restatement of the self-terminating AvailableNow run:
    // both rate-limited micro-batches must land before it stops
    "s21_stream_available_now" ->
      """SELECT event_type, CAST(count(1) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // batch restatement of the SCD2 interval join: each event matches
    // the dimension version current at EVENT time
    "s20_stream_scd2_enrichment" ->
      """WITH dim AS (
        |  SELECT c_custkey AS key, c_mktsegment, CAST(v AS INT) AS version,
        |    CASE WHEN v = 1 THEN TIMESTAMP '1970-01-01'
        |         ELSE TIMESTAMP '2024-01-16' END AS vf,
        |    CASE WHEN v = 1 THEN TIMESTAMP '2024-01-16'
        |         ELSE TIMESTAMP '2100-01-01' END AS vt
        |  FROM customer, (SELECT unnest([1, 2]) AS v)
        |  WHERE c_custkey < 100
        |)
        |SELECT version, c_mktsegment, CAST(count(1) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN dim ON dim.key = e.user_id % 100
        |  AND e.ts >= vf AND e.ts < vt
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // batch restatement of the recovery run: totals over ALL events —
    // re-reading the committed half would double them, losing the
    // restored state would halve them
    "s19_stream_checkpoint_recovery" ->
      """SELECT event_type, CAST(count(1) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // recovery on the RocksDB provider must equal the same batch
    // totals — restart state reloads from the provider, not heap
    "s22_stream_rocksdb_recovery" ->
      """SELECT event_type, CAST(count(1) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // batch restatement of the streamed (day, type) counts + the same
    // integer TV fold over the complete day×type grid
    "s23_stream_drift_monitor" ->
      """WITH c AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), dt AS (
        |  SELECT day, CAST(sum(n) AS BIGINT) AS n_day FROM c GROUP BY 1
        |), g AS (
        |  SELECT event_type, CAST(sum(n) AS BIGINT) AS g FROM c GROUP BY 1
        |), gt AS (SELECT CAST(sum(g) AS BIGINT) AS g_total FROM g
        |), fgrid AS (
        |  SELECT dt.day, dt.n_day, g.event_type, g.g,
        |    COALESCE(c.n, 0) AS n
        |  FROM dt CROSS JOIN g
        |  LEFT JOIN c ON c.day = dt.day AND c.event_type = g.event_type
        |), d AS (
        |  SELECT day, n_day,
        |    abs(n * 1000 // n_day - g * 1000 // (SELECT g_total FROM gt)) AS diff
        |  FROM fgrid
        |)
        |SELECT day, n_day, CAST(sum(diff) // 2 AS BIGINT) AS tv_permille,
        |  sum(diff) // 2 >= 100 AS drifted
        |FROM d GROUP BY 1, 2 ORDER BY day""".stripMargin,

    // same batch restatement as s01 — the state backend swap (RocksDB
    // vs default HDFS-backed) must be invisible to the results
    "s18_stream_rocksdb_state" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(1) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // batch restatement of the left-semi conversion: clicks with at
    // least one purchase in their 30-minute window, each exactly once
    "s17_stream_semi_join" ->
      """SELECT DISTINCT e.user_id, e.event_id AS click_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
        |FROM events e
        |WHERE e.event_type = 'click' AND EXISTS (
        |  SELECT 1 FROM events p
        |  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
        |    AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 30 MINUTE)
        |ORDER BY user_id, click_id""".stripMargin,

    // batch restatement of the late-data audit: final state must equal
    // the ON-TIME stream's batch aggregation, and the entire 30-day-
    // late redelivery must be dropped. numRowsDroppedByWatermark sits
    // ABOVE the partial aggregate, so it counts dropped (window, type)
    // GROUPS of the late batch, not raw input rows — the oracle counts
    // the distinct late groups accordingly.
    "s16_stream_late_data" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  event_type, CAST(count(1) AS BIGINT) AS cnt,
        |  (SELECT count(1) FROM (
        |     SELECT DISTINCT date_trunc('day', ts - INTERVAL 30 DAY) AS d, event_type
        |     FROM events WHERE event_id % 7 = 0)) AS n_dropped_late
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // batch restatement of the per-user funnel state machine: first
    // view, first click strictly after it, first purchase strictly
    // after that; epoch_ms truncation matches Timestamp.getTime
    "s15_stream_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        |  WHERE e.event_type = 'click' GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        |  WHERE e.event_type = 'purchase' GROUP BY 1
        |), u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id,
        |  CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
        |  coalesce(epoch_ms(t1), -1) AS t1_ms,
        |  coalesce(epoch_ms(t2), -1) AS t2_ms,
        |  coalesce(epoch_ms(t3), -1) AS t3_ms
        |FROM u LEFT JOIN v ON u.user_id = v.user_id
        |  LEFT JOIN c ON u.user_id = c.user_id
        |  LEFT JOIN p ON u.user_id = p.user_id
        |ORDER BY u.user_id""".stripMargin,

    // batch restatement of the anomaly monitor: hourly per-type counts
    // vs 2× the type's mean hourly volume, integer cross-multiplied
    "s14_stream_anomaly_flags" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |    CAST(count(1) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2
        |), base AS (
        |  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total,
        |    CAST(count(1) AS BIGINT) AS n_windows
        |  FROM hourly GROUP BY 1
        |)
        |SELECT h.event_type, h.window_start, h.cnt, b.n_windows, b.total,
        |  h.cnt * b.n_windows > b.total * 2 AS is_spike
        |FROM hourly h JOIN base b ON h.event_type = b.event_type
        |ORDER BY h.event_type, h.window_start""".stripMargin,

    "s01_stream_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(1) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // gaps-and-islands batch restatement of 30-minute-gap sessions;
    // a new session starts when the gap is >= 30 min (Spark session
    // windows are [start, last+gap) — the end bound is exclusive)
    "s02_stream_sessionization" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g
        |)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(1) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "s03_stream_first_seen" ->
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "s04_stream_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  p.value
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,

    // the streaming left-outer must equal the batch left join once the
    // sentinel-advanced watermark has flushed every unmatched click
    "s08_stream_left_outer_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  p.value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON p.user_id = c.user_id
        |  AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,

    // if the streaming dedup removed every redelivered copy, the
    // per-type totals equal the batch totals of the ORIGINAL stream
    "s05_stream_dedup_delivery" ->
      """SELECT event_type, count(1) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // batch restatement of the stream⋈static-dim enrichment
    "s06_stream_static_enrichment" ->
      """SELECT c.c_mktsegment, count(1) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the upserted target's final state must equal the batch
    // aggregation regardless of how the micro-batches sliced the input
    "s07_stream_foreachbatch_upsert" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(1) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the Misra-Gries guarantee (every type with cnt > n/64 survives
    // any merge order) makes the filtered candidate set equal the
    // batch restatement
    "s13_stream_heavy_hitters" ->
      """WITH per AS (
        |  SELECT date_trunc('day', ts) AS day, event_type, count(1) AS cnt
        |  FROM events GROUP BY 1, 2
        |), tot AS (
        |  SELECT day, CAST(sum(cnt) AS BIGINT) AS n_events FROM per GROUP BY 1
        |)
        |SELECT strftime(per.day, '%Y-%m-%d') AS day, event_type, cnt, n_events
        |FROM per JOIN tot ON per.day = tot.day
        |WHERE cnt * 64 > n_events
        |ORDER BY day, event_type""".stripMargin,

    // the routed sinks' union must equal the batch split regardless of
    // micro-batch slicing
    "s12_stream_quality_router" ->
      """SELECT CASE WHEN n_chars >= 100
        |         AND len(regexp_split_to_array(trim(text), '\s+')) >= 20
        |       THEN 'accepted' ELSE 'quarantined' END AS verdict,
        |  lang, count(1) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY 1, 2 ORDER BY verdict, lang""".stripMargin
  )
}
