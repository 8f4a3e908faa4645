package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ingest.Parse
import graft.ops.{AsofJoin, EmbeddingSim, EventAnalytics, Forecast, IntervalJoin, Latest, Multimodal, Rollup, Sequences, Sketches}
import graft.streaming.Ingest

/** Sequence assembly, forecasting, as-of joins, pivot, streaming ingest and
  * multimodal plumbing — the remaining SURVEY.md §7.2 build steps (5-8) as
  * driver-checkable queries.
  */
object Pipeline {

  private def obs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Parse.eventsAsObservations(Tables.events(s, dir))

  /** Per-corpus suffix for streaming staging/store directories under
    * target/ (ADVICE r17): two executions of the same staged-replay query
    * against DIFFERENT corpora (e.g. the sf0.001 bench warm-up and the
    * sf0.1 timed run, or a parallelized Verify) must not race on a shared
    * fixed path. Name + an md5 prefix of the FULL path (review r18: a
    * 32-bit String.hashCode leaves a silent-collision space between
    * same-basename checkouts; md5's 64 bits here do not).
    *
    * CONTRACT (ADVICE r18): the tag is a pure function of the corpus dir —
    * deliberately, so reruns against one corpus REPLACE their staging and
    * store scratch instead of accumulating one copy per invocation under
    * target/ (envelope runs repeat the bench many times). The corollary is
    * that a given corpus dir must not run the SAME staged-replay query
    * CONCURRENTLY in one working directory: two such executions would
    * interleave deleteRecursively/write on the shared tagged path. The
    * driver contract runs queries sequentially; parallel harnesses must
    * shard by corpus dir (different dirs never collide). */
  private def stagingTag(dir: String): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    // single-part-identifier-safe (the tag also names memory-sink temp
    // views, which reject dots as multi-part names): sf0.01 → sf0_01
    new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9_]", "_") +
      "_" + md5
  }

  val all: Seq[QuerySpec] = Seq(

    // W4/W5 flattened: rolling 24-row window features + 3 lead targets,
    // completeness-filtered — the oracle-checkable core of sequence assembly.
    QuerySpec.sql("seq_flat_features",
      """SELECT CAST(user_id AS VARCHAR) AS location, event_id, epoch_us(ts) AS event_us,
        |       count(*) OVER w24 AS n_window,
        |       floor(sum(CAST(floor(value * 1000000.0) AS BIGINT)) OVER w24 / 24.0) / 1000000.0 AS avg_value,
        |       min(value) OVER w24 AS min_value,
        |       max(value) OVER w24 AS max_value,
        |       lead(value, 1) OVER wo AS t1,
        |       lead(value, 2) OVER wo AS t2,
        |       lead(value, 3) OVER wo AS t3
        |FROM events
        |WINDOW w24 AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW),
        |       wo AS (PARTITION BY user_id ORDER BY ts, event_id)
        |QUALIFY n_window = 24 AND t3 IS NOT NULL
        |ORDER BY location, event_id""") {
      (s, dir) =>
        Sequences.flatFeatures(obs(s, dir), seqLen = 24, leads = 3)
          .select(col("location"), col("event_id"), col("event_us"),
            col("n_window"), col("avg_value"), col("min_value"), col("max_value"),
            col("t1"), col("t2"), col("t3"))
          .orderBy(col("location"), col("event_id"))
    },

    // W4/W5 full form: array-of-struct sequence records (getSample parity),
    // hash-checked through a lossless scalar serialization — each step
    // becomes "epochUs:floor(value·1e6):code" and the 24-step history is
    // pipe-joined in window order (nested arrays crash the checker's
    // pandas sort, and engine JSON text isn't canonical across engines;
    // an integer-quantized concat is bit-identical in both). The native
    // array-of-struct form stays the operator's API (SequencesSpec golden).
    QuerySpec.sql("seq_windows",
      """WITH e AS (
        |  SELECT CAST(user_id AS VARCHAR) AS location, epoch_us(ts) AS us, event_id,
        |         epoch_us(ts) || ':' || CAST(floor(value * 1000000) AS BIGINT) || ':' || event_type AS elem
        |  FROM events),
        |win AS (
        |  SELECT location, us,
        |         count(*) OVER w24 AS n_window,
        |         min(us) OVER w24 AS start_us,
        |         string_agg(elem, '|') OVER w24 AS seq,
        |         lead(elem, 1) OVER wo AS t1,
        |         lead(elem, 2) OVER wo AS t2,
        |         lead(elem, 3) OVER wo AS t3
        |  FROM e
        |  WINDOW w24 AS (PARTITION BY location ORDER BY us, event_id
        |                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW),
        |         wo AS (PARTITION BY location ORDER BY us, event_id))
        |SELECT location, start_us, us AS end_us, seq, t1, t2, t3
        |FROM win WHERE n_window = 24 AND t3 IS NOT NULL
        |ORDER BY location, end_us, seq""") {
      (s, dir) => {
        def elem(f: org.apache.spark.sql.Column) = concat_ws(":",
          unix_micros(f.getField("event_timestamp")),
          floor(f.getField("value") * 1000000).cast("long"),
          f.getField("code"))
        Sequences.build(obs(s, dir), seqLen = 24, forecastLen = 3,
            features = Seq("value", "code"))
          .select(col("location"),
            unix_micros(col("start_timestamp")).as("start_us"),
            unix_micros(col("end_timestamp")).as("end_us"),
            array_join(transform(col("sequence"), elem(_)), "|").as("seq"),
            elem(element_at(col("target_sequence"), 1)).as("t1"),
            elem(element_at(col("target_sequence"), 2)).as("t2"),
            elem(element_at(col("target_sequence"), 3)).as("t3"))
          .orderBy(col("location"), col("end_us"), col("seq"))
      }
    },

    // Forecast: per-location linear drift rolled 12 5-minute steps forward.
    QuerySpec.sql("forecast_linear",
      """WITH ranked AS (
        |  SELECT user_id, ts, event_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events QUALIFY rn <= 24),
        |agg AS (
        |  SELECT user_id, arg_min(value, rn) AS v_last, arg_min(ts, rn) AS ts_last,
        |         arg_max(value, rn) AS v_first, count(*) AS n
        |  FROM ranked GROUP BY 1)
        |SELECT CAST(user_id AS VARCHAR) AS location, i AS step,
        |       epoch_us(ts_last + i * INTERVAL 5 MINUTE) AS pred_us,
        |       round(v_last + ((v_last - v_first) / 23.0) * i, 4) AS pred
        |FROM agg CROSS JOIN range(1, 13) r(i)
        |WHERE n = 24
        |ORDER BY location, step""") {
      (s, dir) =>
        Forecast.linear(obs(s, dir), lookback = 24, steps = 12)
          .select(col("location"), col("step"), col("pred_us"),
            round(col("pred"), 4).as("pred"))
          .orderBy(col("location"), col("step"))
    },

    // A9: hourly aggregation of the forecast rows.
    QuerySpec.sql("forecast_hourly",
      """WITH ranked AS (
        |  SELECT user_id, ts, event_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events QUALIFY rn <= 24),
        |agg AS (
        |  SELECT user_id, arg_min(value, rn) AS v_last, arg_min(ts, rn) AS ts_last,
        |         arg_max(value, rn) AS v_first, count(*) AS n
        |  FROM ranked GROUP BY 1),
        |f AS (
        |  SELECT user_id, ts_last + i * INTERVAL 5 MINUTE AS pred_ts,
        |         v_last + ((v_last - v_first) / 23.0) * i AS pred
        |  FROM agg CROSS JOIN range(1, 13) r(i) WHERE n = 24)
        |SELECT CAST(user_id AS VARCHAR) AS location, CAST(hour(pred_ts) AS INT) AS pred_hour,
        |       round(avg(pred), 4) AS avg_pred, count(*) AS n_steps
        |FROM f GROUP BY 1, 2 ORDER BY location, pred_hour""") {
      (s, dir) =>
        Forecast.hourlyRollup(Forecast.linear(obs(s, dir), lookback = 24, steps = 12))
          .orderBy(col("location"), col("pred_hour"))
    },

    // As-of join: each purchase matched to the user's most recent view at
    // or before it (union+window plan; oracle uses DuckDB's native ASOF).
    QuerySpec.sql("asof_purchase_view",
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'view'
        |      QUALIFY row_number() OVER (PARTITION BY user_id, us ORDER BY event_id DESC) = 1),
        |p AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'purchase')
        |SELECT CAST(p.user_id AS VARCHAR) AS location, p.event_id AS event_id, p.us AS event_us,
        |       v.event_id AS matched_id, v.us AS matched_us, p.us - v.us AS gap_us
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.us <= p.us
        |ORDER BY p.event_id""") {
      (s, dir) => {
        val o = obs(s, dir)
        val views = Latest.keepFirst(
          o.filter(col("code") === "view"),
          Seq("location", "event_timestamp"), Seq(col("event_id").desc))
        val purchases = o.filter(col("code") === "purchase")
        AsofJoin.leftAsof(purchases, views, key = "location",
            ts = "event_timestamp", leftId = "event_id", rightId = "event_id")
          .select(col("location"), col("event_id"),
            unix_micros(col("event_timestamp")).as("event_us"),
            col("matched_id"),
            unix_micros(col("matched_ts")).as("matched_us"),
            (unix_micros(col("event_timestamp")) - unix_micros(col("matched_ts"))).as("gap_us"))
          .orderBy(col("event_id"))
      }
    },

    // Attribution-window join (interval×point): per purchase, the same
    // user's events in the 30 minutes before it — bin-bucketed equi-join
    // on (user, time-bin) + residual, never a theta join; cent-exact sums.
    QuerySpec.sql("q_attribution_window",
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, us AS end_us,
        |             us - 1800000000 AS start_us
        |      FROM e WHERE event_type = 'purchase')
        |SELECT purchase_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(e.cents) AS BIGINT) AS cents_total, max(e.us) AS last_us
        |FROM p JOIN e ON e.user_id = p.user_id
        |              AND e.us >= p.start_us AND e.us < p.end_us
        |GROUP BY 1 ORDER BY purchase_id""") {
      (s, dir) =>
        IntervalJoin.attributionWindow(Tables.events(s, dir), windowMinutes = 30)
          .orderBy(col("purchase_id"))
    },

    // RANGE frame (time-based, not row-based): trailing 1h window per
    // location keyed on epoch-µs — rows with equal distance-in-time peers
    // aggregate identically regardless of arrival order (ROWS frames
    // cannot express this). Quantized sum keeps the mean exact.
    QuerySpec.sql("seq_time_range_window",
      """SELECT CAST(user_id AS VARCHAR) AS location, event_id,
        |       epoch_us(ts) AS event_us,
        |       count(*) OVER w AS n_1h,
        |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) OVER w AS BIGINT) AS qsum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY location, event_id""") {
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = obs(s, dir).withColumn("us", unix_micros(col("event_timestamp")))
        val w = Window.partitionBy(col("location")).orderBy(col("us"))
          .rangeBetween(-3600L * 1000000, Window.currentRow)
        o.select(col("location"), col("event_id"), col("us").as("event_us"),
            count(lit(1)).over(w).as("n_1h"),
            sum(floor(col("value") * 1000000).cast("long")).over(w).as("qsum_1h"))
          .orderBy(col("location"), col("event_id"))
      }
    },

    // Grouping sets beyond ROLLUP: (lang), (source), () marginals in one
    // pass — cube + grouping_id selection on the Spark side, native
    // GROUPING SETS in the oracle.
    QuerySpec.sql("q_grouping_sets",
      """SELECT coalesce(lang, '(all)') AS lang, coalesce(source, '(all)') AS source,
        |       count(*) AS n_docs
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY lang, source""") {
      (s, dir) =>
        Tables.documents(s, dir)
          .cube(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"), grouping_id().as("__gid"))
          .filter(col("__gid").isin(1, 2, 3)) // (lang), (source), ()
          .select(coalesce(col("lang"), lit("(all)")).as("lang"),
            coalesce(col("source"), lit("(all)")).as("source"),
            col("n_docs"))
          .orderBy(col("lang"), col("source"))
    },

    // Event-time sessionization (8h gap): session end = last event + gap,
    // end-exclusive — the oracle's island detection uses >= gap for a new
    // session to match session_window's exclusivity.
    QuerySpec.sql("sessionize_events",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |flags AS (
        |  SELECT user_id, us,
        |         CASE WHEN lag(us) OVER w IS NULL
        |                OR us - lag(us) OVER w >= 480::BIGINT * 60 * 1000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sess AS (
        |  SELECT user_id, us,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags)
        |SELECT CAST(user_id AS VARCHAR) AS location,
        |       min(us) AS session_start_us,
        |       max(us) + 480::BIGINT * 60 * 1000000 AS session_end_us,
        |       count(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY location, session_start_us""") {
      (s, dir) =>
        Sequences.sessionize(obs(s, dir), gapMinutes = 480)
          .orderBy(col("location"), col("session_start_us"))
    },

    // Ordered funnel view→click→purchase: per-user earliest strictly-
    // increasing chain, reach counts + integer-exact conversion lag. The
    // oracle replays the same per-step min-aggregate/join chain.
    QuerySpec.sql("q_funnel_steps",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.us) AS t, min(s1.t) AS t_prev
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.us > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.us) AS t, min(s2.t) AS t_prev
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
        |       CAST(count(*) AS BIGINT) AS n_users, CAST(0 AS BIGINT) AS total_lag_us FROM s1
        |UNION ALL
        |SELECT 2, 'click', count(*), CAST(coalesce(sum(t - t_prev), 0) AS BIGINT) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', count(*), CAST(coalesce(sum(t - t_prev), 0) AS BIGINT) FROM s3
        |ORDER BY step""") {
      (s, dir) =>
        EventAnalytics.funnel(Tables.events(s, dir), Seq("view", "click", "purchase"))
          .orderBy(col("step"))
    },

    // Weekly cohort retention: first-seen-day cohorts × active-period
    // offsets, all integer epoch-day arithmetic.
    QuerySpec.sql("q_retention_cohorts",
      """WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS dd FROM events),
        |c AS (SELECT user_id, min(dd) AS cohort_dd FROM a GROUP BY user_id),
        |x AS (SELECT DISTINCT c.cohort_dd, (a.dd - c.cohort_dd) // 7 AS offset_periods,
        |                      a.user_id
        |      FROM a JOIN c ON a.user_id = c.user_id)
        |SELECT strftime(make_timestamp(cohort_dd * 86400000000), '%Y-%m-%d') AS cohort_day,
        |       offset_periods, CAST(count(*) AS BIGINT) AS n_users
        |FROM x GROUP BY cohort_dd, offset_periods
        |ORDER BY cohort_day, offset_periods""") {
      (s, dir) =>
        EventAnalytics.retentionCohorts(Tables.events(s, dir), bucketDays = 7)
          .orderBy(col("cohort_day"), col("offset_periods"))
    },

    // Per-type least-squares drift: exact int64 moment sums, one IEEE
    // division for the slope (deterministic on identical operands).
    QuerySpec.sql("q_trend_per_type",
      """WITH a AS (SELECT min(epoch_us(ts)) AS min_us FROM events),
        |e AS (SELECT event_type AS code,
        |             (epoch_us(ts) - a.min_us) // 3600000000 AS x,
        |             CAST(floor(value * 100) AS BIGINT) AS y
        |      FROM events CROSS JOIN a),
        |s AS (SELECT code, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(x * y) AS BIGINT) AS sxy,
        |             CAST(sum(x * x) AS BIGINT) AS sxx
        |      FROM e GROUP BY 1)
        |SELECT code, n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
        |       CAST(n * sxy - sx * sy AS DOUBLE)
        |         / CAST(nullif(n * sxx - sx * sx, 0) AS DOUBLE)
        |         AS slope_cents_per_hour
        |FROM s ORDER BY code""") {
      (s, dir) =>
        EventAnalytics.linearTrend(Tables.events(s, dir))
          .orderBy(col("code"))
    },

    // Generated calendar spine × daily counts: the gaps-included daily
    // series (a LEFT join against a `sequence`-generated relation — days
    // with zero events still appear). The spine is O(days), driver-free.
    QuerySpec.sql("q_calendar_daily",
      """WITH b AS (SELECT epoch_us(min(ts)) // 86400000000 AS d0,
        |                  epoch_us(max(ts)) // 86400000000 AS d1 FROM events),
        |spine AS (SELECT unnest(range(d0, d1 + 1)) AS dd FROM b),
        |act AS (SELECT epoch_us(ts) // 86400000000 AS dd,
        |               CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1)
        |SELECT strftime(make_timestamp(dd * 86400000000), '%Y-%m-%d') AS day,
        |       coalesce(n, 0) AS n_events
        |FROM spine LEFT JOIN act USING (dd)
        |ORDER BY day""") {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val b = ev.agg(expr("min(unix_micros(ts)) div 86400000000").as("d0"),
          expr("max(unix_micros(ts)) div 86400000000").as("d1"))
        val spine = b.select(explode(sequence(col("d0"), col("d1"))).as("dd"))
        val act = ev.groupBy(expr("unix_micros(ts) div 86400000000").as("dd"))
          .agg(count(lit(1)).as("n"))
        spine.join(act, Seq("dd"), "left")
          .select(date_format(timestamp_micros(col("dd") * 86400000000L), "yyyy-MM-dd")
              .as("day"),
            coalesce(col("n"), lit(0L)).as("n_events"))
          .orderBy(col("day"))
      }
    },

    // Robust per-type outlier flags: |value − median| > 3·MAD on floored
    // µ-quantized longs — the int64 compare can't flip on a float boundary.
    QuerySpec.sql("q_mad_anomalies",
      """WITH e AS (SELECT event_type AS code, event_id, value,
        |                  CAST(floor(value * 1000000) AS BIGINT) AS qv FROM events),
        |med AS (SELECT code, CAST(floor(quantile_cont(qv, 0.5)) AS BIGINT) AS med_q
        |        FROM e GROUP BY 1),
        |dev AS (SELECT e.code, event_id, value, abs(qv - med_q) AS dev_q
        |        FROM e JOIN med USING (code)),
        |mad AS (SELECT code, CAST(floor(quantile_cont(dev_q, 0.5)) AS BIGINT) AS mad_q
        |        FROM dev GROUP BY 1)
        |SELECT d.code, event_id, value, dev_q, mad_q
        |FROM dev d JOIN mad USING (code)
        |WHERE dev_q > 3 * mad_q
        |ORDER BY code, event_id""") {
      (s, dir) =>
        EventAnalytics.madAnomalies(Tables.events(s, dir), k = 3)
          .orderBy(col("code"), col("event_id"))
    },

    // SCD2 dimension build from the event stream: collapse per-user value
    // runs into [valid_from, valid_to) history rows with an is_current flag
    // — the CDC-merge shape that feeds as-of joins.
    QuerySpec.sql("q_scd2_user_value",
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, value,
        |         lag(value) OVER w AS prev
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |chg AS (SELECT * FROM o WHERE prev IS DISTINCT FROM value)
        |SELECT user_id, us AS valid_from_us,
        |       lead(us) OVER w2 AS valid_to_us, value,
        |       lead(us) OVER w2 IS NULL AS is_current
        |FROM chg WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)
        |ORDER BY user_id, valid_from_us""") {
      (s, dir) =>
        EventAnalytics.scd2(Tables.events(s, dir))
          .orderBy(col("user_id"), col("valid_from_us"))
    },

    // Pivot: documents per (source × language) — wide conditional counts.
    // CUBE: all four grouping sets of (lang, source) in one pass — Spark
    // plans this as a single Expand + hash aggregate, not four scans.
    // NULL grouping cells are labeled so the oracle's NULL semantics can't
    // collide with real values.
    QuerySpec.sql("q_cube_lang_source",
      """SELECT coalesce(lang, '<all>') AS lang,
        |       coalesce(source, '<all>') AS source,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS chars_total
        |FROM documents GROUP BY CUBE (lang, source)
        |ORDER BY lang, source""") {
      (s, dir) =>
        Tables.documents(s, dir)
          .cube(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_total"))
          .select(coalesce(col("lang"), lit("<all>")).as("lang"),
            coalesce(col("source"), lit("<all>")).as("source"),
            col("n_docs"), col("chars_total"))
          .orderBy(col("lang"), col("source"))
    },

    QuerySpec.sql("q_pivot_lang_source",
      """SELECT source,
        |       count(*) FILTER (lang = 'de') AS de,
        |       count(*) FILTER (lang = 'en') AS en,
        |       count(*) FILTER (lang = 'es') AS es,
        |       count(*) FILTER (lang = 'fr') AS fr,
        |       count(*) FILTER (lang = 'zh') AS zh
        |FROM documents GROUP BY source ORDER BY source""") {
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        Tables.documents(s, dir)
          .groupBy(col("source"))
          .pivot("lang", langs)
          .count()
          .na.fill(0, langs)
          .orderBy(col("source"))
      }
    },

    // S2→S3→S4: stream the events parquet through an AvailableNow
    // Structured Streaming query into a memory sink, then run the hourly
    // rollup on the materialized table — one plan-builder, two sources.
    QuerySpec.sql("stream_hourly_rollup",
      """WITH agg AS (
        |  SELECT CAST(hour(ts) AS INT) AS hour,
        |         epoch_us(min(ts)) AS window_start_us,
        |         epoch_us(max(ts)) AS window_end_us,
        |         count(*) AS n_rows, round(avg(value), 4) AS avg_value
        |  FROM events GROUP BY 1),
        |modal AS (
        |  SELECT hour, event_type AS modal_code, cnt AS modal_count FROM (
        |    SELECT CAST(hour(ts) AS INT) AS hour, event_type, count(*) AS cnt,
        |           row_number() OVER (PARTITION BY CAST(hour(ts) AS INT)
        |             ORDER BY count(*) DESC, event_type ASC) AS rn
        |    FROM events GROUP BY 1, 2) WHERE rn = 1)
        |SELECT agg.*, modal.modal_code, modal.modal_count
        |FROM agg LEFT JOIN modal USING (hour) ORDER BY hour""") {
      (s, dir) => {
        val streamed = Parse.eventsAsObservations(Ingest.materializeEvents(s, dir))
        Rollup.hourly(streamed, avgCols = Seq("value"))
          .select(col("hour"),
            unix_micros(col("window_start")).as("window_start_us"),
            unix_micros(col("window_end")).as("window_end_us"),
            col("n_rows"), round(col("avg_value"), 4).as("avg_value"),
            col("modal_code"), col("modal_count"))
      }
    },

    // Streaming twin with a REGISTRY surface (stream ≡ batch driver-
    // checked, not just spec-pinned): the doc_id%10 batch sliver arrives
    // as a file STREAM and is screened per micro-batch against the static
    // exact-fingerprint store of the other 90% via StreamOps.
    // screenStreamExact — a stateless stream-static join, so the
    // materialized stream output hash-matches dd_incremental_exact's
    // batch oracle VERBATIM for any micro-batch split.
    QuerySpec.sql("stream_dedup_screen",
      """WITH store AS (SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
        |                      min(doc_id) AS canonical_id
        |               FROM documents WHERE doc_id % 10 <> 0 GROUP BY 1),
        |b AS (SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |      FROM documents WHERE doc_id % 10 = 0)
        |SELECT b.doc_id, CAST(s.canonical_id IS NULL AS BIGINT) AS is_new,
        |       s.canonical_id
        |FROM b LEFT JOIN store s USING (fp) ORDER BY doc_id""") {
      (s, dir) => {
        val store = graft.ops.Dedup.exact(
          Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // layout-robust source (Ingest.streamParquet): dir+glob silently
          // streams ZERO rows if the corpus is ever laid out as a
          // directory-style parquet (part files under documents.parquet/),
          // and a bare file path fails the source's basePath check — the
          // helper picks per layout, the require below catches any third
          val stream = Ingest.streamParquet(s, dir, "documents")
            .filter(col("doc_id") % 10 === 0)
          // fixed queryName: reruns in one session REPLACE the memory-sink
          // temp view instead of accumulating one table per invocation
          // (sequential by driver contract; the name is free once the
          // previous AvailableNow query terminated)
          val name = "graft_stream_dedup_screen"
          val q = graft.streaming.StreamOps.screenStreamExact(stream, store)
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val out = s.table(name).orderBy(col("doc_id"))
          // guard the silent-empty-stream failure mode — but empty in ⇒
          // empty out must hold (EmptyCorpusSpec), so the guard fires only
          // when a BATCH read of the same sliver finds rows the stream
          // missed (a source-layout mismatch, not a legitimately empty
          // corpus); the batch probe runs only on the empty-stream path
          require(!out.isEmpty ||
            Tables.documents(s, dir).filter(col("doc_id") % 10 === 0).isEmpty,
            s"stream_dedup_screen streamed zero rows from $dir but the batch read has rows")
          out
        } finally store.unpersist()
      }
    },

    // STATEFUL streaming twin with a registry surface (r15 next-item 5):
    // scd2Stream — flatMapGroupsWithState, per-user open-interval state
    // crossing micro-batches — materialized via AvailableNow and hash-
    // matched against the BATCH scd2 oracle's closed spans. A stronger
    // stream ≡ batch claim than stream_dedup_screen's stateless screen:
    // the emitted rows depend on state sequencing, not just per-row joins.
    // The stream emits CLOSED intervals only (append mode cannot retract
    // an open row), so the oracle is q_scd2_user_value's spans with
    // valid_to_us set — the open row lives in state, observable on the
    // next change, exactly the operator's documented contract.
    QuerySpec.sql("stream_scd2",
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, value,
        |         lag(value) OVER w AS prev
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |chg AS (SELECT * FROM o WHERE prev IS DISTINCT FROM value),
        |spans AS (
        |  SELECT user_id, us AS valid_from_us, lead(us) OVER w2 AS valid_to_us, value
        |  FROM chg WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, valid_from_us, valid_to_us, value FROM spans
        |WHERE valid_to_us IS NOT NULL
        |ORDER BY user_id, valid_from_us""") {
      (s, dir) => {
        import s.implicits._
        // same nanosAsLong/normalize lineage handling as Tables.events,
        // applied to the STREAMING frame (normalizeEventTs is schema-driven)
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val typed = Tables.normalizeEventTs(Ingest.streamParquet(s, dir, "events"))
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .as[graft.streaming.StreamOps.ScdEvent]
        val name = "graft_stream_scd2"
        val q = graft.streaming.StreamOps.scd2Stream(typed).toDF()
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val out = s.table(name)
          .select(col("user_id"), col("valid_from_us"), col("valid_to_us"),
            col("value"))
          .orderBy(col("user_id"), col("valid_from_us"))
        // same conditional guard as stream_dedup_screen: zero streamed spans
        // is only a failure if the BATCH operator produces closed spans on
        // the same input (empty corpus / all-constant users are legitimate)
        require(!out.isEmpty ||
          EventAnalytics.scd2(Tables.events(s, dir))
            .filter(col("valid_to_us").isNotNull).isEmpty,
          s"stream_scd2 streamed zero rows from $dir but the batch scd2 has closed spans")
        out
      }
    },

    // Second STATEFUL streaming twin with a registry surface: funnelStream
    // (flatMapGroupsWithState, per-user earliest-chain prefix state) — the
    // materialized append-only hits AGGREGATE to the batch funnel exactly
    // (the operator's equality contract, spec-pinned in StreamOpsSpec and
    // here driver-checked against q_funnel_steps' oracle verbatim). The
    // steps spine left-join keeps zero-reacher steps in the output, the
    // batch aggregate's shape on any input including an empty corpus.
    QuerySpec.sql("stream_funnel",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.us) AS t, min(s1.t) AS t_prev
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.us > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.us) AS t, min(s2.t) AS t_prev
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
        |       CAST(count(*) AS BIGINT) AS n_users, CAST(0 AS BIGINT) AS total_lag_us FROM s1
        |UNION ALL
        |SELECT 2, 'click', count(*), CAST(coalesce(sum(t - t_prev), 0) AS BIGINT) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', count(*), CAST(coalesce(sum(t - t_prev), 0) AS BIGINT) FROM s3
        |ORDER BY step""") {
      (s, dir) => {
        import s.implicits._
        val steps = Seq("view", "click", "purchase")
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val typed = Tables.normalizeEventTs(Ingest.streamParquet(s, dir, "events"))
          .select(col("user_id"), col("event_type"), col("ts"))
          .as[graft.streaming.StreamOps.FunnelEvent]
        val name = "graft_stream_funnel"
        val q = graft.streaming.StreamOps.funnelStream(typed, steps).toDF()
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val agg = s.table(name).groupBy(col("step"))
          .agg(count(lit(1)).as("n_users"), sum(col("lag_us")).as("lag"))
        val spine = steps.zipWithIndex
          .map { case (n, i) => (i + 1L, n) }.toDF("step", "step_name")
        spine.join(agg, Seq("step"), "left")
          .select(col("step"), col("step_name"),
            coalesce(col("n_users"), lit(0L)).as("n_users"),
            coalesce(col("lag"), lit(0L)).as("total_lag_us"))
          .orderBy(col("step"))
      }
    },

    // Stateful streaming twin #3: retentionStream (flatMapGroupsWithState,
    // per-user state = cohort anchor + credited period offsets) — one
    // append-only hit per first (user, period) activity; grouping the hits
    // by (cohort, offset) reproduces the batch cohort matrix exactly, so
    // this hash-matches q_retention_cohorts' oracle verbatim.
    QuerySpec.sql("stream_retention",
      """WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS dd FROM events),
        |c AS (SELECT user_id, min(dd) AS cohort_dd FROM a GROUP BY user_id),
        |x AS (SELECT DISTINCT c.cohort_dd, (a.dd - c.cohort_dd) // 7 AS offset_periods,
        |                      a.user_id
        |      FROM a JOIN c ON a.user_id = c.user_id)
        |SELECT strftime(make_timestamp(cohort_dd * 86400000000), '%Y-%m-%d') AS cohort_day,
        |       offset_periods, CAST(count(*) AS BIGINT) AS n_users
        |FROM x GROUP BY cohort_dd, offset_periods
        |ORDER BY cohort_day, offset_periods""") {
      (s, dir) => {
        import s.implicits._
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val typed = Tables.normalizeEventTs(Ingest.streamParquet(s, dir, "events"))
          .select(col("user_id"), col("event_type"), col("ts"))
          .as[graft.streaming.StreamOps.FunnelEvent]
        val name = "graft_stream_retention"
        val q = graft.streaming.StreamOps.retentionStream(typed, bucketDays = 7)
          .toDF()
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name)
          .groupBy(col("cohort_dd"), col("offset_periods"))
          .agg(count(lit(1)).as("n_users"))
          .select(date_format(timestamp_micros(col("cohort_dd") * lit(86400000000L)),
              "yyyy-MM-dd").as("cohort_day"),
            col("offset_periods"), col("n_users"))
          .orderBy(col("cohort_day"), col("offset_periods"))
      }
    },

    // Fifth streaming surface: the STREAM-STREAM interval join itself
    // (purchases ⋈ recent same-user events) — not a state twin of a batch
    // operator but Spark's streaming join operator driver-checked. The
    // sink materializes the raw JOINED PAIRS: an inner stream-stream join
    // emits a pair the moment both sides have arrived — emission never
    // waits on the watermark (the watermark only gates STATE EVICTION,
    // which in a bounded AvailableNow replay can only drop matches that
    // would still arrive; with both sides fully present in batch 1 and
    // wm=0 during it, nothing evicts and the pair set equals the batch
    // join exactly). The aggregation to the oracle shape happens on the
    // materialized static table (the stream_funnel convention), so this
    // hash-matches q_attribution_window's oracle verbatim.
    QuerySpec.sql("stream_interval_join",
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, us AS end_us,
        |             us - 1800000000 AS start_us
        |      FROM e WHERE event_type = 'purchase')
        |SELECT purchase_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(e.cents) AS BIGINT) AS cents_total, max(e.us) AS last_us
        |FROM p JOIN e ON e.user_id = p.user_id
        |              AND e.us >= p.start_us AND e.us < p.end_us
        |GROUP BY 1 ORDER BY purchase_id""") {
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        def src() = Tables.normalizeEventTs(Ingest.streamParquet(s, dir, "events"))
        val e = src().withWatermark("ts", "1 hour")
          .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        val p = src().filter(col("event_type") === "purchase")
          .withWatermark("ts", "1 hour")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("purchase_id"))
        val joined = p.join(e,
          col("e_user") === col("p_user") &&
            col("e_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
            col("e_ts") < col("p_ts"))
        val name = "graft_stream_interval_join"
        val q = joined
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val out = s.table(name)
          .groupBy(col("purchase_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("cents")).as("cents_total"),
            max(unix_micros(col("e_ts"))).as("last_us"))
          .orderBy(col("purchase_id"))
        require(!out.isEmpty ||
          IntervalJoin.attributionWindow(Tables.events(s, dir),
            windowMinutes = 30).isEmpty,
          s"stream_interval_join streamed zero pairs from $dir but the " +
            "batch attribution join has rows")
        out
      }
    },

    // Streaming D1: latestPerKeyStateful (mapGroupsWithState, UPDATE
    // mode — one updated row per key per batch, state = ONE row per key)
    // hash-matched against the batch latest_per_key oracle verbatim
    // (µs-ordering contract aligned with the batch operator). The
    // bounded replay is one micro-batch, so the update stream holds
    // exactly one row per key — asserted, because a multi-batch split
    // would legitimately append per-batch updates (the cross-batch
    // advance semantics live in StreamOpsSpec).
    QuerySpec.sql("stream_latest_per_key",
      """SELECT CAST(user_id AS VARCHAR) AS location, event_id,
        |       event_type AS code, value, epoch_us(ts) AS event_us
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY location""") {
      (s, dir) => {
        import s.implicits._
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val typed = Tables.normalizeEventTs(Ingest.streamParquet(s, dir, "events"))
          .select(col("user_id").cast("string").as("location"),
            col("ts").as("event_timestamp"), col("event_id"),
            col("event_type").as("code"), col("value"))
          .as[graft.streaming.StreamOps.ObsState]
        val name = "graft_stream_latest"
        val q = graft.streaming.StreamOps.latestPerKeyStateful(typed).toDF()
          .writeStream.format("memory").queryName(name)
          .outputMode(graft.streaming.StreamOps.LatestOutputMode)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val t = s.table(name)
        require(t.groupBy(col("location")).count()
            .filter(col("count") > 1).isEmpty,
          "stream_latest_per_key expected a single-batch replay (one " +
            "update row per key); the source split into multiple batches")
        t.select(col("location"), col("event_id"), col("code"), col("value"),
            unix_micros(col("event_timestamp")).as("event_us"))
          .orderBy(col("location"))
      }
    },

    // Streaming EXACT dedup with watermark-bounded state
    // (dropDuplicatesWithinWatermark) — the last shipped streaming
    // operator gains its registry surface (r16 Next #2). The corpus
    // replays as TWO staged micro-batches: stage 0 the CANONICAL rows
    // (one row per fingerprint, lowest doc_id — the arrival order a
    // first crawl defines), stage 1 every intra-corpus duplicate PLUS a
    // full RE-CRAWL of the corpus (same content, fresh ids +1 M, later
    // event times). Every stage-1 row must therefore be dropped by
    // fingerprint STATE CROSSING micro-batches — none of the drops is
    // intra-batch (stage 0 is duplicate-free BY CONSTRUCTION; an
    // intra-batch duplicate's surviving row would be partition-order
    // racey and not oracle-checkable — which is why the corpus' own
    // duplicates ride in stage 1: the sf0.1 corpus actually has them).
    // The emitted set is exactly the batch [[graft.ops.Dedup.exact]]
    // survivor set (canonical = min doc_id over both generations),
    // hash-matched against dd_exact's fingerprint arithmetic verbatim.
    // Event times are synthesized deterministically from doc_id (1 s
    // per id); the 30-day delay is >> the replay span, so nothing
    // evicts mid-replay — state eviction + re-emission arithmetic
    // (expiry = first-seen event time + delay, ms domain) is measured
    // and pinned in StreamOpsSpec the way stream_sessionize pinned
    // session eviction.
    QuerySpec.sql("stream_dedup_watermark",
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
        |       min(doc_id) AS canonical_id
        |FROM documents GROUP BY fp ORDER BY fp""") {
      (s, dir) => {
        val base = 1700000000000000L // fixed µs epoch anchor
        def staged(df: org.apache.spark.sql.DataFrame, idOffset: Long) =
          df.select(
            (col("doc_id") + lit(idOffset)).as("doc_id"),
            timestamp_micros(lit(base) +
              (col("doc_id") + lit(idOffset)) * lit(1000000L))
              .as("event_timestamp"),
            col("text"))
        val ranked = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(graft.ops.TextStats.fingerprint(col("text")))
              .orderBy(col("doc_id"))))
        val canonical = staged(ranked.filter(col("__rn") === 1), 0L)
        val replays = staged(ranked.filter(col("__rn") > 1), 0L)
          .unionByName(staged(ranked, 1000000L))
        // tagged staging path + sink name (r18 verdict #1): same race
        // class the sketch folds closed in r18 — fixed paths/names would
        // collide across concurrent different-corpus executions
        val tag = stagingTag(dir)
        val in = Ingest.stageOrderedFiles(s, Seq(canonical, replays),
          s"target/stream_dedup_watermark_in_$tag")
        val name = s"graft_stream_dedup_wm_$tag"
        val q = graft.streaming.StreamOps.dedupExactStream(in, "30 days")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val out = s.table(name)
          .select(col("fp"), col("doc_id").as("canonical_id"))
          .orderBy(col("fp"))
        require(!out.isEmpty || Tables.documents(s, dir).isEmpty,
          s"stream_dedup_watermark streamed zero survivors from $dir but " +
            "the corpus has documents")
        out
      }
    },

    // Fourth streaming twin surface: WATERMARK-EVICTED session
    // windows (sessionizeStream / session_window + append mode) — unlike
    // the flatMapGroupsWithState twins above, here the EMISSION SET itself
    // is watermark semantics: a session finalizes iff its end is at or
    // below the event-time watermark. A single-file AvailableNow replay
    // emits NOTHING (the wm from batch N applies only from batch N+1), so
    // the corpus is staged as file 0 and a 1-row '~wm' driver relation as
    // file 1 (Ingest.stageOrderedFiles, maxFilesPerTrigger=1): the corpus
    // batch sets wm = max_ts(ms-truncated) − 4h, the driver batch runs
    // under it and flushes every session with end ≤ wm — all measured,
    // boundary-inclusive semantics pinned in the helper's scaladoc. The
    // oracle replays the batch gaps-and-islands CTE + EXACTLY that wm
    // arithmetic; the '~wm' key's own session (and any real session still
    // open at the final wm) stays in state, the operator's append-mode
    // contract.
    QuerySpec.sql("stream_sessionize",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |wm AS (SELECT ((max(us) // 1000) - 14400000) * 1000 AS wm_us FROM e),
        |flags AS (
        |  SELECT user_id, us,
        |         CASE WHEN lag(us) OVER w IS NULL
        |                OR us - lag(us) OVER w >= 480::BIGINT * 60 * 1000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sess AS (
        |  SELECT user_id, us,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags)
        |SELECT CAST(user_id AS VARCHAR) AS location,
        |       min(us) AS session_start_us,
        |       max(us) + 480::BIGINT * 60 * 1000000 AS session_end_us,
        |       count(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |HAVING max(us) + 480::BIGINT * 60 * 1000000 <= (SELECT wm_us FROM wm)
        |ORDER BY location, session_start_us""") {
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val ev = Tables.events(s, dir).select(
          col("user_id").cast("string").as("location"),
          col("ts").as("event_timestamp"))
        // 1-row wm driver at max event time: advances nothing (same max)
        // but forces the batch under which the corpus wm applies; the
        // isNotNull filter keeps the empty corpus a clean 2-empty-batch
        // replay instead of a null-timestamp row.
        val wmDriver = ev.agg(max(col("event_timestamp")).as("event_timestamp"))
          .filter(col("event_timestamp").isNotNull)
          .select(lit("~wm").as("location"), col("event_timestamp"))
        // tagged staging path + sink name (r18 verdict #1), as above
        val tag = stagingTag(dir)
        val in = Ingest.stageOrderedFiles(s, Seq(ev, wmDriver),
          s"target/stream_sessionize_in_$tag")
        val name = s"graft_stream_sessionize_$tag"
        val q = graft.streaming.StreamOps.sessionizeStream(in,
            gapMinutes = 480, watermarkDelay = "4 hours")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val out = s.table(name).filter(col("location") =!= "~wm")
          .select(col("location"), col("session_start_us"),
            col("session_end_us"), col("n_events"))
          .orderBy(col("location"), col("session_start_us"))
        // zero streamed sessions is only a failure if the batch operator
        // closes sessions under the same watermark on the same input
        // (1-row broadcast wm fold — the A1 anchor-max pattern, no collect)
        val wmB = Tables.events(s, dir)
          .agg((((unix_micros(max(col("ts"))).cast("long") / 1000)
            .cast("long") - lit(14400000L)) * lit(1000L)).as("wm_us"))
        val closedBatch = Sequences.sessionize(
            Tables.events(s, dir).select(
              col("user_id").cast("string").as("location"),
              col("ts").as("event_timestamp")), gapMinutes = 480)
          .crossJoin(broadcast(wmB))
          .filter(col("session_end_us") <= col("wm_us"))
        require(!out.isEmpty || closedBatch.isEmpty,
          s"stream_sessionize streamed zero rows from $dir but the batch " +
            "sessionize has watermark-closed sessions")
        out
      }
    },

    // Multimodal plumbing, oracle-checkable slice: binary payload length +
    // content checksum (proves the binary column path end-to-end).
    QuerySpec.sql("mm_binary_stats",
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes, md5(text) AS checksum
        |FROM documents ORDER BY doc_id""") {
      (s, dir) =>
        Multimodal.asMedia(Tables.documents(s, dir)).toDF()
          .select(col("doc_id"),
            length(col("payload")).cast("long").as("n_bytes"),
            md5(col("payload")).as("checksum"))
          .orderBy(col("doc_id"))
    },

    // Multimodal feature extraction (stub decoder): batched mapPartitions,
    // deterministic features, hash-checked end-to-end — the 16-bin byte
    // histogram is exploded to h0..h15 long columns (a nested array crashes
    // the checker's pandas sort) and the byte mean is pinned by its exact
    // integer numerator (sum_bytes) instead of a float. The oracle redoes
    // the byte statistics from hex(blob), two nibbles per byte.
    // The corpus payloads here are stub-format BY CONSTRUCTION (documents
    // carry UTF-8 text, not image bytes), so this query exercises decodeStub;
    // the real P6 PPM decoder + pixel-aware resize are exercised separately by
    // MultimodalSpec's golden images (see Multimodal.decodePpm).
    QuerySpec.sql("mm_features",
      ("""WITH b AS (
        |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
        |         octet_length(CAST(text AS BLOB)) AS n_bytes
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id, n_bytes,
        |         (strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, CAST(2*i AS INT), 1)) - 1 AS u
        |  FROM (SELECT doc_id, n_bytes, hx, unnest(range(1, n_bytes + 1)) AS i FROM b)),
        |agg AS (
        |  SELECT doc_id, CAST(sum(u) AS BIGINT) AS sum_bytes,
        |""" +
        (0 until 16).map(i => s"       count(*) FILTER (u // 16 = $i) AS h$i").mkString(",\n") +
        """
        |  FROM bytes GROUP BY doc_id)
        |-- LEFT JOIN from b: an empty-text doc has no per-byte rows, but the
        |-- operator still emits it with zero stats — the oracle must too.
        |SELECT b.doc_id, b.n_bytes, coalesce(agg.sum_bytes, 0) AS sum_bytes,
        |""" +
        (0 until 16).map(i => s"       coalesce(agg.h$i, 0) AS h$i").mkString(",\n") +
        """
        |FROM b LEFT JOIN agg USING (doc_id) ORDER BY doc_id""")) {
      (s, dir) =>
        Multimodal.extractFeatures(
          Multimodal.asMedia(Tables.documents(s, dir))).toDF()
          .select(Seq(col("doc_id"), col("n_bytes"), col("sum_bytes")) ++
            (0 until 16).map(i => element_at(col("histogram"), i + 1).as(s"h$i")): _*)
          .orderBy(col("doc_id"))
    },

    // Multimodal resize, oracle-checkable slice: factor-2 downscale over the
    // stub-format corpus (documents carry UTF-8 text, so the byte-stride
    // path runs: resized payload = every 2nd byte). The oracle recomputes
    // the stride from hex(blob) — per-byte count and exact integer sum pin
    // the stride semantics — and the halved metadata dims from asMedia's
    // doc_id-derived width/height. The pixel-aware ppm/pgm resample is
    // golden-tested in MultimodalSpec (decode → resample → re-emit needs
    // real image bytes, not text).
    QuerySpec.sql("mm_resize_stats",
      """WITH b AS (
        |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
        |         octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id,
        |         (strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, CAST(2*i AS INT), 1)) - 1 AS u
        |  FROM (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM b)
        |  WHERE (i - 1) % 2 = 0),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_bytes, CAST(sum(u) AS BIGINT) AS sum_bytes
        |  FROM bytes GROUP BY doc_id)
        |SELECT b.doc_id,
        |       greatest(1, (b.doc_id % 64 + 16) // 2) AS width,
        |       greatest(1, (b.doc_id % 48 + 16) // 2) AS height,
        |       coalesce(agg.n_bytes, 0) AS n_bytes,
        |       coalesce(agg.sum_bytes, 0) AS sum_bytes
        |FROM b LEFT JOIN agg USING (doc_id) ORDER BY b.doc_id""") {
      (s, dir) => {
        val resized = Multimodal.resize(
          Multimodal.asMedia(Tables.documents(s, dir)), factor = 2)
        // width/height ride on the media rows; n_bytes/sum_bytes come from
        // the feature extractor over the SAME resized dataset (stub decode
        // = identity, so they describe the resized payload exactly). The
        // join is doc_id-equi and AQE-broadcast at verify scale.
        Multimodal.extractFeatures(resized).toDF()
          .select(col("doc_id"), col("n_bytes"), col("sum_bytes"))
          .join(resized.toDF().select(col("doc_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height")), Seq("doc_id"))
          .select(col("doc_id"), col("width"), col("height"),
            col("n_bytes"), col("sum_bytes"))
          .orderBy(col("doc_id"))
      }
    },

    // Multimodal IMAGE slice through the REAL JDK ImageIO codec: each doc's
    // text bytes become gray pixels of a 1×n PNG written through the real
    // PNG encoder, decoded back through ImageIO and normalized to an RGB
    // raster, then reduced by the standard feature extractor. The oracle
    // recomputes everything from the text bytes: each byte u contributes
    // THREE raster bytes of value u (gray → R=G=B), so n_bytes = 3·n and
    // sum_bytes = 3·sum(u); empty texts encode as a single black pixel
    // (n_bytes = 3, sum 0) — a wrong color normalization, row order, or
    // roundtrip loss anywhere in encode→decode breaks the hash.
    QuerySpec.sql("mm_image_stats",
      """WITH b AS (
        |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
        |         octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id,
        |         (strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, CAST(2*i AS INT), 1)) - 1 AS u
        |  FROM (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM b)),
        |agg AS (
        |  SELECT doc_id, CAST(3 * sum(u) AS BIGINT) AS sum_bytes
        |  FROM bytes GROUP BY doc_id)
        |SELECT b.doc_id, 1::BIGINT AS width,
        |       greatest(b.n, 1)::BIGINT AS height,
        |       CAST(3 * greatest(b.n, 1) AS BIGINT) AS n_bytes,
        |       coalesce(agg.sum_bytes, 0) AS sum_bytes
        |FROM b LEFT JOIN agg USING (doc_id) ORDER BY b.doc_id""") {
      (s, dir) =>
        // width/height derive from the DECODED raster (images are 1-wide by
        // construction, so height = raster_len/3) — one pipeline branch, no
        // second encode pass or self-join; a dims-transpose bug would slip
        // the product but fails MultimodalSpec's non-square exact roundtrip.
        Multimodal.extractFeatures(
            Multimodal.asImagePng(Tables.documents(s, dir))).toDF()
          .select(col("doc_id"), lit(1L).as("width"),
            (col("n_bytes") / 3).cast("long").as("height"),
            col("n_bytes"), col("sum_bytes"))
          .orderBy(col("doc_id"))
    },

    // Multimodal AUDIO slice: each doc's text bytes become centered 16-bit
    // mono PCM samples written through the REAL wav encoder, then decoded
    // back through the REAL RIFF walker and reduced to exact integer
    // features. The oracle recomputes sample count/sum straight from the
    // text bytes ((u − 128)·256 per byte, hex-unnest pattern as in
    // mm_features) and pins the header metadata the decoder must surface —
    // so a wrong chunk walk, sign handling, or sample width breaks the hash.
    QuerySpec.sql("mm_audio_stats",
      """WITH b AS (
        |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
        |         octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id,
        |         (strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, CAST(2*i AS INT), 1)) - 1 AS u
        |  FROM (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM b)),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_samples,
        |         CAST(sum((u - 128) * 256) AS BIGINT) AS sum_samples
        |  FROM bytes GROUP BY doc_id)
        |SELECT b.doc_id, 1::BIGINT AS channels, 16000::BIGINT AS sample_rate,
        |       16::BIGINT AS bits_per_sample,
        |       coalesce(agg.n_samples, 0) AS n_samples,
        |       coalesce(agg.sum_samples, 0) AS sum_samples
        |FROM b LEFT JOIN agg USING (doc_id) ORDER BY b.doc_id""") {
      (s, dir) =>
        Multimodal.extractAudioFeatures(
          Multimodal.asAudio(Tables.documents(s, dir))).toDF()
          .orderBy(col("doc_id"))
    },

    // COMPRESSED audio through the REAL G.711 µ-law codec (r19 — the
    // exact-oracle counterpart to the MJPEG leg): each doc's text bytes
    // become centered 16-bit samples COMPRESSED 2:1 through the µ-law
    // encoder (WAV audioFormat 7), then expanded back through the RIFF
    // walk + the exact G.711 inverse. µ-law is lossy but EXACTLY
    // specified integer arithmetic, so the oracle replays the full
    // compress→expand round trip from the text bytes digit-for-digit —
    // clip, bias, exponent ladder, mantissa cut, expansion — and any
    // drift in either codec half breaks the hash.
    QuerySpec.sql("mm_mulaw_stats",
      """WITH b AS (
        |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
        |         octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id,
        |         (strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, CAST(2*i AS INT), 1)) - 1 AS u
        |  FROM (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM b)),
        |s AS (SELECT doc_id, (u - 128) * 256 AS smp FROM bytes),
        |enc AS (
        |  SELECT doc_id, smp,
        |         least(abs(smp), 32635) + 132 AS a
        |  FROM s),
        |exp AS (
        |  SELECT doc_id, smp, a,
        |         CASE WHEN a < 256 THEN 0 WHEN a < 512 THEN 1
        |              WHEN a < 1024 THEN 2 WHEN a < 2048 THEN 3
        |              WHEN a < 4096 THEN 4 WHEN a < 8192 THEN 5
        |              WHEN a < 16384 THEN 6 ELSE 7 END AS e
        |  FROM enc),
        |dec AS (
        |  SELECT doc_id,
        |         CASE WHEN smp < 0 THEN -d0 ELSE d0 END AS d
        |  FROM (SELECT doc_id, smp,
        |               (((a // (1 << (e + 3))) % 16) * 8 + 132) * (1 << e) - 132 AS d0
        |        FROM exp)),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_samples,
        |         CAST(sum(d) AS BIGINT) AS sum_samples
        |  FROM dec GROUP BY doc_id)
        |SELECT b.doc_id, 1::BIGINT AS channels, 8000::BIGINT AS sample_rate,
        |       16::BIGINT AS bits_per_sample,
        |       coalesce(agg.n_samples, 0) AS n_samples,
        |       coalesce(agg.sum_samples, 0) AS sum_samples
        |FROM b LEFT JOIN agg USING (doc_id) ORDER BY b.doc_id""") {
      (s, dir) =>
        Multimodal.extractAudioFeatures(
          Multimodal.asAudioMulaw(Tables.documents(s, dir))).toDF()
          .orderBy(col("doc_id"))
    },

    // Multimodal VIDEO slice through the REAL Y4M codec (the last
    // documented multimodal stub, closed r18): each doc's text bytes
    // become the luma planes of 4×2 mono frames (8 bytes per frame,
    // zero-padded; empty text → one zero frame) written through the
    // real YUV4MPEG2 encoder, then decoded back through the real header
    // parse + frame walk and reduced to exact integer features. The
    // oracle recomputes geometry and byte statistics straight from the
    // text bytes — so a wrong frame size, a missed FRAME marker, or a
    // padding leak breaks the hash.
    QuerySpec.sql("mm_video_stats",
      """WITH b AS (
        |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
        |         octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id,
        |         (strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, CAST(2*i AS INT), 1)) - 1 AS u
        |  FROM (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM b)),
        |agg AS (
        |  SELECT doc_id, CAST(sum(u) AS BIGINT) AS sum_bytes
        |  FROM bytes GROUP BY doc_id)
        |SELECT b.doc_id, 4::BIGINT AS width, 2::BIGINT AS height,
        |       greatest(1, (b.n + 7) // 8)::BIGINT AS n_frames,
        |       CAST(8 * greatest(1, (b.n + 7) // 8) AS BIGINT) AS n_bytes,
        |       coalesce(agg.sum_bytes, 0) AS sum_bytes
        |FROM b LEFT JOIN agg USING (doc_id) ORDER BY b.doc_id""") {
      (s, dir) =>
        Multimodal.extractVideoFeatures(
          Multimodal.asVideo(Tables.documents(s, dir))).toDF()
          .orderBy(col("doc_id"))
    },

    // Real per-frame fan-out through the Y4M codec (the judge-offered
    // mm_frame_sample surface): every container frame becomes one row
    // with its exact integer byte sum — so a missed FRAME marker, a
    // mis-framed plane, or a padding leak shifts some frame's sum and
    // breaks the hash. The oracle recomputes each 8-byte frame's sum
    // from the text bytes (frame f covers bytes 8f..8f+7, zero-padded;
    // empty text → one all-zero frame).
    QuerySpec.sql("mm_frame_sample",
      """WITH b AS (
        |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
        |         octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents),
        |frames AS (
        |  SELECT doc_id, unnest(range(0, greatest(1, (n + 7) // 8))) AS frame_idx
        |  FROM b),
        |bytes AS (
        |  SELECT doc_id, CAST((i - 1) // 8 AS BIGINT) AS frame_idx,
        |         (strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, CAST(2*i AS INT), 1)) - 1 AS u
        |  FROM (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM b)),
        |agg AS (
        |  SELECT doc_id, frame_idx, CAST(sum(u) AS BIGINT) AS sum_bytes
        |  FROM bytes GROUP BY 1, 2)
        |SELECT f.doc_id, CAST(f.frame_idx AS BIGINT) AS frame_idx,
        |       8::BIGINT AS n_bytes, coalesce(agg.sum_bytes, 0) AS sum_bytes
        |FROM frames f LEFT JOIN agg
        |  ON agg.doc_id = f.doc_id AND agg.frame_idx = f.frame_idx
        |ORDER BY f.doc_id, f.frame_idx""") {
      (s, dir) => {
        import s.implicits._
        Multimodal.videoFrames(Multimodal.asVideo(Tables.documents(s, dir)))
          .map(f => (f.doc_id, f.frame_idx.toLong,
            f.frame_bytes.length.toLong,
            f.frame_bytes.map(b => (b & 0xff).toLong).sum))
          .toDF("doc_id", "frame_idx", "n_bytes", "sum_bytes")
          .orderBy(col("doc_id"), col("frame_idx"))
      }
    },

    // First COMPRESSED-video leg (r18 verdict Next #4): each doc's text
    // bytes become 8×8 gray frames REAL-JPEG-encoded and wrapped in the
    // REAL MJPEG-in-AVI container, then decoded back through the RIFF
    // walk + the ImageIO JPEG reader. JPEG is LOSSY, so the oracle pins
    // what survives the codec — container geometry (avih header CROSS-
    // CHECKED against every decoded frame's own dimensions), frame
    // count, decoded raster byte count — while decoded CONTENT is gated
    // in-query: per doc, the decoded mean byte must sit within 16 of
    // the source mean (JPEG preserves each 8×8 block's DC to within a
    // quantization step), against the EXACT source sum from the stub
    // feature path. A broken chunk walk, a skipped frame, a mis-sized
    // decode, or garbage pixels all fail — hash or gate.
    QuerySpec.sql("mm_mjpeg_stats",
      """WITH b AS (
        |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents)
        |SELECT doc_id, 8::BIGINT AS width, 8::BIGINT AS height,
        |       greatest(1, (n + 63) // 64)::BIGINT AS n_frames,
        |       CAST(192 * greatest(1, (n + 63) // 64) AS BIGINT) AS n_raster_bytes
        |FROM b ORDER BY doc_id""") {
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // materialized ONCE (review r19): the content gate below is an
        // action, and without this the returned select would re-run the
        // whole JPEG-encode → container → decode lineage a second time —
        // doubling the dominant (real codec) cost of the query
        val feats = graft.ops.Checkpoints.materialized(
          Multimodal.extractMjpegFeatures(
            Multimodal.asVideoMjpeg(docs)).toDF())
        // exact source byte sums ride the stub feature path (payload =
        // the raw utf-8 bytes), no second decode of anything lossy
        val src = Multimodal.extractFeatures(Multimodal.asMedia(docs))
          .toDF().select(col("doc_id"), col("sum_bytes").as("src_sum"))
        val bad = feats.join(src, Seq("doc_id"))
          .filter(abs(
            col("sum_bytes").cast("double") / col("n_raster_bytes") -
              col("src_sum").cast("double") / (col("n_frames") * lit(64.0)))
            > 16.0)
        require(bad.isEmpty,
          "mm_mjpeg_stats: decoded MJPEG content deviates from the source " +
            "beyond the JPEG DC quantization budget")
        feats.select(col("doc_id"), col("width"), col("height"),
            col("n_frames"), col("n_raster_bytes"))
          .orderBy(col("doc_id"))
      }
    },

    // Mergeable KMV (bottom-k) distinct sketch per language — the
    // oracle-checkable stand-in for approx_count_distinct (HLL internals
    // are engine-specific; bottom-k md5 arithmetic replays exactly).
    // k=32 puts every sf0.01 language on the ESTIMATOR path while small
    // groups (sf0.001, empty) exercise the exact-count branch.
    QuerySpec.sql("sketch_kmv_distinct",
      """WITH h AS (
        |  SELECT DISTINCT lang,
        |         list_reduce(list_transform(string_split(substr(md5(text), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) AS hk
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT lang, hk, row_number() OVER (PARTITION BY lang ORDER BY hk) AS rn FROM h),
        |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept, max(hk) AS kth_hash
        |      FROM b WHERE rn <= 32 GROUP BY lang)
        |SELECT lang, n_kept, kth_hash,
        |       CASE WHEN n_kept < 32 THEN n_kept
        |            ELSE (31 * 4294967296) // kth_hash END AS est_distinct
        |FROM g ORDER BY lang""") {
      (s, dir) =>
        Sketches.kmvDistinct(Tables.documents(s, dir), "lang", "text", k = 32)
          .orderBy(col("lang"))
    },

    // KMV set algebra: pairwise audience overlap between event types from
    // MERGED sketches alone (union re-cut to bottom-k, MinHash-style
    // common fraction in integer ppm) — the union-at-query-time shape a
    // 100 TB pipeline uses to answer any pairwise overlap from per-part
    // sketches without re-touching the corpus.
    QuerySpec.sql("sketch_kmv_overlap",
      """WITH h AS (
        |  SELECT DISTINCT event_type AS part,
        |         list_reduce(list_transform(string_split(substr(md5(user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) AS hk
        |  FROM events WHERE user_id IS NOT NULL),
        |b AS (SELECT part, hk, row_number() OVER (PARTITION BY part ORDER BY hk) AS rn FROM h),
        |sk AS (SELECT part, hk FROM b WHERE rn <= 64),
        |pr AS (SELECT a.part AS part_a, b2.part AS part_b
        |       FROM (SELECT DISTINCT part FROM sk) a
        |       JOIN (SELECT DISTINCT part FROM sk) b2 ON a.part < b2.part),
        |m AS (SELECT pr.part_a, pr.part_b, s.hk,
        |             max(CASE WHEN s.part = pr.part_a THEN 1 ELSE 0 END) AS in_a,
        |             max(CASE WHEN s.part = pr.part_b THEN 1 ELSE 0 END) AS in_b
        |      FROM pr JOIN sk s ON s.part IN (pr.part_a, pr.part_b)
        |      GROUP BY 1, 2, 3),
        |mb AS (SELECT *, row_number() OVER (PARTITION BY part_a, part_b ORDER BY hk) AS rn FROM m),
        |g AS (SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_kept,
        |             max(hk) AS kth_hash,
        |             CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        |             CAST(sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
        |             CAST(sum(CASE WHEN in_b = 1 AND in_a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b
        |      FROM mb WHERE rn <= 64 GROUP BY 1, 2),
        |e AS (SELECT part_a, part_b, n_kept, n_common, n_only_a, n_only_b,
        |             CASE WHEN n_kept < 64 THEN n_kept
        |                  ELSE (63 * 4294967296) // kth_hash END AS est_union,
        |             (1000000 * n_common) // n_kept AS est_jaccard_ppm
        |      FROM g)
        |SELECT part_a, part_b, n_kept, n_common, n_only_a, n_only_b,
        |       est_union, est_jaccard_ppm,
        |       (est_jaccard_ppm * est_union) // 1000000 AS est_intersection,
        |       (n_only_a * est_union) // n_kept AS est_only_a,
        |       (n_only_b * est_union) // n_kept AS est_only_b
        |FROM e ORDER BY part_a, part_b""") {
      (s, dir) =>
        Sketches.kmvOverlap(Tables.events(s, dir), "event_type", "user_id",
            k = 64)
          .orderBy(col("part_a"), col("part_b"))
    },

    // TRAILING-WINDOW set algebra (r18 verdict Next #6 — the one sliding
    // form the matrix lacked): pairwise audience overlap between event
    // types over the trailing 7 days, for every day both types are
    // active, from DAILY KMV sketches alone — kmvSlidingDistinct's
    // date-anchored range frame composed with kmvOverlap's merged-sample
    // estimator. The oracle replays daily bottom-k, the windowed
    // distinct-union re-cut (≡ the window's direct sketch by
    // mergeability), the same-day pair join, and the integer ppm set
    // algebra digit-for-digit — a frame shift, a lost re-cut, or a pair
    // row on a one-sided day all hash-fail.
    QuerySpec.sql("sketch_kmv_overlap_sliding",
      """WITH h AS (
        |  SELECT DISTINCT event_type AS part, CAST(ts AS DATE) AS day,
        |         list_reduce(list_transform(string_split(substr(md5(user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) AS hk
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |b AS (SELECT part, day, hk, row_number() OVER (PARTITION BY part, day ORDER BY hk) AS rn FROM h),
        |dsk AS (SELECT part, day, hk FROM b WHERE rn <= 64),
        |days AS (SELECT DISTINCT part, day FROM dsk),
        |wu AS (SELECT DISTINCT dy.part, dy.day, s.hk
        |       FROM days dy JOIN dsk s ON s.part = dy.part
        |         AND s.day >= dy.day - 6 AND s.day <= dy.day),
        |wb AS (SELECT part, day, hk, row_number() OVER (PARTITION BY part, day ORDER BY hk) AS rn FROM wu),
        |wsk AS (SELECT part, day, hk FROM wb WHERE rn <= 64),
        |pr AS (SELECT a.part AS part_a, b2.part AS part_b, a.day
        |       FROM days a JOIN days b2 ON a.day = b2.day AND a.part < b2.part),
        |m AS (SELECT pr.part_a, pr.part_b, pr.day, s.hk,
        |             max(CASE WHEN s.part = pr.part_a THEN 1 ELSE 0 END) AS in_a,
        |             max(CASE WHEN s.part = pr.part_b THEN 1 ELSE 0 END) AS in_b
        |      FROM pr JOIN wsk s ON s.day = pr.day AND s.part IN (pr.part_a, pr.part_b)
        |      GROUP BY 1, 2, 3, 4),
        |mb AS (SELECT *, row_number() OVER (PARTITION BY part_a, part_b, day ORDER BY hk) AS rn FROM m),
        |g AS (SELECT part_a, part_b, day, CAST(count(*) AS BIGINT) AS n_kept,
        |             max(hk) AS kth_hash,
        |             CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        |             CAST(sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
        |             CAST(sum(CASE WHEN in_b = 1 AND in_a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b
        |      FROM mb WHERE rn <= 64 GROUP BY 1, 2, 3),
        |e AS (SELECT part_a, part_b, day, n_kept, n_common, n_only_a, n_only_b,
        |             CASE WHEN n_kept < 64 THEN n_kept
        |                  ELSE (63 * 4294967296) // kth_hash END AS est_union,
        |             (1000000 * n_common) // n_kept AS est_jaccard_ppm
        |      FROM g)
        |SELECT part_a, part_b, strftime(day, '%Y-%m-%d') AS day, n_kept,
        |       n_common, n_only_a, n_only_b, est_union, est_jaccard_ppm,
        |       (est_jaccard_ppm * est_union) // 1000000 AS est_intersection,
        |       (n_only_a * est_union) // n_kept AS est_only_a,
        |       (n_only_b * est_union) // n_kept AS est_only_b
        |FROM e ORDER BY part_a, part_b, day""") {
      (s, dir) =>
        Sketches.kmvSlidingOverlap(Tables.events(s, dir), "event_type",
            "ts", "user_id", k = 64, windowDays = 7)
          .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
          .orderBy(col("part_a"), col("part_b"), col("day"))
    },

    // Stored-sketch UPDATE (the KMV deployment form, r16 Next #5): the
    // corpus splits into "yesterday's store" (even event_ids) and
    // "tonight's batch" (odd), each side sketched independently, then
    // merged with kmvMergeAgainst — bottom-k(bottom-k ∪ bottom-k). The
    // oracle computes the sketch of the WHOLE corpus directly: by the
    // mergeability identity (SketchesSpec) the two are EQUAL, so the
    // driver gate checks the identity itself end-to-end — a merge bug
    // (multiset union, a dropped group, a mis-cut) hash-fails here.
    QuerySpec.sql("sketch_kmv_merge",
      """WITH h AS (
        |  SELECT DISTINCT event_type AS part,
        |         list_reduce(list_transform(string_split(substr(md5(user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) AS hk
        |  FROM events WHERE user_id IS NOT NULL),
        |b AS (SELECT part, hk, row_number() OVER (PARTITION BY part ORDER BY hk) AS rn FROM h),
        |g AS (SELECT part, CAST(count(*) AS BIGINT) AS n_kept, max(hk) AS kth_hash
        |      FROM b WHERE rn <= 64 GROUP BY part)
        |SELECT part, n_kept, kth_hash,
        |       CASE WHEN n_kept < 64 THEN n_kept
        |            ELSE (63 * 4294967296) // kth_hash END AS est_distinct
        |FROM g ORDER BY part""") {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val store = Sketches.kmvSketch(
          ev.filter(col("event_id") % 2 === 0), "event_type", "user_id",
          k = 64)
        val batch = Sketches.kmvSketch(
          ev.filter(col("event_id") % 2 === 1), "event_type", "user_id",
          k = 64)
        Sketches.kmvMergeAgainst(store, batch, "event_type", k = 64)
          .select(col("event_type").as("part"), col("n_kept"),
            col("kth_hash"), col("est_distinct"))
          .orderBy(col("part"))
      }
    },

    // STREAMING stored-sketch maintenance — the KMV deployment loop run
    // as a stream (StreamOps.kmvUpdateStream): events replay as FOUR
    // staged micro-batches (event_id mod 4), each batch sketched and
    // folded into a versioned parquet store — three CROSS-BATCH merges
    // with no Spark state (the store IS the state, durable and queryable
    // mid-stream). The oracle is the WHOLE-CORPUS sketch: by the
    // mergeability identity the four-way fold equals it exactly, so the
    // driver gate hash-checks the streaming store maintenance end-to-end
    // the way sketch_kmv_merge checks a single merge. Idempotence under
    // batch retry is the sketch algebra's (set semantics), pinned in
    // SketchesSpec.
    QuerySpec.sql("stream_kmv_update",
      """WITH h AS (
        |  SELECT DISTINCT event_type AS part,
        |         list_reduce(list_transform(string_split(substr(md5(user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) AS hk
        |  FROM events WHERE user_id IS NOT NULL),
        |b AS (SELECT part, hk, row_number() OVER (PARTITION BY part ORDER BY hk) AS rn FROM h),
        |g AS (SELECT part, CAST(count(*) AS BIGINT) AS n_kept, max(hk) AS kth_hash
        |      FROM b WHERE rn <= 64 GROUP BY part)
        |SELECT part, n_kept, kth_hash,
        |       CASE WHEN n_kept < 64 THEN n_kept
        |            ELSE (63 * 4294967296) // kth_hash END AS est_distinct
        |FROM g ORDER BY part""") {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val stages = (0 to 3).map(r =>
          ev.filter(col("event_id") % 4 === r)
            .select(col("event_type"), col("user_id")))
        // staging/store paths derive from the corpus dir (ADVICE r17):
        // two concurrent executions against different corpora no longer
        // race on shared target/ directories
        val tag = stagingTag(dir)
        val in = Ingest.stageOrderedFiles(s, stages,
          s"target/stream_kmv_update_in_$tag")
        // cold replay: fresh store (a warm start resuming a prior store is
        // the helper's contract — SketchesSpec pins it; the registry
        // surface pins the cold four-batch fold against the corpus)
        val storeDir = s"target/stream_kmv_update_store_$tag"
        Ingest.deleteRecursively(storeDir)
        val q = graft.streaming.StreamOps.kmvUpdateStream(in,
            "event_type", "user_id", k = 64, storeDir)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val out = Sketches.kmvEstimates(
            graft.streaming.StreamOps.kmvStoreRead(s, storeDir), k = 64)
          .select(col("event_type").as("part"), col("n_kept"),
            col("kth_hash"), col("est_distinct"))
          .orderBy(col("part"))
        // guard predicate = staged eligibility (ADVICE r18, the
        // stream_cms_update fix applied here too): staged batches drop
        // null event_ids, the sketch drops null user_ids
        require(!out.isEmpty ||
          ev.filter(col("event_id").isNotNull && col("user_id").isNotNull)
            .isEmpty,
          s"stream_kmv_update streamed zero sketch groups from $dir but " +
            "the corpus has eligible events")
        out
      }
    },

    // STORE RETENTION under the fold (r18 verdict Next #2): the same
    // four-batch KMV fold as stream_kmv_update, but with compaction
    // enabled (keepLast = 1) — after every committed fold the store
    // deletes all but the newest committed version, so the four-version
    // accumulation a retention-less deployment leaks (288 full
    // copies/day at a 5-minute trigger) collapses to ONE live version.
    // The oracle is stream_kmv_update's whole-corpus sketch VERBATIM: a
    // compacted store must read exactly like the uncompacted one (the
    // read path only ever resolves the latest committed version), so a
    // compaction bug that deletes the live version, resurrects a stale
    // one, or races the fold hash-fails here. The query also pins the
    // retention effect itself: exactly one committed version remains.
    QuerySpec.sql("stream_kmv_compacted",
      """WITH h AS (
        |  SELECT DISTINCT event_type AS part,
        |         list_reduce(list_transform(string_split(substr(md5(user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) AS hk
        |  FROM events WHERE user_id IS NOT NULL),
        |b AS (SELECT part, hk, row_number() OVER (PARTITION BY part ORDER BY hk) AS rn FROM h),
        |g AS (SELECT part, CAST(count(*) AS BIGINT) AS n_kept, max(hk) AS kth_hash
        |      FROM b WHERE rn <= 64 GROUP BY part)
        |SELECT part, n_kept, kth_hash,
        |       CASE WHEN n_kept < 64 THEN n_kept
        |            ELSE (63 * 4294967296) // kth_hash END AS est_distinct
        |FROM g ORDER BY part""") {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val stages = (0 to 3).map(r =>
          ev.filter(col("event_id") % 4 === r)
            .select(col("event_type"), col("user_id")))
        val tag = stagingTag(dir)
        val in = Ingest.stageOrderedFiles(s, stages,
          s"target/stream_kmv_compacted_in_$tag")
        val storeDir = s"target/stream_kmv_compacted_store_$tag"
        Ingest.deleteRecursively(storeDir)
        val q = graft.streaming.StreamOps.kmvUpdateStream(in,
            "event_type", "user_id", k = 64, storeDir, compactKeepLast = 1)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // retention pin: four folds ran, but only the newest committed
        // version survives (local listing is fine — scratch is target/)
        val live = Option(new java.io.File(storeDir).listFiles).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.matches("v\\d+") &&
            new java.io.File(f, "_SUCCESS").isFile)
        require(live.size <= 1,
          s"stream_kmv_compacted left ${live.size} committed versions " +
            s"under $storeDir; compaction (keepLast=1) should leave 1")
        val out = Sketches.kmvEstimates(
            graft.streaming.StreamOps.kmvStoreRead(s, storeDir), k = 64)
          .select(col("event_type").as("part"), col("n_kept"),
            col("kth_hash"), col("est_distinct"))
          .orderBy(col("part"))
        require(!out.isEmpty ||
          ev.filter(col("event_id").isNotNull && col("user_id").isNotNull)
            .isEmpty,
          s"stream_kmv_compacted streamed zero sketch groups from $dir " +
            "but the corpus has eligible events")
        out
      }
    },

    // Mergeable QUANTILE sketch (the second sketch pillar): per-event-type
    // value quantiles from a deterministic bottom-k-by-hash row sample,
    // PACKED (hash, cents) words so the whole KMV store/merge algebra
    // applies verbatim. Like sketch_kmv_merge, the Spark side builds TWO
    // half-corpus sketches (event_id parity) and MERGES them, while the
    // oracle computes the whole-corpus sketch directly — the driver gate
    // checks the mergeability identity end-to-end, then the integer
    // order-statistic arithmetic picks p25/p50/p75/p99.
    QuerySpec.sql("sketch_kmv_quantiles",
      """WITH h AS (
        |  SELECT DISTINCT event_type AS part,
        |         (hk % 2147483648) * 4294967296
        |           + (CAST(floor(value * 100) AS BIGINT) + 2147483648) AS pk
        |  FROM (SELECT event_type, value,
        |               list_reduce(list_transform(string_split(substr(md5(event_id::VARCHAR), 1, 8), ''),
        |                 c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) AS hk
        |        FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL)),
        |b AS (SELECT part, pk, row_number() OVER (PARTITION BY part ORDER BY pk) AS rn FROM h),
        |sk AS (SELECT part, pk % 4294967296 - 2147483648 AS v FROM b WHERE rn <= 128),
        |o AS (SELECT part, v, row_number() OVER (PARTITION BY part ORDER BY v) AS vr,
        |             count(*) OVER (PARTITION BY part) AS n FROM sk)
        |SELECT part, CAST(max(n) AS BIGINT) AS n_kept,
        |       CAST(max(CASE WHEN vr = (25 * (n - 1)) // 100 + 1 THEN v END) AS BIGINT) AS p25_cents,
        |       CAST(max(CASE WHEN vr = (50 * (n - 1)) // 100 + 1 THEN v END) AS BIGINT) AS p50_cents,
        |       CAST(max(CASE WHEN vr = (75 * (n - 1)) // 100 + 1 THEN v END) AS BIGINT) AS p75_cents,
        |       CAST(max(CASE WHEN vr = (99 * (n - 1)) // 100 + 1 THEN v END) AS BIGINT) AS p99_cents
        |FROM o GROUP BY part ORDER BY part""") {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val cents = floor(col("value") * lit(100)).cast("long")
        def half(rem: Int) = Sketches.kmvQuantileSketch(
          ev.filter(col("event_id") % 2 === rem), "event_type", "event_id",
          cents, k = 128)
        Sketches.kmvQuantiles(
            Sketches.kmvMergeSketches(half(0), half(1), "event_type",
              k = 128),
            "event_type", Seq(25, 50, 75, 99))
          .select(col("event_type").as("part"), col("n_kept"),
            col("p25_cents"), col("p50_cents"), col("p75_cents"),
            col("p99_cents"))
          .orderBy(col("part"))
      }
    },

    // Count-Min FREQUENCY sketch (the third sketch pillar: distinct /
    // quantiles / frequency): per-event-type user-frequency estimates
    // from d·w integer cells — seeded md5 hashing, so both engines
    // replay the sketch bit-for-bit. Like the rest of the family, the
    // Spark side builds TWO half-corpus sketches (event_id parity) and
    // MERGES them (elementwise cell sum — EXACTLY the whole-corpus
    // sketch, counts commute), while the oracle computes the whole
    // sketch directly and reads the same probe set: the driver gate
    // checks the merge identity AND the min-over-d point reads
    // end-to-end.
    QuerySpec.sql("sketch_cms_freq",
      """WITH d4 AS (SELECT unnest([0, 1, 2, 3]) AS d),
        |cells AS (
        |  SELECT event_type AS part, d,
        |         list_reduce(list_transform(string_split(substr(md5('cms' || d::VARCHAR || '|' || user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) % 1024 AS bucket,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events CROSS JOIN d4 WHERE user_id IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |probes AS (SELECT DISTINCT event_type AS part, user_id
        |           FROM events WHERE user_id IS NOT NULL AND user_id % 10 = 0),
        |pc AS (
        |  SELECT p.part, p.user_id, d,
        |         list_reduce(list_transform(string_split(substr(md5('cms' || d::VARCHAR || '|' || p.user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) % 1024 AS bucket
        |  FROM probes p CROSS JOIN d4)
        |SELECT pc.part, pc.user_id, min(coalesce(c.cnt, 0)) AS est_cnt
        |FROM pc LEFT JOIN cells c
        |  ON c.part = pc.part AND c.d = pc.d AND c.bucket = pc.bucket
        |GROUP BY 1, 2 ORDER BY pc.part, pc.user_id""") {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        def half(rem: Int) = Sketches.cmsSketch(
          ev.filter(col("event_id") % 2 === rem), "event_type", "user_id",
          depth = 4, width = 1024)
        val store = Sketches.cmsMerge(half(0), half(1), "event_type")
        val probes = ev
          .filter(col("user_id").isNotNull && col("user_id") % 10 === 0)
          .select(col("event_type"), col("user_id")).distinct()
        Sketches.cmsEstimate(store, probes, "event_type", "user_id",
            depth = 4, width = 1024)
          .select(col("event_type").as("part"), col("user_id"),
            col("est_cnt"))
          .orderBy(col("part"), col("user_id"))
      }
    },

    // Trailing-7-day distinct users per (event_type, day) from DAILY
    // sketches — the canonical query the per-(partition, day) KMV store
    // exists to answer: the corpus is touched ONCE (the daily (group,
    // day, hash) DISTINCT); every trailing window is a range-frame
    // union over sketch rows re-cut to bottom-k, which by the
    // mergeability identity EQUALS the sketch of the window's raw key
    // set — the oracle computes that directly, so the driver gate
    // checks the whole daily-store → sliding-union path end-to-end.
    // Epoch-day range frame: calendar gaps window correctly.
    QuerySpec.sql("sketch_kmv_sliding",
      """WITH h AS (
        |  SELECT DISTINCT event_type AS part, CAST(ts AS DATE) AS day,
        |         list_reduce(list_transform(string_split(substr(md5(user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) AS hk
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |days AS (SELECT DISTINCT part, day FROM h),
        |j AS (SELECT DISTINCT d.part, d.day, h.hk
        |      FROM days d JOIN h ON h.part = d.part
        |        AND h.day >= d.day - 6 AND h.day <= d.day),
        |b AS (SELECT part, day, hk,
        |             row_number() OVER (PARTITION BY part, day ORDER BY hk) AS rn
        |      FROM j),
        |g AS (SELECT part, day, CAST(count(*) AS BIGINT) AS n_kept, max(hk) AS kth_hash
        |      FROM b WHERE rn <= 32 GROUP BY 1, 2)
        |SELECT part, strftime(day, '%Y-%m-%d') AS day, n_kept, kth_hash,
        |       CASE WHEN n_kept < 32 THEN n_kept
        |            ELSE (31 * 4294967296) // kth_hash END AS est_distinct
        |FROM g ORDER BY part, day""") {
      (s, dir) =>
        Sketches.kmvSlidingDistinct(Tables.events(s, dir), "event_type",
            "ts", "user_id", k = 32, windowDays = 7)
          .select(col("event_type").as("part"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_kept"), col("kth_hash"), col("est_distinct"))
          .orderBy(col("part"), col("day"))
    },

    // STREAMING frequency-store maintenance — the CMS configuration of
    // the generic versioned-store fold (StreamOps.cmsUpdateStream via
    // sketchUpdateStream, the seam both sketch families configure):
    // events replay as FOUR staged micro-batches, each batch's cell
    // counts SUMMED into the stored cells — and because the CMS merge
    // is an elementwise sum, the folded store equals the whole-corpus
    // sketch EXACTLY for any micro-batch split (versioning by batchId
    // is the retry commit unit — counts don't absorb like sets, so the
    // store version IS the batch). Same probe reads and whole-corpus
    // oracle as sketch_cms_freq: the driver gate hash-checks the
    // streaming fold end-to-end.
    QuerySpec.sql("stream_cms_update",
      """WITH d4 AS (SELECT unnest([0, 1, 2, 3]) AS d),
        |cells AS (
        |  SELECT event_type AS part, d,
        |         list_reduce(list_transform(string_split(substr(md5('cms' || d::VARCHAR || '|' || user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) % 1024 AS bucket,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events CROSS JOIN d4 WHERE user_id IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |probes AS (SELECT DISTINCT event_type AS part, user_id
        |           FROM events WHERE user_id IS NOT NULL AND user_id % 10 = 0),
        |pc AS (
        |  SELECT p.part, p.user_id, d,
        |         list_reduce(list_transform(string_split(substr(md5('cms' || d::VARCHAR || '|' || p.user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) % 1024 AS bucket
        |  FROM probes p CROSS JOIN d4)
        |SELECT pc.part, pc.user_id, min(coalesce(c.cnt, 0)) AS est_cnt
        |FROM pc LEFT JOIN cells c
        |  ON c.part = pc.part AND c.d = pc.d AND c.bucket = pc.bucket
        |GROUP BY 1, 2 ORDER BY pc.part, pc.user_id""") {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val stages = (0 to 3).map(r =>
          ev.filter(col("event_id") % 4 === r)
            .select(col("event_type"), col("user_id")))
        val tag = stagingTag(dir)
        val in = Ingest.stageOrderedFiles(s, stages,
          s"target/stream_cms_update_in_$tag")
        val storeDir = s"target/stream_cms_update_store_$tag"
        Ingest.deleteRecursively(storeDir)
        val q = graft.streaming.StreamOps.cmsUpdateStream(in,
            "event_type", "user_id", depth = 4, width = 1024, storeDir)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val store = graft.streaming.StreamOps.sketchStoreRead(s, storeDir)
        val probes = ev
          .filter(col("user_id").isNotNull && col("user_id") % 10 === 0)
          .select(col("event_type"), col("user_id")).distinct()
        // plumbing guard on the STORE, not the probe read (review r18:
        // cmsEstimate emits one 0-filled row PER PROBE, so a guard on
        // `out` can never fire): the folded store has >= 1 cell row iff
        // any batch carried a non-null key — an empty store under a
        // non-empty corpus means the staged replay streamed nothing
        // guard predicate = staged ELIGIBILITY (ADVICE r18): the staged
        // batches drop null event_ids too (event_id % 4 === r), so a
        // corpus whose keyed events all have null event_id legitimately
        // streams nothing — the guard must not fire there
        require(!store.isEmpty ||
          ev.filter(col("user_id").isNotNull && col("event_id").isNotNull)
            .isEmpty,
          s"stream_cms_update folded an empty store from $dir but the " +
            "corpus has keyed events")
        Sketches.cmsEstimate(store, probes, "event_type",
            "user_id", depth = 4, width = 1024)
          .select(col("event_type").as("part"), col("user_id"),
            col("est_cnt"))
          .orderBy(col("part"), col("user_id"))
      }
    },

    // STREAMING quantile-store maintenance (r17 verdict "what's wrong"
    // #3): the QUANTILE configuration of the generic versioned-store
    // fold — the quantile sketch packs (hash, cents) into one 64-bit
    // word precisely so it rides the SAME store shape and
    // kmvMergeSketches fold as the KMV family, and this surface makes
    // that claim driver-checked instead of spec-argued: events replay
    // as FOUR staged micro-batches folded into a versioned store, and
    // the refreshed store's order statistics are hash-checked against
    // the whole-corpus sketch (the mergeability identity — same oracle
    // as sketch_kmv_quantiles). If the seam ever diverges, this fails.
    QuerySpec.sql("stream_quantile_update",
      """WITH h AS (
        |  SELECT DISTINCT event_type AS part,
        |         (hk % 2147483648) * 4294967296
        |           + (CAST(floor(value * 100) AS BIGINT) + 2147483648) AS pk
        |  FROM (SELECT event_type, value,
        |               list_reduce(list_transform(string_split(substr(md5(event_id::VARCHAR), 1, 8), ''),
        |                 c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) AS hk
        |        FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL)),
        |b AS (SELECT part, pk, row_number() OVER (PARTITION BY part ORDER BY pk) AS rn FROM h),
        |sk AS (SELECT part, pk % 4294967296 - 2147483648 AS v FROM b WHERE rn <= 128),
        |o AS (SELECT part, v, row_number() OVER (PARTITION BY part ORDER BY v) AS vr,
        |             count(*) OVER (PARTITION BY part) AS n FROM sk)
        |SELECT part, CAST(max(n) AS BIGINT) AS n_kept,
        |       CAST(max(CASE WHEN vr = (25 * (n - 1)) // 100 + 1 THEN v END) AS BIGINT) AS p25_cents,
        |       CAST(max(CASE WHEN vr = (50 * (n - 1)) // 100 + 1 THEN v END) AS BIGINT) AS p50_cents,
        |       CAST(max(CASE WHEN vr = (75 * (n - 1)) // 100 + 1 THEN v END) AS BIGINT) AS p75_cents,
        |       CAST(max(CASE WHEN vr = (99 * (n - 1)) // 100 + 1 THEN v END) AS BIGINT) AS p99_cents
        |FROM o GROUP BY part ORDER BY part""") {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val stages = (0 to 3).map(r =>
          ev.filter(col("event_id") % 4 === r)
            .select(col("event_type"), col("event_id"), col("value")))
        val tag = stagingTag(dir)
        val in = Ingest.stageOrderedFiles(s, stages,
          s"target/stream_quantile_update_in_$tag")
        val storeDir = s"target/stream_quantile_update_store_$tag"
        Ingest.deleteRecursively(storeDir)
        val cents = floor(col("value") * lit(100)).cast("long")
        val q = graft.streaming.StreamOps.sketchUpdateStream(in, storeDir,
            b => Sketches.kmvQuantileSketch(b, "event_type", "event_id",
              cents, k = 128),
            (store, b) =>
              Sketches.kmvMergeSketches(store, b, "event_type", k = 128))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val out = Sketches.kmvQuantiles(
            graft.streaming.StreamOps.sketchStoreRead(s, storeDir),
            "event_type", Seq(25, 50, 75, 99))
          .select(col("event_type").as("part"), col("n_kept"),
            col("p25_cents"), col("p50_cents"), col("p75_cents"),
            col("p99_cents"))
          .orderBy(col("part"))
        require(!out.isEmpty ||
          ev.filter(col("event_id").isNotNull && col("value").isNotNull).isEmpty,
          s"stream_quantile_update streamed zero sketch groups from $dir " +
            "but the corpus has quantile-eligible events")
        out
      }
    },

    // SLIDING-WINDOW CMS (r17 Next #4) — the frequency twin of
    // sketch_kmv_sliding: trailing-7-day per-user frequency estimates
    // per (event_type, day) from DAILY Count-Min cells. Counts commute,
    // so the windowed cell sum IS the window's sketch EXACTLY — the
    // oracle recomputes daily cells, the calendar-true trailing-day
    // join, and the min-over-d probe reads with the same seeded md5
    // arithmetic, hash-checking the whole daily-store → sliding-union →
    // read path end-to-end (gap days covered: January has none, but the
    // date-anchored join is spec-pinned against a gapped corpus).
    QuerySpec.sql("sketch_cms_sliding",
      """WITH d3 AS (SELECT unnest([0, 1, 2]) AS d),
        |cells AS (
        |  SELECT event_type AS part, CAST(ts AS DATE) AS day, d,
        |         list_reduce(list_transform(string_split(substr(md5('cms' || d::VARCHAR || '|' || user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) % 256 AS bucket,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events CROSS JOIN d3
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2, 3, 4),
        |days AS (SELECT DISTINCT part, day FROM cells),
        |win AS (SELECT dy.part, dy.day, c.d, c.bucket,
        |               CAST(sum(c.cnt) AS BIGINT) AS cnt
        |        FROM days dy JOIN cells c ON c.part = dy.part
        |          AND c.day >= dy.day - 6 AND c.day <= dy.day
        |        GROUP BY 1, 2, 3, 4),
        |probes AS (SELECT DISTINCT event_type AS part, user_id
        |           FROM events WHERE user_id IS NOT NULL AND user_id % 20 = 0),
        |pc AS (
        |  SELECT p.part, p.user_id, d,
        |         list_reduce(list_transform(string_split(substr(md5('cms' || d::VARCHAR || '|' || p.user_id::VARCHAR), 1, 8), ''),
        |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) % 256 AS bucket
        |  FROM probes p CROSS JOIN d3),
        |grid AS (SELECT dy.part, dy.day, pc.user_id, pc.d, pc.bucket
        |         FROM days dy JOIN pc ON pc.part = dy.part)
        |SELECT g.part, strftime(g.day, '%Y-%m-%d') AS day, g.user_id,
        |       min(coalesce(w.cnt, 0)) AS est_cnt
        |FROM grid g LEFT JOIN win w
        |  ON w.part = g.part AND w.day = g.day AND w.d = g.d AND w.bucket = g.bucket
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""") {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val store = Sketches.cmsSlidingSketch(ev, "event_type", "ts",
          "user_id", depth = 3, width = 256, windowDays = 7)
        val probes = ev
          .filter(col("user_id").isNotNull && col("user_id") % 20 === 0)
          .select(col("event_type"), col("user_id")).distinct()
        Sketches.cmsSlidingEstimate(store, probes, "event_type", "user_id",
            depth = 3, width = 256)
          .select(col("event_type").as("part"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("user_id"), col("est_cnt"))
          .orderBy(col("part"), col("day"), col("user_id"))
      }
    },

    // SLIDING QUANTILES — the fourth and last trailing-window form,
    // completing the sliding matrix (distinct / frequency / heavy
    // hitters / QUANTILES): trailing-7-day p25/p50/p75 of value-cents
    // per (event_type, day) from DAILY quantile sketches. The packed
    // (hash, cents) words make this kmvSlidingDistinct VERBATIM — one
    // corpus-shaped daily DISTINCT, epoch-day range-frame unions re-cut
    // to bottom-k (≡ the window's direct sketch by the mergeability
    // identity, which the oracle computes), then per-(group, day)
    // integer order statistics.
    QuerySpec.sql("sketch_quantiles_sliding",
      """WITH h AS (
        |  SELECT DISTINCT event_type AS part, CAST(ts AS DATE) AS day,
        |         (hk % 2147483648) * 4294967296
        |           + (CAST(floor(value * 100) AS BIGINT) + 2147483648) AS pk
        |  FROM (SELECT event_type, ts, value,
        |               list_reduce(list_transform(string_split(substr(md5(event_id::VARCHAR), 1, 8), ''),
        |                 c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x, y) -> x * 16 + y) AS hk
        |        FROM events
        |        WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL)),
        |days AS (SELECT DISTINCT part, day FROM h),
        |j AS (SELECT DISTINCT d.part, d.day, h.pk
        |      FROM days d JOIN h ON h.part = d.part
        |        AND h.day >= d.day - 6 AND h.day <= d.day),
        |b AS (SELECT part, day, pk,
        |             row_number() OVER (PARTITION BY part, day ORDER BY pk) AS rn
        |      FROM j),
        |sk AS (SELECT part, day, pk % 4294967296 - 2147483648 AS v
        |       FROM b WHERE rn <= 64),
        |o AS (SELECT part, day, v,
        |             row_number() OVER (PARTITION BY part, day ORDER BY v) AS vr,
        |             count(*) OVER (PARTITION BY part, day) AS n FROM sk)
        |SELECT part, strftime(day, '%Y-%m-%d') AS day,
        |       CAST(max(n) AS BIGINT) AS n_kept,
        |       CAST(max(CASE WHEN vr = (25 * (n - 1)) // 100 + 1 THEN v END) AS BIGINT) AS p25_cents,
        |       CAST(max(CASE WHEN vr = (50 * (n - 1)) // 100 + 1 THEN v END) AS BIGINT) AS p50_cents,
        |       CAST(max(CASE WHEN vr = (75 * (n - 1)) // 100 + 1 THEN v END) AS BIGINT) AS p75_cents
        |FROM o GROUP BY 1, 2 ORDER BY 1, 2""") {
      (s, dir) =>
        Sketches.kmvSlidingQuantiles(Tables.events(s, dir), "event_type",
            "ts", "event_id", floor(col("value") * lit(100)).cast("long"),
            k = 64, windowDays = 7, Seq(25, 50, 75))
          .select(col("event_type").as("part"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_kept"), col("p25_cents"), col("p50_cents"),
            col("p75_cents"))
          .orderBy(col("part"), col("day"))
    },

    // STREAMING heavy-hitters store maintenance — the MG configuration
    // of the generic versioned-store fold, completing the family:
    // every mergeable pillar (KMV / quantiles / CMS / MG) now has its
    // streaming maintenance loop driver-checked. Like CMS, the MG merge
    // is not retry-absorbing (summed estimates would double), so the
    // version IS the batchId. UNLIKE the other folds, the sequential
    // fold s0⊕s1⊕s2⊕s3 is NOT a whole-corpus identity (MG merges lose
    // information) — so the oracle replays the EXACT four-stage fold:
    // per-batch prune, then three sum-then-re-prune stages with the
    // error budget accumulating (Σ batch prune depths + Σ merge prune
    // depths), digit-for-digit including both bounds.
    QuerySpec.sql("stream_topk_update",
      """WITH base AS (
        |  SELECT event_type AS part, event_id % 4 AS b,
        |         CAST(floor(value / 10) AS BIGINT) AS vb
        |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
        |c AS (SELECT b, part, vb, CAST(count(*) AS BIGINT) AS cnt
        |      FROM base GROUP BY 1, 2, 3),
        |r AS (SELECT b, part, cnt,
        |             row_number() OVER (PARTITION BY b, part ORDER BY cnt DESC) AS rn
        |      FROM c),
        |d AS (SELECT b, part, coalesce(max(CASE WHEN rn = 17 THEN cnt END), 0) AS d
        |      FROM r GROUP BY 1, 2),
        |s AS (SELECT c.b, c.part, c.vb, c.cnt - d.d AS est
        |      FROM c JOIN d ON c.b = d.b AND c.part = d.part
        |      WHERE c.cnt > d.d),
        |u1 AS (SELECT part, vb, CAST(sum(est) AS BIGINT) AS cnt
        |       FROM s WHERE b IN (0, 1) GROUP BY 1, 2),
        |r1 AS (SELECT part, cnt, row_number() OVER (PARTITION BY part ORDER BY cnt DESC) AS rn FROM u1),
        |dm1 AS (SELECT part, coalesce(max(CASE WHEN rn = 17 THEN cnt END), 0) AS d FROM r1 GROUP BY 1),
        |m1 AS (SELECT u1.part, u1.vb, u1.cnt - dm1.d AS est
        |       FROM u1 JOIN dm1 ON u1.part = dm1.part WHERE u1.cnt > dm1.d),
        |u2 AS (SELECT part, vb, CAST(sum(est) AS BIGINT) AS cnt FROM (
        |         SELECT part, vb, est FROM m1
        |         UNION ALL SELECT part, vb, est FROM s WHERE b = 2
        |       ) GROUP BY 1, 2),
        |r2 AS (SELECT part, cnt, row_number() OVER (PARTITION BY part ORDER BY cnt DESC) AS rn FROM u2),
        |dm2 AS (SELECT part, coalesce(max(CASE WHEN rn = 17 THEN cnt END), 0) AS d FROM r2 GROUP BY 1),
        |m2 AS (SELECT u2.part, u2.vb, u2.cnt - dm2.d AS est
        |       FROM u2 JOIN dm2 ON u2.part = dm2.part WHERE u2.cnt > dm2.d),
        |u3 AS (SELECT part, vb, CAST(sum(est) AS BIGINT) AS cnt FROM (
        |         SELECT part, vb, est FROM m2
        |         UNION ALL SELECT part, vb, est FROM s WHERE b = 3
        |       ) GROUP BY 1, 2),
        |r3 AS (SELECT part, cnt, row_number() OVER (PARTITION BY part ORDER BY cnt DESC) AS rn FROM u3),
        |dm3 AS (SELECT part, coalesce(max(CASE WHEN rn = 17 THEN cnt END), 0) AS d FROM r3 GROUP BY 1),
        |m3 AS (SELECT u3.part, u3.vb, u3.cnt - dm3.d AS est
        |       FROM u3 JOIN dm3 ON u3.part = dm3.part WHERE u3.cnt > dm3.d),
        |errs AS (
        |  SELECT p.part,
        |         coalesce(bd.s, 0) + coalesce(e1.d, 0) + coalesce(e2.d, 0)
        |           + coalesce(e3.d, 0) AS err
        |  FROM (SELECT DISTINCT part FROM c) p
        |  LEFT JOIN (SELECT part, CAST(sum(d) AS BIGINT) AS s FROM d GROUP BY 1) bd
        |    ON bd.part = p.part
        |  LEFT JOIN dm1 e1 ON e1.part = p.part
        |  LEFT JOIN dm2 e2 ON e2.part = p.part
        |  LEFT JOIN dm3 e3 ON e3.part = p.part)
        |SELECT m3.part, CAST(rank AS BIGINT) AS rank,
        |       CAST(vb AS VARCHAR) AS key, est AS est_cnt,
        |       est + errs.err AS ub_cnt
        |FROM (SELECT *, row_number() OVER (PARTITION BY part
        |              ORDER BY est DESC, CAST(vb AS VARCHAR)) AS rank
        |      FROM m3) m3
        |JOIN errs ON errs.part = m3.part
        |WHERE rank <= 8 ORDER BY m3.part, rank""") {
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("vbucket", floor(col("value") / 10).cast("long"))
        val stages = (0 to 3).map(r =>
          ev.filter(col("event_id") % 4 === r)
            .select(col("event_type"), col("vbucket")))
        val tag = stagingTag(dir)
        val in = Ingest.stageOrderedFiles(s, stages,
          s"target/stream_topk_update_in_$tag")
        val storeDir = s"target/stream_topk_update_store_$tag"
        Ingest.deleteRecursively(storeDir)
        val q = graft.streaming.StreamOps.sketchUpdateStream(in, storeDir,
            b => Sketches.mgSummary(b, "event_type", "vbucket", k = 16),
            (store, b) => Sketches.mgMerge(store, b, "event_type", k = 16),
            versionByBatchId = true)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val store = graft.streaming.StreamOps.sketchStoreRead(s, storeDir)
        // plumbing guard on the STORE (review r18): mgTopK is
        // legitimately empty when every group's counters prune away
        // (the tie-saturation regime — the oracle is empty too), but
        // the store ALWAYS keeps one (group, err, counters) row per
        // group the stream saw, so an empty store under a non-empty
        // corpus means the staged replay streamed nothing
        require(!store.isEmpty ||
          ev.filter(col("value").isNotNull && col("event_id").isNotNull).isEmpty,
          s"stream_topk_update folded an empty store from $dir but the " +
            "corpus has eligible events")
        Sketches.mgTopK(store, "event_type", kOut = 8)
          .select(col("event_type").as("part"), col("rank"), col("key"),
            col("est_cnt"), col("ub_cnt"))
          .orderBy(col("part"), col("rank"))
      }
    },

    // CMS-REFINED heavy hitters (the r17 Next #1 refinement note): the
    // two frequency pillars composed — Misra-Gries finds WHICH keys
    // are frequent per event type (candidate tracking, lower bound
    // est + upper bound est+err), then the Count-Min store refines
    // each candidate's upper bound to least(mg_ub, cms_est): both are
    // upper bounds (CMS is overestimate-only), so their min is a
    // strictly tighter one, with the MG lower bound untouched —
    // est ≤ true ≤ ub_refined. The key is the VALUE-DECADE bucket
    // (floor(value/10) — exponentially decaying frequencies, so real
    // heavy hitters exist and SURVIVE corpus replication, unlike the
    // near-uniform user_id whose top ties saturate the prune at 100×).
    // The oracle replays both sketches and the min composition
    // digit-for-digit.
    QuerySpec.sql("sketch_topk_refined",
      """WITH c AS (
        |  SELECT event_type AS part,
        |         CAST(floor(value / 10) AS BIGINT) AS vb,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT part, cnt,
        |             row_number() OVER (PARTITION BY part ORDER BY cnt DESC) AS rn
        |      FROM c),
        |d AS (SELECT part, coalesce(max(CASE WHEN rn = 17 THEN cnt END), 0) AS d
        |      FROM r GROUP BY 1),
        |f AS (SELECT c.part, c.vb, c.cnt - d.d AS est, d.d AS err
        |      FROM c JOIN d ON c.part = d.part WHERE c.cnt > d.d),
        |top AS (SELECT part, vb, est, err, rank
        |        FROM (SELECT *, row_number() OVER (PARTITION BY part
        |                      ORDER BY est DESC, CAST(vb AS VARCHAR)) AS rank
        |              FROM f)
        |        WHERE rank <= 8),
        |d4 AS (SELECT unnest([0, 1, 2, 3]) AS dd),
        |cells AS (
        |  SELECT event_type AS part, dd,
        |         list_reduce(list_transform(string_split(substr(md5('cms' || dd::VARCHAR || '|' || CAST(CAST(floor(value / 10) AS BIGINT) AS VARCHAR)), 1, 8), ''),
        |           ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)), (x, y) -> x * 16 + y) % 1024 AS bucket,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events CROSS JOIN d4 WHERE value IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |pc AS (
        |  SELECT t.part, t.vb, dd,
        |         list_reduce(list_transform(string_split(substr(md5('cms' || dd::VARCHAR || '|' || CAST(t.vb AS VARCHAR)), 1, 8), ''),
        |           ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)), (x, y) -> x * 16 + y) % 1024 AS bucket
        |  FROM top t CROSS JOIN d4),
        |cms AS (SELECT pc.part, pc.vb, min(coalesce(cl.cnt, 0)) AS cms_cnt
        |        FROM pc LEFT JOIN cells cl
        |          ON cl.part = pc.part AND cl.dd = pc.dd AND cl.bucket = pc.bucket
        |        GROUP BY 1, 2)
        |SELECT t.part, CAST(t.rank AS BIGINT) AS rank,
        |       CAST(t.vb AS VARCHAR) AS key, t.est AS est_cnt,
        |       t.est + t.err AS ub_cnt, cms.cms_cnt,
        |       least(t.est + t.err, cms.cms_cnt) AS ub_refined
        |FROM top t JOIN cms ON cms.part = t.part AND cms.vb = t.vb
        |ORDER BY t.part, t.rank""") {
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("vbucket", floor(col("value") / 10).cast("long"))
        val top = Sketches.mgTopK(
          Sketches.mgSummary(ev, "event_type", "vbucket", k = 16),
          "event_type", kOut = 8)
        val store = Sketches.cmsSketch(ev, "event_type", "vbucket",
          depth = 4, width = 1024)
        val cms = Sketches.cmsEstimate(store,
            top.select(col("event_type"), col("key")),
            "event_type", "key", depth = 4, width = 1024)
          .withColumnRenamed("est_cnt", "cms_cnt")
        top.join(cms, Seq("event_type", "key"))
          .select(col("event_type").as("part"), col("rank"), col("key"),
            col("est_cnt"), col("ub_cnt"), col("cms_cnt"),
            least(col("ub_cnt"), col("cms_cnt")).as("ub_refined"))
          .orderBy(col("part"), col("rank"))
      }
    },

    // TRENDING KEYS — windowed heavy hitters (the r17 Next #1 + #4
    // pairing): trailing-7-day top-5 VALUE-DECADE buckets per
    // (event_type, day) from DAILY Misra-Gries summaries (buckets decay
    // exponentially, so daily heavy hitters are real and survive corpus
    // replication — the same key choice as sketch_topk_refined). The N-way MG merge is order-free
    // (sum all stored daily estimates, prune ONCE by the (k+1)-th
    // largest), so each day's window is one aggregation over ≤ 7·k
    // summary rows — never the corpus. The oracle replays daily
    // counts → daily prune → date-anchored window sums (+ summed daily
    // errs) → merge prune → rank, digit-for-digit including both
    // bounds; a wrong prune depth, frame shift, or lost daily error
    // budget all hash-fail.
    QuerySpec.sql("sketch_topk_sliding",
      """WITH c AS (
        |  SELECT event_type AS part, CAST(ts AS DATE) AS day,
        |         CAST(floor(value / 10) AS BIGINT) AS vb,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT part, day, cnt,
        |             row_number() OVER (PARTITION BY part, day ORDER BY cnt DESC) AS rn
        |      FROM c),
        |d AS (SELECT part, day,
        |             coalesce(max(CASE WHEN rn = 17 THEN cnt END), 0) AS d
        |      FROM r GROUP BY 1, 2),
        |s AS (SELECT c.part, c.day, c.vb, c.cnt - d.d AS est
        |      FROM c JOIN d ON c.part = d.part AND c.day = d.day
        |      WHERE c.cnt > d.d),
        |days AS (SELECT DISTINCT part, day FROM d),
        |wk AS (SELECT dy.part, dy.day, s.vb,
        |              CAST(sum(s.est) AS BIGINT) AS cnt
        |       FROM days dy JOIN s ON s.part = dy.part
        |         AND s.day >= dy.day - 6 AND s.day <= dy.day
        |       GROUP BY 1, 2, 3),
        |we AS (SELECT dy.part, dy.day, CAST(sum(d.d) AS BIGINT) AS errs
        |       FROM days dy JOIN d ON d.part = dy.part
        |         AND d.day >= dy.day - 6 AND d.day <= dy.day
        |       GROUP BY 1, 2),
        |r2 AS (SELECT part, day, cnt,
        |              row_number() OVER (PARTITION BY part, day ORDER BY cnt DESC) AS rn
        |       FROM wk),
        |d2 AS (SELECT part, day,
        |              coalesce(max(CASE WHEN rn = 17 THEN cnt END), 0) AS d
        |       FROM r2 GROUP BY 1, 2),
        |f AS (SELECT wk.part, wk.day, wk.vb, wk.cnt - d2.d AS est,
        |             we.errs + d2.d AS err
        |      FROM wk JOIN d2 ON wk.part = d2.part AND wk.day = d2.day
        |      JOIN we ON wk.part = we.part AND wk.day = we.day
        |      WHERE wk.cnt > d2.d)
        |SELECT part, strftime(day, '%Y-%m-%d') AS day,
        |       CAST(rank AS BIGINT) AS rank,
        |       CAST(vb AS VARCHAR) AS key,
        |       est AS est_cnt, est + err AS ub_cnt
        |-- tie-break on the STRING key: the summary stores keys as
        |-- strings, so Spark ranks "10" < "2" — the oracle must too
        |FROM (SELECT *, row_number() OVER (PARTITION BY part, day
        |                ORDER BY est DESC, CAST(vb AS VARCHAR)) AS rank
        |      FROM f)
        |WHERE rank <= 5 ORDER BY part, day, rank""") {
      (s, dir) =>
        Sketches.mgSlidingTopK(
            Tables.events(s, dir)
              .withColumn("vbucket", floor(col("value") / 10).cast("long")),
            "event_type", "ts", "vbucket", k = 16, windowDays = 7, kOut = 5)
          .select(col("event_type").as("part"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("rank"), col("key"), col("est_cnt"), col("ub_cnt"))
          .orderBy(col("part"), col("day"), col("rank"))
    },

    // HEAVY HITTERS (the fourth mergeable summary, r17 Next #1): top
    // frequent tokens per language from MERGED Misra-Gries summaries —
    // the one canonical store question CMS cannot answer ("which keys
    // are frequent" needs candidate tracking; cmsEstimate's probes are
    // an input). The corpus splits by doc_id parity, each half gets the
    // ORDER-FREE MG summary (exact counts pruned by the (k+1)-th largest
    // — a pure function of the multiset, so DuckDB replays it exactly),
    // and the halves merge with the Agarwal sum-then-re-prune. The
    // oracle replays the whole split → summarize → merge → rank path
    // digit-for-digit: est (lower bound) and est+err (upper bound) are
    // both hash-checked, so a wrong prune depth, a dropped one-sided
    // group, or a lost error budget all fail here. Zipf-ish token
    // frequencies make the candidates real heavy hitters.
    QuerySpec.sql("sketch_topk_heavy",
      """WITH t AS (
        |  SELECT doc_id % 2 AS half, lang,
        |         unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |c AS (SELECT half, lang, tok, CAST(count(*) AS BIGINT) AS cnt
        |      FROM t WHERE tok <> '' GROUP BY 1, 2, 3),
        |r AS (SELECT half, lang, cnt,
        |             row_number() OVER (PARTITION BY half, lang ORDER BY cnt DESC) AS rn
        |      FROM c),
        |d AS (SELECT half, lang,
        |             coalesce(max(CASE WHEN rn = 13 THEN cnt END), 0) AS d
        |      FROM r GROUP BY 1, 2),
        |s AS (SELECT c.half, c.lang, c.tok, c.cnt - d.d AS est
        |      FROM c JOIN d ON c.half = d.half AND c.lang = d.lang
        |      WHERE c.cnt > d.d),
        |m AS (SELECT lang, tok, CAST(sum(est) AS BIGINT) AS cnt
        |      FROM s GROUP BY 1, 2),
        |r2 AS (SELECT lang, cnt,
        |              row_number() OVER (PARTITION BY lang ORDER BY cnt DESC) AS rn
        |       FROM m),
        |d2 AS (SELECT lang, coalesce(max(CASE WHEN rn = 13 THEN cnt END), 0) AS d
        |       FROM r2 GROUP BY 1),
        |e AS (SELECT lang, CAST(sum(d) AS BIGINT) AS errs FROM d GROUP BY 1),
        |f AS (SELECT m.lang, m.tok, m.cnt - d2.d AS est, e.errs + d2.d AS err
        |      FROM m JOIN d2 USING (lang) JOIN e USING (lang)
        |      WHERE m.cnt > d2.d)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, tok AS token,
        |       est AS est_cnt, est + err AS ub_cnt
        |FROM (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY est DESC, tok) AS rank
        |      FROM f)
        |WHERE rank <= 8 ORDER BY lang, rank""") {
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .filter(col("text").isNotNull && col("lang").isNotNull)
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
        def half(rem: Int) = Sketches.mgSummary(
          toks.filter(col("doc_id") % 2 === rem), "lang", "token", k = 12)
        Sketches.mgTopK(Sketches.mgMerge(half(0), half(1), "lang", k = 12),
            "lang", kOut = 8)
          .select(col("lang"), col("rank"), col("key").as("token"),
            col("est_cnt"), col("ub_cnt"))
          .orderBy(col("lang"), col("rank"))
      }
    },

    // STREAMING ANN INDEX MAINTENANCE (r18 verdict Next #1 — the one
    // deployed artifact that was build-once): embeddings replay as FOUR
    // staged micro-batches, each assigned against PINNED centroids (the
    // 8 lowest corpus vec_ids, the ann_ivf_against seed convention) and
    // appended to the versioned store via ivfIndexUpdateStream —
    // version = batchId (union doesn't absorb retries; the CMS commit
    // discipline) with compaction keepLast = 2 (the enforced floor for
    // counting-style folds), so the ANN store gets retention too. Under
    // FIXED centroids each vector's cell is a pure function of its own
    // row, so the folded store equals the whole-corpus ivfIndex EXACTLY
    // for any micro-batch split — the oracle replays quantization, the
    // broadcast-K assignment with its (d2, cid) tie-break, and the
    // stored quantized vector + norm digit-for-digit (q serialized as a
    // comma-joined scalar: nested arrays crash the checker's sort).
    QuerySpec.sql("stream_ivf_index_update",
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT)) AS qv
        |           FROM embeddings),
        |m AS (SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS n2 FROM n),
        |c AS (SELECT vec_id AS cid, qv AS cq, n2 AS cn2 FROM m ORDER BY vec_id LIMIT 8),
        |d AS (SELECT m.vec_id, c.cid,
        |        m.n2 + c.cn2 - 2 * list_sum(list_transform(range(1, 65), i -> m.qv[i] * c.cq[i])) AS d2
        |      FROM m CROSS JOIN c),
        |cells AS (SELECT vec_id, cid FROM d
        |          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) = 1)
        |SELECT m.vec_id, cells.cid, CAST(m.n2 AS BIGINT) AS n2,
        |       array_to_string(m.qv, ',') AS q_str
        |FROM m JOIN cells USING (vec_id) ORDER BY m.vec_id""") {
      (s, dir) => {
        val vecs = Tables.embeddings(s, dir)
        val cents = EmbeddingSim.prepared(vecs)
          .orderBy(col("vec_id").asc).limit(8)
          .select(col("vec_id").as("cid"), col("q").as("cq"),
            col("n2").as("cn2"))
        val stages = (0 to 3).map(r =>
          vecs.filter(col("vec_id") % 4 === r)
            .select(col("vec_id"), col("embedding")))
        val tag = stagingTag(dir)
        val in = Ingest.stageOrderedFiles(s, stages,
          s"target/stream_ivf_index_in_$tag")
        val storeDir = s"target/stream_ivf_index_store_$tag"
        Ingest.deleteRecursively(storeDir)
        try {
          val q = graft.streaming.StreamOps.ivfIndexUpdateStream(in, cents,
              storeDir, compactKeepLast = 2)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          // retention pin: four folds, keepLast = 2 → exactly two
          // committed versions survive (local listing — scratch is target/)
          val live = Option(new java.io.File(storeDir).listFiles).toSeq
            .flatten
            .filter(f => f.isDirectory && f.getName.matches("v\\d+") &&
              new java.io.File(f, "_SUCCESS").isFile)
          require(live.size <= 2,
            s"stream_ivf_index_update left ${live.size} committed " +
              s"versions under $storeDir; compaction (keepLast=2) should leave 2")
          val store = graft.streaming.StreamOps.sketchStoreRead(s, storeDir)
          require(!store.isEmpty || vecs.isEmpty,
            s"stream_ivf_index_update folded an empty index from $dir " +
              "but the corpus has vectors")
          store.select(col("vec_id"), col("cid"), col("n2"),
              array_join(transform(col("q"), _.cast("string")), ",")
                .as("q_str"))
            .orderBy(col("vec_id"))
        } finally cents.unpersist(): Unit
      }
    },

    // ANN index UPSERT/DELETE maintenance (beyond the append loop —
    // dedup retracts vectors, recrawls replace embeddings): three
    // staged micro-batches — evens upserted, then odds upserted PLUS
    // every %10 id RE-upserted with its embedding REVERSED (a real
    // replacement, not a no-op), then every %7 id deleted. The fold is
    // anti-join ∪ assigned-upserts (retry-absorbing by algebra — set
    // semantics like the KMV fold, so monotonic versions, no
    // checkpoint), and the folded store must equal the whole-corpus
    // index of the LAST-WRITE state: reversed embeddings for %10 ids,
    // %7 ids absent, centroids pinned from the ORIGINAL corpus. The
    // oracle replays exactly that final state digit-for-digit.
    QuerySpec.sql("stream_ivf_index_upsert",
      """WITH n0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT)) AS qv
        |            FROM embeddings),
        |m0 AS (SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS n2 FROM n0),
        |c AS (SELECT vec_id AS cid, qv AS cq, n2 AS cn2 FROM m0 ORDER BY vec_id LIMIT 8),
        |n AS (SELECT vec_id,
        |        list_transform(CASE WHEN vec_id % 10 = 0 THEN list_reverse(embedding) ELSE embedding END,
        |          x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT)) AS qv
        |      FROM embeddings WHERE vec_id % 7 <> 0),
        |m AS (SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS n2 FROM n),
        |d AS (SELECT m.vec_id, c.cid,
        |        m.n2 + c.cn2 - 2 * list_sum(list_transform(range(1, 65), i -> m.qv[i] * c.cq[i])) AS d2
        |      FROM m CROSS JOIN c),
        |cells AS (SELECT vec_id, cid FROM d
        |          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) = 1)
        |SELECT m.vec_id, cells.cid, CAST(m.n2 AS BIGINT) AS n2,
        |       array_to_string(m.qv, ',') AS q_str
        |FROM m JOIN cells USING (vec_id) ORDER BY m.vec_id""") {
      (s, dir) => {
        val vecs = Tables.embeddings(s, dir)
        val cents = EmbeddingSim.prepared(vecs)
          .orderBy(col("vec_id").asc).limit(8)
          .select(col("vec_id").as("cid"), col("q").as("cq"),
            col("n2").as("cn2"))
        def ups(df: org.apache.spark.sql.DataFrame) =
          df.select(col("vec_id"), col("embedding"),
            lit("upsert").as("op"))
        val stages = Seq(
          ups(vecs.filter(col("vec_id") % 2 === 0)),
          ups(vecs.filter(col("vec_id") % 2 === 1)).unionByName(
            vecs.filter(col("vec_id") % 10 === 0)
              .select(col("vec_id"),
                reverse(col("embedding")).as("embedding"),
                lit("upsert").as("op"))),
          vecs.filter(col("vec_id") % 7 === 0)
            .select(col("vec_id"), col("embedding"),
              lit("delete").as("op")))
        val tag = stagingTag(dir)
        val in = Ingest.stageOrderedFiles(s, stages,
          s"target/stream_ivf_upsert_in_$tag")
        val storeDir = s"target/stream_ivf_upsert_store_$tag"
        Ingest.deleteRecursively(storeDir)
        try {
          val q = graft.streaming.StreamOps.ivfIndexUpsertStream(in, cents,
              storeDir, compactKeepLast = 1)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val store = graft.streaming.StreamOps.sketchStoreRead(s, storeDir)
          require(!store.isEmpty || vecs.filter(col("vec_id") % 7 =!= 0).isEmpty,
            s"stream_ivf_index_upsert folded an empty index from $dir " +
              "but the corpus has undeleted vectors")
          store.select(col("vec_id"), col("cid"), col("n2"),
              array_join(transform(col("q"), _.cast("string")), ",")
                .as("q_str"))
            .orderBy(col("vec_id"))
        } finally cents.unpersist(): Unit
      }
    },

    // The maintain→serve loop CLOSED end-to-end: queries are answered
    // FROM the stream-maintained index — embeddings fold in four
    // micro-batches (ivfIndexUpdateStream, compaction on), then a ~1%
    // query batch searches the folded store with ivfSearchAgainst.
    // Because fold ≡ whole under fixed centroids, search-over-folded ≡
    // search-over-built, which the oracle replays: whole-corpus cells,
    // batch probes, exact-cosine ranks. The batch is a SUBSET of the
    // index here (unlike ann_ivf_against's disjoint sides), so each
    // query's self-hit ranks first at cosine 1.0 — the documented
    // no-self-exclusion contract, replayed by the oracle verbatim.
    QuerySpec.sql("stream_ivf_search",
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT)) AS qv
        |           FROM embeddings),
        |m AS (SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS n2 FROM n),
        |c AS (SELECT vec_id AS cid, qv AS cq, n2 AS cn2 FROM m ORDER BY vec_id LIMIT 8),
        |d AS (SELECT m.vec_id, c.cid,
        |        m.n2 + c.cn2 - 2 * list_sum(list_transform(range(1, 65), i -> m.qv[i] * c.cq[i])) AS d2
        |      FROM m CROSS JOIN c),
        |cells AS (SELECT vec_id, cid FROM d
        |          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) = 1),
        |qb AS (SELECT vec_id AS query_id, qv AS qq, n2 AS qn2 FROM m WHERE vec_id % 101 = 0),
        |probes AS (SELECT query_id, cid FROM (
        |             SELECT qb.query_id, c.cid,
        |                    qb.qn2 + c.cn2 - 2 * list_sum(list_transform(range(1, 65), i -> qb.qq[i] * c.cq[i])) AS d2
        |             FROM qb CROSS JOIN c)
        |           QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2 ASC, cid ASC) <= 2),
        |scored AS (
        |  SELECT p.query_id, cells.vec_id AS vec_id,
        |         list_sum(list_transform(range(1, 65), i -> a.qq[i] * b.qv[i]))::DOUBLE
        |           / (sqrt(a.qn2::DOUBLE) * sqrt(b.n2::DOUBLE)) AS cos
        |  FROM probes p JOIN cells USING (cid)
        |  JOIN qb a ON a.query_id = p.query_id
        |  JOIN m b ON b.vec_id = cells.vec_id)
        |SELECT query_id, vec_id AS neighbor_id,
        |       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank,
        |       round(cos, 4) AS cosine
        |FROM scored
        |QUALIFY rank <= 10 ORDER BY query_id, rank""") {
      (s, dir) => {
        val vecs = Tables.embeddings(s, dir)
        val cents = EmbeddingSim.prepared(vecs)
          .orderBy(col("vec_id").asc).limit(8)
          .select(col("vec_id").as("cid"), col("q").as("cq"),
            col("n2").as("cn2"))
        val stages = (0 to 3).map(r =>
          vecs.filter(col("vec_id") % 4 === r)
            .select(col("vec_id"), col("embedding")))
        val tag = stagingTag(dir)
        val in = Ingest.stageOrderedFiles(s, stages,
          s"target/stream_ivf_search_in_$tag")
        val storeDir = s"target/stream_ivf_search_store_$tag"
        Ingest.deleteRecursively(storeDir)
        try {
          val q = graft.streaming.StreamOps.ivfIndexUpdateStream(in, cents,
              storeDir, compactKeepLast = 2)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val index = graft.streaming.StreamOps.sketchStoreRead(s, storeDir)
          require(!index.isEmpty || vecs.isEmpty,
            s"stream_ivf_search folded an empty index from $dir but the " +
              "corpus has vectors")
          val batch = vecs.filter(col("vec_id") % 101 === 0)
          EmbeddingSim.ivfSearchAgainst(batch, cents, index, k = 10,
              nprobe = 2)
            .select(col("query_id"), col("neighbor_id"),
              col("rank").cast("long").as("rank"), col("cosine"))
            .orderBy(col("query_id"), col("rank"))
        } finally cents.unpersist(): Unit
      }
    }
  )
}
