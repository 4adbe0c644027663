package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Event-time windowing over `events.parquet`, batch-first (SURVEY §2.10):
  * tumbling / sliding aggregation and gap-based sessionization — the same
  * `window()` expressions drive the Structured Streaming variant in
  * `graft.streaming.EventStream` (identical code path, plus watermark).
  *
  * Scale: a windowed groupBy shuffles on (bucket, type) with map-side
  * partial aggregation; sessionization shuffles once on user_id and sorts
  * within partitions (Spark's window exec) — both are single-shuffle plans
  * that hold at 1000 executors because user_id/bucket cardinality scales
  * with the data.
  */
object EventOps {
  private val D182 = DecimalType(18, 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 10-minute windows (epoch-aligned in both engines). The
    // SAME function drives the Structured Streaming variant
    // (EventStream.tumblingStream) — one definition, two execution modes.
    "ev_tumbling" -> ((s, d) =>
      graft.streaming.EventStream.tumblingAgg(Tables.events(s, d),
        "10 minutes")),

    // Sliding 10-minute windows, 5-minute slide → each event lands in 2.
    // Shared with the streaming variant (EventStream.slidingStream).
    "ev_sliding" -> ((s, d) =>
      graft.streaming.EventStream.slidingAgg(Tables.events(s, d),
        "10 minutes", "5 minutes")),

    // Native session windows (Spark's session_window merges events with
    // gaps < 30 min; end = last event + gap). Same session boundaries as
    // the manual lag-based ev_sessionize below — the oracle derives
    // start/end from that formulation.
    // Shared with the streaming variant (EventStream.sessionStream).
    "ev_session_window" -> ((s, d) =>
      graft.streaming.EventStream.sessionAgg(Tables.events(s, d),
        "30 minutes")),

    // Exact rolling MEDIAN (7-event window per type) — the robust
    // sibling of ev_rolling_zscore's mean/std: medians resist the
    // outliers a z-score flags. Spark has no exact windowed median, so
    // the engine composes one: collect_list over the bounded frame →
    // array_sort → middle (odd) / mean-of-middles (even, = DuckDB's
    // interpolated median at 0.5). The frame is ≤ 7 values, so the
    // per-row sort is O(1) and the whole thing is one partitioned
    // window pass — the composition only works for BOUNDED frames,
    // which is exactly when a rolling median is well-posed.
    "ev_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
      val arr = array_sort(collect_list(col("value")).over(w))
      val n = size(arr)
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          // collect_list drops NULLs: an all-NULL frame gives an empty
          // array, where element_at(_, 0) would abort — return NULL like
          // SQL median does (latent here: value is NOT NULL in testdata).
          round(when(n === 0, lit(null).cast("double"))
            .when(n % 2 === 1,
              element_at(arr, ((n + 1) / 2).cast("int")))
            .otherwise((element_at(arr, (n / 2).cast("int"))
              + element_at(arr, (n / 2).cast("int") + 1)) / 2.0), 6)
            .as("rolling_med"))
    }),

    // DAU / rolling-7-day WAU / stickiness — the product-analytics
    // staple that needs DISTINCT users per day AND per trailing window.
    // RFM segmentation (recency / frequency / monetary) — the classic
    // user-value matrix: per user, days since last event (vs the
    // corpus-max day, so the anchor is data-derived, not wall clock),
    // event count, and value sum; each dimension bucketed 1-4 against
    // its quartile BOUNDARIES (broadcast back, strict > comparisons).
    // Deliberately NOT ntile: a global ntile is a single-reducer sort
    // of the whole user table, and its tie-splitting is positional;
    // boundary-compare is one broadcast row + a distributed projection.
    // The quartile bounds are EXACT p·(n−1) interpolation computed by
    // GraftOps.exactPercentilesDist — per-value counts + distributed
    // prefix sum + rank probes — NOT the built-in exact `percentile()`,
    // whose single-group form buffers every per-user value in ONE
    // ObjectHashAggregate buffer (tens of GB at 10⁹ users). Nothing in
    // this plan global-sorts OR global-buffers at any scale, and the
    // bounds still hash-match DuckDB's quantile_cont exactly.
    "ev_rfm" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy("user_id").agg(
          max(to_date(col("ts"))).as("last_day"),
          count(lit(1)).as("frequency"),
          round(sum(col("value").cast(DecimalType(18, 2)))
            .cast("double"), 2).as("monetary"))
      val anchor = perUser.agg(max("last_day").as("anchor"))
      // rfm feeds the three distributed-percentile bounds AND the final
      // bucket projection. Deliberately UNMATERIALIZED: the repeated
      // subtree is deduplicated at execution by ReusedExchange (the
      // per-user aggregate's exchange is identical in all branches —
      // verified in the plan), so the events scan happens once at any
      // scale. Both explicit cuts were A/B-measured slower at sf0.1:
      // localCheckpoint 2.3 → 2.7 s (eager job for a user-count-sized
      // table), cache() 2.3 → 3.9 s (InMemoryRelation breaks the
      // codegen span) — the r8 "speculative materializations are
      // no-ops" finding, reconfirmed.
      val rfm = perUser.crossJoin(broadcast(anchor))
        .select(col("user_id"),
          datediff(col("anchor"), col("last_day")).cast("long")
            .as("recency_days"),
          col("frequency"), col("monetary"))
      val ps = Seq(0.25, 0.5, 0.75)
      val bounds = graft.api.GraftOps
        .exactPercentilesDist(rfm, "recency_days", ps)
        .withColumnRenamed("q", "rb")
        .crossJoin(graft.api.GraftOps
          .exactPercentilesDist(rfm, "frequency", ps)
          .withColumnRenamed("q", "fb"))
        .crossJoin(graft.api.GraftOps
          .exactPercentilesDist(rfm, "monetary", ps)
          .withColumnRenamed("q", "mb"))
      def bucket(c: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        (lit(1L) + (c > element_at(b, 1)).cast("long")
          + (c > element_at(b, 2)).cast("long")
          + (c > element_at(b, 3)).cast("long"))
      rfm.crossJoin(broadcast(bounds))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"),
          bucket(col("recency_days").cast("double"), col("rb")).as("r_q"),
          bucket(col("frequency").cast("double"), col("fb")).as("f_q"),
          bucket(col("monetary"), col("mb")).as("m_q"))
    }),

    // Per-event-type activity trend: OLS slope/intercept of daily event
    // counts over the day index — "is this event type growing" without
    // leaving SQL. x = days since the type's first day (integer),
    // y = count (integer), so every Σ in the closed-form slope is exact
    // integer arithmetic summed as DECIMAL(38,0); only the final
    // divisions round (the agg_corr discipline — engine-independent at
    // any partition order). Daily counts first (events-scale groupBy,
    // partial-aggregated), then per-type Σs over the tiny day table.
    "ev_trend" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val withX = daily
        .withColumn("x",
          datediff(col("day"), min(col("day"))
            .over(Window.partitionBy("event_type"))).cast("long"))
      // Degenerate group guard: n·Σx² − (Σx)² = 0 exactly when every x
      // is equal, which (x anchored at 0 per type) means a single-day
      // type. Unguarded, Spark's non-ANSI Divide returns NULL there
      // while DuckDB's double division returns NaN/±inf — a latent
      // cross-engine divergence. Explicit: slope NULL, intercept falls
      // back to the flat fit ȳ (sx = 0 in that case, so the coalesce(0)
      // term vanishes — continuous with the general formula).
      withX.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x").cast(dec) * col("x")).as("sxx"),
          sum(col("x").cast(dec) * col("y")).as("sxy"))
        .withColumn("num", (col("n_days").cast(dec) * col("sxy")
          - col("sx").cast(dec) * col("sy")).cast("double"))
        .withColumn("den", (col("n_days").cast(dec) * col("sxx")
          - col("sx").cast(dec) * col("sx")).cast("double"))
        .withColumn("slope0",
          when(col("den") =!= 0.0, col("num") / col("den")))
        .select(col("event_type"), col("n_days"),
          round(col("slope0"), 6).as("slope"),
          round((col("sy").cast("double")
            - coalesce(col("slope0"), lit(0.0)) * col("sx").cast("double"))
            / col("n_days").cast("double"), 6).as("intercept"))
    }),

    // Top navigation paths: each user-day's first 5 events (by time,
    // event_id tiebreak) joined into an ordered "a>b>c" path string,
    // then the 10 most common paths — the product-analytics "what do
    // users actually do" query. The per-user-day window caps fan-in at
    // 5 rows regardless of how chatty a user is (the unbounded-path
    // variant would make one hot user-day a giant array row — same
    // bucket-cap discipline as LSH), and path counting is an ordinary
    // partial-aggregated groupBy on the path string.
    "ev_top_paths" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "day")
        .orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy("user_id", "day")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_user_days"))
        .orderBy(col("n_user_days").desc, col("path")).limit(10)
    }),

    // The distinct (day, user) table is built once; each pair then
    // contributes to its own day plus the next 6 (a 7-way explode —
    // bounded fan-out, partial-aggregated), so the trailing-window
    // distinct never re-scans events and never holds a per-window user
    // set: at 100 TB this is one events scan + two groupBys. Target
    // days clamp to days that exist (inner join with the day list).
    "ev_dau_wau" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        .localCheckpoint()
      val dau = daily.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = daily
        .select(col("day"), col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"))
        .select(date_add(col("day"), col("i")).as("day"), col("user_id"))
        .distinct()
        .join(dau.select("day"), Seq("day"), "left_semi")
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"))
    }),

    // Gap-based sessionization (30-minute inactivity gap) per user:
    // lag → new-session flag → running session index → per-session agg.
    // Micros arithmetic on both engines (DuckDB epoch() is fractional
    // seconds; epoch_us matches Spark's unix_micros exactly).
    "ev_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs  = 30L * 60 * 1000000
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("new_sess")).over(byUser))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(col("value").cast(D182)).cast("double").as("session_value"))
    }),

    // Interval-OVERLAP join (campaign attribution): user sessions
    // (30-min-gap sessionization, the ev_sessionize core) joined to the
    // campaign windows they overlap, rolled up to per-campaign reach —
    // sessions touched, users reached, and total overlapped seconds
    // (least(end)−greatest(start), exact integer microseconds). The
    // campaign table is the bounded side (dozens of rows in any real
    // deployment) and BROADCASTS, so the inequality join is a streamed
    // nested-loop over tiny state — no shuffle beyond sessionization's
    // own user_id window. If both interval sides were corpus-sized the
    // right shape is j12's time-bin bucketing; this query is the
    // bounded-dimension case.
    "j17_interval_overlap" -> ((s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 30L * 60 * 1000000
      val sess = Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("new_sess")).over(byUser))
        .groupBy("user_id", "session_idx")
        .agg(min(unix_micros(col("ts"))).as("s_us"),
          max(unix_micros(col("ts"))).as("e_us"))
      val camps = Seq(
        ("c1", "2024-01-05 00:00:00", "2024-01-08 00:00:00"),
        ("c2", "2024-01-12 00:00:00", "2024-01-19 00:00:00"),
        ("c3", "2024-01-22 00:00:00", "2024-01-23 00:00:00"))
        .toDF("campaign", "cs", "ce")
        .select(col("campaign"),
          unix_micros(to_timestamp(col("cs"))).as("cs_us"),
          unix_micros(to_timestamp(col("ce"))).as("ce_us"))
      sess.join(broadcast(camps),
          col("s_us") <= col("ce_us") && col("e_us") >= col("cs_us"))
        .groupBy("campaign")
        .agg(count(lit(1)).cast("long").as("n_sessions"),
          count_distinct(col("user_id")).cast("long").as("n_users"),
          sum(least(col("e_us"), col("ce_us"))
            - greatest(col("s_us"), col("cs_us"))).cast("long")
            .as("overlap_us"))
    }),

    // Daily error-rate SLO — the ops gate over the event feed: per-day
    // error share with an explicit breach flag at the 21 % budget. One
    // partial-aggregated groupBy(day); the breach threshold compares
    // the ROUNDED share so both engines decide identically.
    "ev_error_rate_slo" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("long").as("n_errors"))
        .withColumn("error_share",
          round(col("n_errors").cast("double") / col("n_events"), 6))
        .withColumn("slo_breach", col("error_share") > 0.21)),

    // Session-duration SURVIVAL shares — the engagement curve read at a
    // fixed threshold grid (P[duration ≥ 1m/5m/15m/1h]): one aggregate
    // over the sessionize core, conditional sums only — the whole
    // report is a single reduced row regardless of corpus size.
    "ev_duration_survival" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 30L * 60 * 1000000
      val dur = Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("new_sess")).over(byUser))
        .groupBy("user_id", "session_idx")
        .agg((max(unix_micros(col("ts")))
          - min(unix_micros(col("ts")))).as("dur_us"))
      def surv(us: Long, asCol: String) =
        round(sum(when(col("dur_us") >= us, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as(asCol)
      dur.agg(count(lit(1)).cast("long").as("n_sessions"),
        surv(60000000L, "surv_1m"), surv(300000000L, "surv_5m"),
        surv(900000000L, "surv_15m"), surv(3600000000L, "surv_1h"))
    }),

    // PEAK CONCURRENCY — the classic interval-counting sweep (max
    // simultaneous sessions, and when it first happens): every session
    // contributes +1 at its start and −1 just past its end (half-open,
    // so a session is live at its last event's instant), and the
    // running sum over boundary-time order is the concurrency curve.
    // The sweep never sorts globally: day buckets are monotone in
    // time, so a per-bucket window cumsum + broadcast cumulative
    // bucket deltas (the prefix-sum spine, which is signed-value safe)
    // reconstruct the exact running count. Tiebreak (+1 before −1,
    // then session identity) makes the curve total-ordered and the
    // peak deterministic.
    "ev_peak_concurrency" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 30L * 60 * 1000000
      val sess = Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("new_sess")).over(byUser))
        .groupBy("user_id", "session_idx")
        .agg(min(unix_micros(col("ts"))).as("s_us"),
          max(unix_micros(col("ts"))).as("e_us"))
        .localCheckpoint()
      val bounds = sess.select(col("user_id"), col("session_idx"),
          col("s_us").as("t_us"), lit(1L).as("delta"))
        .unionByName(sess.select(col("user_id"), col("session_idx"),
          (col("e_us") + 1L).as("t_us"), lit(-1L).as("delta")))
        .withColumn("bkt", expr("t_us DIV 86400000000"))
      val offs = graft.api.GraftOps.cumulativeOffsets(
        bounds.groupBy("bkt").agg(sum("delta").as("dsum")), "bkt", "dsum")
      val wIn = Window.partitionBy("bkt")
        .orderBy(col("t_us"), col("delta").desc, col("user_id"),
          col("session_idx"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val run = bounds.join(broadcast(offs), Seq("bkt"))
        .withColumn("conc",
          (col("off") + sum("delta").over(wIn)).cast("long"))
      val peak = run.agg(max("conc").as("peak"))
      val n = sess.agg(count(lit(1)).cast("long").as("n_sessions"))
      run.join(broadcast(peak), col("conc") === col("peak"))
        .groupBy("peak").agg(min("t_us").as("peak_at_us"))
        .crossJoin(broadcast(n))
    }),

    // Ordered funnel: signup → first click AFTER signup → first purchase
    // AFTER that click, counted per stage. The stage dependency is
    // inherently sequential (t2 needs t1), so it costs one keyed
    // aggregate per stage — three shuffles on user_id, each preceded by
    // a pushed-down event_type scan filter.
    "ev_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val t1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, Seq("user_id")).filter(col("us") > col("t1"))
        .groupBy("user_id").agg(min("us").as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id")).filter(col("us") > col("t2"))
        .groupBy("user_id").agg(min("us").as("t3"))
      t1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(t2.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(t3.agg(count(lit(1)).as("n_purchase_after")))
    }),

    // Time-bounded funnel — ev_funnel with a conversion HORIZON per
    // step (click within 24h of signup, purchase within 24h of that
    // click): the form product analytics actually reports, since an
    // unbounded funnel credits conversions months later. Same
    // sequential keyed-aggregate shape (one shuffle per stage on
    // user_id), the horizon is one more pushed-down predicate on the
    // joined row — no new plan structure, which is exactly why the
    // unbounded funnel generalizes.
    "ev_funnel_window" -> ((s, d) => {
      val horizonUs = 24L * 3600 * 1000000
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val t1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, Seq("user_id"))
        .filter(col("us") > col("t1") &&
          col("us") <= col("t1") + horizonUs)
        .groupBy("user_id").agg(min("us").as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id"))
        .filter(col("us") > col("t2") &&
          col("us") <= col("t2") + horizonUs)
        .groupBy("user_id").agg(min("us").as("t3"))
      t1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(t2.agg(count(lit(1)).as("n_click_24h")))
        .crossJoin(t3.agg(count(lit(1)).as("n_purchase_24h")))
    }),

    // Day-7 cohort retention: cohort = first active UTC day per user;
    // retained = any activity exactly 7 days later. Day arithmetic on
    // epoch micros (exact for all representable days) — identical on
    // both engines.
    "ev_retention" -> ((s, d) => {
      val d0 = Tables.events(s, d)
        .select(col("user_id"),
          floor(unix_micros(col("ts")) / lit(86400e6)).as("day"))
        .distinct()
      val cohort = d0.groupBy("user_id").agg(min("day").as("c_day"))
      val ret = cohort.join(d0, Seq("user_id"))
        .filter(col("day") === col("c_day") + 7)
        .select("user_id", "c_day").distinct()
      cohort.groupBy("c_day").agg(count(lit(1)).as("n_cohort"))
        .join(ret.groupBy("c_day").agg(count(lit(1)).as("n_retained_d7")),
          Seq("c_day"), "left")
        .select(col("c_day"), col("n_cohort"),
          coalesce(col("n_retained_d7"), lit(0L)).as("n_retained_d7"))
    }),

    // Full weekly cohort retention MATRIX (ev_retention's single-offset
    // check generalized): cohort week = first active week per user,
    // one row per (cohort, weeks-since) with the distinct active users.
    // Same shapes: one distinct (user, week) table, a min-per-user
    // cohort join, one groupBy — the matrix is cohorts × offsets rows,
    // tiny at any corpus scale.
    "ev_cohort_matrix" -> ((s, d) => {
      val wk = Tables.events(s, d)
        .select(col("user_id"),
          floor(unix_micros(col("ts")) / lit(86400e6 * 7)).as("wk"))
        .distinct()
      val cohort = wk.groupBy("user_id").agg(min("wk").as("c_wk"))
      wk.join(cohort, Seq("user_id"))
        .groupBy(col("c_wk").as("cohort_wk"),
          (col("wk") - col("c_wk")).as("weeks_since"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // Semi-structured extraction: schema'd from_json over the props
    // payload column, then a plain aggregate — JSON parse is per-row
    // (codegen'd Jackson path), so the operator shards like any
    // projection; at scale the parse happens once and the extracted
    // column is columnar from then on.
    "ev_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))),

    // As-of (backward) join: each purchase attributed to the user's
    // latest click at-or-before it — the attribution/point-in-time-lookup
    // operator Spark has no built-in for. Delegates to GraftOps.asofJoin
    // (union-tag + one partitioned window: single shuffle on user_id, no
    // per-key cross product). (user_id, ts) is unique in events, so the
    // match is deterministic; the oracle is DuckDB's native ASOF JOIN.
    "j11_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"),
          unix_micros(col("ts")).as("click_us"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.api.GraftOps
        .asofJoin(purch, clicks, "user_id", "ts", Seq("click_id", "click_us"))
        .select(col("event_id"), col("user_id"),
          col("asof_click_id").as("click_id"),
          (unix_micros(col("ts")) - col("asof_click_us")).as("gap_us"))
    }),

    // Watermark-sizing report: how out-of-order is the stream, really?
    // Lateness of each event = running max event-time over ARRIVAL order
    // (event_id) minus its own event-time, clamped at 0; the report is
    // the late share, the max, and exact lateness quantiles — precisely
    // the numbers that justify a withWatermark() bound instead of
    // guessing one. The global running max never routes through a
    // single-partition window: event_id DIV divisor is a monotone
    // arrival bucket, so a per-bucket window max + a broadcast
    // prefix-max over the bounded bucket table reconstructs it exactly
    // (the prefix-max twin of GraftOps.cumulativeOffsets). The divisor
    // is RANGE-DERIVED — max(4096, ⌈range/4096⌉) from one min/max scan
    // of the id column (a single-scalar driver read for plan sizing,
    // same posture as autoSalt's diagnostic) — so the broadcast bucket
    // table is ≤4096 rows at ANY id range instead of growing linearly
    // with it; the prefix-max result is divisor-invariant, so the
    // oracle doesn't see the internal bucketing. Quantiles via
    // exactPercentilesDist — no single-task percentile buffer.
    "ev_disorder_report" -> ((s, d) =>
      graft.api.GraftOps.disorderReport(
        Tables.events(s, d).select(col("event_id"),
          unix_micros(col("ts")).as("ts_us")),
        "event_id", "ts_us")),

    // Range (interval) join via time-bin bucketing: clicks within the
    // hour before each purchase. A naive inequality join degenerates to
    // a per-key cross product; binning both sides to the interval width
    // and equi-joining on (key, bin) ∪ (key, bin+1) makes it a plain
    // shuffle join touching only O(matches) candidate pairs — the
    // scale-correct shape for interval joins (DuckDB reaches the same
    // result with its IEJoin).
    "j12_range_join" -> ((s, d) => {
      val binUs = 3600L * 1000000L
      val ev = Tables.events(s, d)
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
        .withColumn("bin", floor(col("p_us") / binUs).cast("long"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
        .withColumn("cbin", floor(col("c_us") / binUs).cast("long"))
        .withColumn("bin", explode(array(col("cbin"), col("cbin") + 1)))
      // A (purchase, click) pair meets on exactly one bin value, so no
      // pair-level dedup is needed before the count.
      val matched = purch.join(clicks, Seq("user_id", "bin"))
        .filter(col("c_us") > col("p_us") - binUs &&
          col("c_us") <= col("p_us"))
        .groupBy("event_id").agg(count(lit(1)).as("n_clicks_1h"))
      purch.select("event_id", "user_id")
        .join(matched, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("n_clicks_1h"), lit(0L)).as("n_clicks_1h"))
    }),

    // First-order Markov transition matrix over event types: per-user
    // lag pairs → global transition counts → row-normalized
    // probabilities (exact integer counts; one double division, same
    // spelling both engines). The product-analytics "what happens next"
    // surface.
    "ev_transition_matrix" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = Tables.events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val wRow = Window.partitionBy("from_type")
      pairs
        .withColumn("row_total", sum(col("n")).over(wRow))
        .select(col("from_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / col("row_total").cast("double"),
            6).as("p"))
    }),

    // SCD2 interval build (type-2 slowly-changing dimension from a
    // change stream): collapse each user's consecutive identical states
    // (gaps-and-islands lag filter), then each surviving change opens an
    // interval closed by the next change's timestamp — open-ended +
    // is_current for the latest. One partitioned window per step, no
    // state, the standard warehouse dimension-build.
    "scd2_intervals" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
    }),

    // Rolling z-score anomaly detection: each event scored against its
    // user's trailing 20-event window. The window moments are EXACT
    // (scaled-long sums over a bounded ROWS frame), and only the closed
    // form runs in floating point, written identically on both engines —
    // the same determinism recipe as agg_corr, applied per-frame.
    "ev_rolling_zscore" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
      Tables.events(s, d)
        .withColumn("x", (col("value") * 100.0 + 0.5).cast("long"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("x")).over(w))
        .withColumn("sxx", sum(col("x") * col("x")).over(w))
        .filter(col("n") >= 5 &&
          col("n") * col("sxx") > col("sx") * col("sx"))
        .select(col("event_id"), col("user_id"),
          round((col("n").cast("double") * col("x").cast("double")
              - col("sx").cast("double")) /
            sqrt((col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              * col("n").cast("double") / (col("n").cast("double") - 1.0)),
            6).as("zscore"))
    }),

    // Seasonal-naive forecast backtest — the baseline every real
    // forecaster must beat, and the cheapest daily-volume anomaly
    // screen: predict each day's count with the SAME WEEKDAY last week
    // (a calendar join on day = day − 7, robust to gap days where a
    // lag-7-ROWS window silently slips) and score per-type MAE over
    // the scorable days. Daily counts partial-aggregate on the events
    // scan; the self-join runs on the tiny day table, co-partitioned
    // on event_type. Integer |y − ŷ| sums → one exact division.
    "ev_forecast_naive" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val prior = daily.select(col("event_type").as("p_type"),
        col("day").as("pday"), col("y").as("y7"))
      daily.join(prior,
          col("event_type") === col("p_type") &&
            col("day") === date_add(col("pday"), 7))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_scored"),
          round(sum(abs(col("y") - col("y7"))).cast("double") /
            count(lit(1)), 6).as("mae"))
    }),

    // Growth accounting — the weekly new/retained/resurrected ledger
    // every product review starts from (the lifecycle refinement of
    // ev_dau_wau's raw actives): a user's week is "new" on their first
    // active week, "retained" when the previous active week is exactly
    // last week, "resurrected" after a gap. One distinct (user, week)
    // projection, one lag window on the user partition, one week
    // rollup — shuffles keyed on user then week, both natural keys
    // with map-side partials. (Churned-by-week is the same lag table
    // read from the other side; the three emitted states partition the
    // actives, which the n_active column pins.)
    "ev_lifecycle" -> ((s, d) => {
      val wk = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("week")
      wk.withColumn("prev", lag(col("week"), 1).over(w))
        .withColumn("status",
          when(col("prev").isNull, "new")
            .when(datediff(col("week"), col("prev")) === 7, "retained")
            .otherwise("resurrected"))
        .groupBy("week").agg(
          sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
          sum(when(col("status") === "retained", 1L).otherwise(0L))
            .as("n_retained"),
          sum(when(col("status") === "resurrected", 1L).otherwise(0L))
            .as("n_resurrected"),
          count(lit(1)).as("n_active"))
    }),

    // Two-proportion z-test over a deterministic A/B assignment — the
    // experiment-readout query product analytics runs daily. Variant =
    // user_id parity (in production: a seeded hash, same shape);
    // outcome = the user converted (≥1 purchase over 150 — thresholded
    // because EVERY synthetic user has some purchase, and a degenerate
    // 100 % pool has zero pooled variance). One per-user
    // aggregate, then ONE conditional global aggregate builds the 2×2
    // table — no pivot, no join between variant branches, no second
    // events scan. The z statistic is closed-form double math on four
    // BIGINTs, so both engines agree bit-for-bit; `significant`
    // compares the ROUNDED z so the 1.96 boundary is engine-stable.
    "ev_ab_test" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy("user_id").agg(
        max(when(col("event_type") === "purchase" && col("value") > 150.0,
          1L).otherwise(0L)).as("conv"))
      val isA = pmod(col("user_id"), lit(2L)) === 0
      val t = users.agg(
        sum(when(isA, 1L).otherwise(0L)).as("n_a"),
        sum(when(isA, col("conv")).otherwise(0L)).as("k_a"),
        sum(when(!isA, 1L).otherwise(0L)).as("n_b"),
        sum(when(!isA, col("conv")).otherwise(0L)).as("k_b"))
      val pA = col("k_a").cast("double") / col("n_a")
      val pB = col("k_b").cast("double") / col("n_b")
      val pPool = (col("k_a") + col("k_b")).cast("double") /
        (col("n_a") + col("n_b"))
      // Degenerate pools (0 % or 100 % conversion) have zero pooled
      // variance — z is undefined, not infinite; NULL on both engines.
      val z = when(pPool > 0.0 && pPool < 1.0,
        (pA - pB) / sqrt(pPool * (lit(1.0) - pPool) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
      t.select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
        round(pA, 6).as("p_a"), round(pB, 6).as("p_b"),
        round(z, 6).as("z"),
        coalesce(abs(round(z, 6)) > 1.96, lit(false)).as("significant"))
    }),

    // Robust per-user anomaly flags via median/MAD — the outlier rule
    // that survives the heavy tails where ev_rolling_zscore's mean/σ
    // gets dragged by the outliers it is hunting. Quantized cent domain
    // like the zscore (exact integer inputs → bit-identical percentile
    // interpolation on both engines). Two unordered windows over ONE
    // user_id partition — a single exchange, no join-backs; the
    // percentile window buffers each user's values, which is the
    // documented agg_percentiles trade (per-user event counts are
    // product-bounded; at 100 TB swap approx_percentile or
    // GraftOps.exactPercentilesDist per the registry convention).
    // Emits only the flagged rows (|robust z| > 3, MAD > 0, n ≥ 5);
    // the filter compares the ROUNDED score on both engines so the
    // boundary is engine-stable.
    "ev_anomaly_mad" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
      val z = (col("x").cast("double") - col("med")) /
        (lit(1.4826) * col("mad"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          (col("value") * 100.0 + 0.5).cast("long").as("x"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("med", percentile(col("x"), lit(0.5)).over(w))
        .withColumn("adev", abs(col("x").cast("double") - col("med")))
        .withColumn("mad", percentile(col("adev"), lit(0.5)).over(w))
        .filter(col("n") >= 5 && col("mad") > 0)
        .select(col("event_id"), col("user_id"),
          round(z, 6).as("robust_z"))
        .filter(abs(col("robust_z")) > 3.0)
    }),

    // Time-series gap fill (resample-to-daily): per-user daily event
    // counts with the missing days in the user's [first, last] span
    // materialized as zero rows — the densification every downstream
    // rolling/seasonal model needs. sequence() + explode generates each
    // user's grid WHERE THE USER'S ROWS ALREADY ARE (no global calendar
    // join, no skew): grid size is bounded by the span, and the left
    // join back to the daily aggregate is co-partitioned on user_id.
    "ev_gap_fill" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      val daily = ev.groupBy("user_id", "day").agg(
        count(lit(1)).as("n_events"),
        (sum((col("value") * 100.0 + 0.5).cast("long")).cast("double")
          / 100.0).as("day_value"))
      ev.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
            .as("day"))
        .join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("day_value"), lit(0.0)).as("day_value"))
    }))

  val oracle: Map[String, String] = Map(
    "ev_tumbling" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ev_cohort_matrix" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |    CAST(floor(epoch_us(ts) / (86400e6 * 7)) AS BIGINT) AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) AS c_wk FROM wk
        |  GROUP BY user_id)
        |SELECT c.c_wk AS cohort_wk, w.wk - c.c_wk AS weeks_since,
        |  count(*) AS n_users
        |FROM wk w JOIN cohort c ON w.user_id = c.user_id
        |GROUP BY c.c_wk, w.wk - c.c_wk""".stripMargin,
    "ev_rolling_median" ->
      """SELECT event_id, event_type,
        |  round(median(value) OVER (PARTITION BY event_type
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS rolling_med
        |FROM events""".stripMargin,
    "ev_trend" ->
      """WITH daily AS (SELECT event_type, ts::DATE AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, ts::DATE),
        |wx AS (SELECT event_type, y,
        |    CAST(date_diff('day',
        |      min(day) OVER (PARTITION BY event_type), day) AS BIGINT)
        |      AS x
        |  FROM daily),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
        |    sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy
        |  FROM wx GROUP BY event_type),
        |s2 AS (SELECT event_type, n_days, sx, sy,
        |    CAST(CAST(n_days AS DECIMAL(38,0)) * sxy
        |      - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE) AS num,
        |    CAST(CAST(n_days AS DECIMAL(38,0)) * sxx
        |      - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) AS den
        |  FROM s),
        |s3 AS (SELECT event_type, n_days, sx, sy,
        |    CASE WHEN den = 0 THEN NULL ELSE num / den END AS slope0
        |  FROM s2)
        |SELECT event_type, n_days, round(slope0, 6) AS slope,
        |  round((CAST(sy AS DOUBLE)
        |    - coalesce(slope0, 0) * CAST(sx AS DOUBLE))
        |    / CAST(n_days AS DOUBLE), 6) AS intercept
        |FROM s3""".stripMargin,
    "ev_rfm" ->
      """WITH pu AS (SELECT user_id, max(ts::DATE) AS last_day,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS monetary
        |  FROM events GROUP BY user_id),
        |rfm AS (SELECT user_id,
        |    CAST(date_diff('day', last_day,
        |      (SELECT max(last_day) FROM pu)) AS BIGINT) AS recency_days,
        |    frequency, monetary FROM pu),
        |b AS (SELECT
        |  quantile_cont(recency_days, 0.25) AS r1,
        |  quantile_cont(recency_days, 0.5) AS r2,
        |  quantile_cont(recency_days, 0.75) AS r3,
        |  quantile_cont(frequency, 0.25) AS f1,
        |  quantile_cont(frequency, 0.5) AS f2,
        |  quantile_cont(frequency, 0.75) AS f3,
        |  quantile_cont(monetary, 0.25) AS m1,
        |  quantile_cont(monetary, 0.5) AS m2,
        |  quantile_cont(monetary, 0.75) AS m3 FROM rfm)
        |SELECT user_id, recency_days, frequency, monetary,
        |  CAST(1 + (recency_days > r1)::INT + (recency_days > r2)::INT
        |    + (recency_days > r3)::INT AS BIGINT) AS r_q,
        |  CAST(1 + (frequency > f1)::INT + (frequency > f2)::INT
        |    + (frequency > f3)::INT AS BIGINT) AS f_q,
        |  CAST(1 + (monetary > m1)::INT + (monetary > m2)::INT
        |    + (monetary > m3)::INT AS BIGINT) AS m_q
        |FROM rfm CROSS JOIN b""".stripMargin,
    "ev_top_paths" ->
      """WITH r AS (SELECT user_id, ts::DATE AS day, event_type,
        |    row_number() OVER (PARTITION BY user_id, ts::DATE
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id, day,
        |    array_to_string(list(event_type ORDER BY rn), '>') AS path
        |  FROM r WHERE rn <= 5 GROUP BY user_id, day)
        |SELECT path, count(*) AS n_user_days FROM p
        |GROUP BY path ORDER BY n_user_days DESC, path LIMIT 10"""
        .stripMargin,
    "ev_dau_wau" ->
      """WITH daily AS (SELECT DISTINCT ts::DATE AS day, user_id
        |  FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM daily GROUP BY day),
        |wau AS (SELECT t.day, count(DISTINCT d.user_id) AS wau
        |  FROM dau t JOIN daily d ON d.day BETWEEN t.day - 6 AND t.day
        |  GROUP BY t.day)
        |SELECT dau.day, dau.dau, wau.wau,
        |  round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day""".stripMargin,
    "ev_sliding" ->
      """WITH both_grids AS (
        |  SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
        |    event_type, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '10 minutes', ts,
        |      INTERVAL '5 minutes') AS window_start,
        |    event_type, value FROM events)
        |SELECT window_start, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM both_grids GROUP BY 1, 2""".stripMargin,
    "ev_session_window" ->
      """WITH flagged AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR epoch_us(ts) - prev_us > 30 * 60 * 1000000
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT *, lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us FROM events)),
        |sess AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS session_idx FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM sess GROUP BY user_id, session_idx""".stripMargin,
    "ev_sessionize" ->
      """WITH flagged AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR epoch_us(ts) - prev_us > 30 * 60 * 1000000
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_sess
        |  FROM (SELECT *, lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us FROM events)),
        |sess AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS BIGINT) AS session_idx FROM flagged)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM sess GROUP BY user_id, session_idx""".stripMargin,
    "j17_interval_overlap" ->
      """WITH flagged AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR epoch_us(ts) - prev_us > 30 * 60 * 1000000
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_sess
        |  FROM (SELECT *, lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us FROM events)),
        |sess AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS BIGINT) AS session_idx FROM flagged),
        |si AS (SELECT user_id, session_idx,
        |  min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
        |  FROM sess GROUP BY user_id, session_idx),
        |camps(campaign, cs_us, ce_us) AS (VALUES
        |  ('c1', epoch_us(TIMESTAMP '2024-01-05 00:00:00'),
        |    epoch_us(TIMESTAMP '2024-01-08 00:00:00')),
        |  ('c2', epoch_us(TIMESTAMP '2024-01-12 00:00:00'),
        |    epoch_us(TIMESTAMP '2024-01-19 00:00:00')),
        |  ('c3', epoch_us(TIMESTAMP '2024-01-22 00:00:00'),
        |    epoch_us(TIMESTAMP '2024-01-23 00:00:00')))
        |SELECT campaign, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(least(e_us, ce_us) - greatest(s_us, cs_us)) AS BIGINT)
        |    AS overlap_us
        |FROM si JOIN camps ON s_us <= ce_us AND e_us >= cs_us
        |GROUP BY campaign""".stripMargin,
    "ev_error_rate_slo" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_errors,
        |  round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
        |    END) AS DOUBLE) / count(*), 6) AS error_share,
        |  round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
        |    END) AS DOUBLE) / count(*), 6) > 0.21 AS slo_breach
        |FROM events GROUP BY CAST(ts AS DATE)""".stripMargin,
    "ev_duration_survival" ->
      """WITH flagged AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR epoch_us(ts) - prev_us > 30 * 60 * 1000000
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_sess
        |  FROM (SELECT *, lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us FROM events)),
        |sess AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS BIGINT) AS session_idx FROM flagged),
        |du AS (SELECT user_id, session_idx,
        |  max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
        |  FROM sess GROUP BY user_id, session_idx)
        |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |  round(CAST(sum(CASE WHEN dur_us >= 60000000 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS surv_1m,
        |  round(CAST(sum(CASE WHEN dur_us >= 300000000 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS surv_5m,
        |  round(CAST(sum(CASE WHEN dur_us >= 900000000 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS surv_15m,
        |  round(CAST(sum(CASE WHEN dur_us >= 3600000000 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS surv_1h
        |FROM du""".stripMargin,
    "ev_peak_concurrency" ->
      """WITH flagged AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR epoch_us(ts) - prev_us > 30 * 60 * 1000000
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_sess
        |  FROM (SELECT *, lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us FROM events)),
        |sess AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS BIGINT) AS session_idx FROM flagged),
        |si AS (SELECT user_id, session_idx,
        |  min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
        |  FROM sess GROUP BY user_id, session_idx),
        |b AS (SELECT user_id, session_idx, s_us AS t_us,
        |    CAST(1 AS BIGINT) AS delta FROM si
        |  UNION ALL SELECT user_id, session_idx, e_us + 1,
        |    CAST(-1 AS BIGINT) FROM si),
        |r AS (SELECT t_us, CAST(sum(delta) OVER (ORDER BY t_us,
        |    delta DESC, user_id, session_idx
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc FROM b),
        |p AS (SELECT max(conc) AS peak FROM r)
        |SELECT p.peak,
        |  (SELECT min(t_us) FROM r WHERE conc = p.peak) AS peak_at_us,
        |  (SELECT CAST(count(*) AS BIGINT) FROM si) AS n_sessions
        |FROM p""".stripMargin,
    "ev_funnel" ->
      """WITH t1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
        |  GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
        |  JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
        |  GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM t1) AS n_signup,
        |  (SELECT count(*) FROM t2) AS n_click_after,
        |  (SELECT count(*) FROM t3) AS n_purchase_after""".stripMargin,
    "ev_funnel_window" ->
      """WITH t1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
        |    AND epoch_us(e.ts) <= t1.t1 + 86400000000
        |  GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
        |  JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
        |    AND epoch_us(e.ts) <= t2.t2 + 86400000000
        |  GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM t1) AS n_signup,
        |  (SELECT count(*) FROM t2) AS n_click_24h,
        |  (SELECT count(*) FROM t3) AS n_purchase_24h""".stripMargin,
    "ev_retention" ->
      """WITH d0 AS (SELECT DISTINCT user_id,
        |  CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day
        |  FROM events),
        |cohort AS (SELECT user_id, min(day) AS c_day FROM d0
        |  GROUP BY user_id),
        |ret AS (SELECT DISTINCT c.user_id, c.c_day
        |  FROM cohort c JOIN d0 ON c.user_id = d0.user_id
        |  WHERE d0.day = c.c_day + 7)
        |SELECT c.c_day, count(*) AS n_cohort,
        |  coalesce(r.n_retained_d7, CAST(0 AS BIGINT)) AS n_retained_d7
        |FROM cohort c
        |LEFT JOIN (SELECT c_day, count(*) AS n_retained_d7 FROM ret
        |  GROUP BY c_day) r ON c.c_day = r.c_day
        |GROUP BY c.c_day, r.n_retained_d7""".stripMargin,
    "ev_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "j11_asof_join" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT * FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, c.event_id AS click_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    "ev_disorder_report" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
        |d AS (SELECT event_id, ts_us, max(ts_us) OVER (ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_ts
        |  FROM ev),
        |l AS (SELECT ts_us, CASE WHEN prev_ts IS NOT NULL
        |  AND prev_ts > ts_us THEN prev_ts - ts_us ELSE 0 END AS late_us
        |  FROM d),
        |q AS (SELECT quantile_cont(CAST(late_us AS DOUBLE) / 1000.0,
        |  [0.5, 0.95, 0.99]) AS qq FROM l),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  CAST(max(late_us) AS BIGINT) AS max_late_us FROM l)
        |SELECT n_events, n_late,
        |  round(CAST(n_late AS DOUBLE) / n_events, 6) AS late_share,
        |  CAST(max_late_us // 1000 AS BIGINT) AS max_late_ms,
        |  round(qq[1], 6) AS p50_ms, round(qq[2], 6) AS p95_ms,
        |  round(qq[3], 6) AS p99_ms
        |FROM t, q""".stripMargin,
    "j12_range_join" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT * FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, count(c.ts) AS n_clicks_1h
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND c.ts > p.ts - INTERVAL '1 hour' AND c.ts <= p.ts
        |GROUP BY p.event_id, p.user_id""".stripMargin,
    "ev_transition_matrix" ->
      """WITH p AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT from_type, next_type, count(*) AS n FROM p
        |  WHERE next_type IS NOT NULL GROUP BY from_type, next_type)
        |SELECT from_type, next_type, n,
        |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (
        |    PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM c""".stripMargin,
    "scd2_intervals" ->
      """WITH ch AS (SELECT user_id, event_type, ts, event_id FROM (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events) WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type AS state, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    IS NULL AS is_current
        |FROM ch""".stripMargin,
    "ev_rolling_zscore" ->
      """WITH t AS (SELECT event_id, user_id,
        |  CAST(trunc(value * 100 + 0.5) AS BIGINT) AS x, ts FROM events),
        |m AS (SELECT event_id, user_id, x,
        |  count(*) OVER w AS n, CAST(sum(x) OVER w AS BIGINT) AS sx,
        |  CAST(sum(x * x) OVER w AS BIGINT) AS sxx
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  round((CAST(n AS DOUBLE) * CAST(x AS DOUBLE)
        |      - CAST(sx AS DOUBLE)) /
        |    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)), 6)
        |    AS zscore
        |FROM m WHERE n >= 5 AND n * sxx > sx * sx""".stripMargin,
    "ev_forecast_naive" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS y
        |  FROM events GROUP BY event_type, CAST(ts AS DATE))
        |SELECT a.event_type, count(*) AS n_scored,
        |  round(CAST(sum(abs(a.y - b.y)) AS DOUBLE) / count(*), 6)
        |    AS mae
        |FROM daily a JOIN daily b ON a.event_type = b.event_type
        |  AND a.day = b.day + INTERVAL 7 DAY
        |GROUP BY a.event_type""".stripMargin,
    "ev_lifecycle" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        |s AS (SELECT user_id, week,
        |    lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev
        |  FROM wk),
        |c AS (SELECT week, CASE WHEN prev IS NULL THEN 'new'
        |    WHEN week - prev = 7 THEN 'retained'
        |    ELSE 'resurrected' END AS status FROM s)
        |SELECT week,
        |  CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_retained,
        |  CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_resurrected,
        |  count(*) AS n_active
        |FROM c GROUP BY week""".stripMargin,
    "ev_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END)
        |      AS BIGINT) AS k_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END)
        |      AS BIGINT) AS k_b
        |  FROM u),
        |c AS (SELECT *,
        |    CAST(k_a AS DOUBLE) / n_a AS pa,
        |    CAST(k_b AS DOUBLE) / n_b AS pb,
        |    CAST(k_a + k_b AS DOUBLE) / (n_a + n_b) AS pp
        |  FROM t)
        |SELECT n_a, k_a, n_b, k_b,
        |  round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  round(CASE WHEN pp > 0 AND pp < 1 THEN (pa - pb)
        |    / sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)) END, 6)
        |    AS z,
        |  coalesce(abs(round(CASE WHEN pp > 0 AND pp < 1 THEN (pa - pb)
        |    / sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)) END, 6))
        |    > 1.96, FALSE) AS significant
        |FROM c""".stripMargin,
    "ev_anomaly_mad" ->
      """WITH t AS (SELECT event_id, user_id,
        |  CAST(trunc(value * 100 + 0.5) AS BIGINT) AS x FROM events),
        |m AS (SELECT event_id, user_id, x,
        |    count(*) OVER w AS n,
        |    quantile_cont(x, 0.5) OVER w AS med
        |  FROM t WINDOW w AS (PARTITION BY user_id)),
        |m2 AS (SELECT *, quantile_cont(abs(CAST(x AS DOUBLE) - med), 0.5)
        |    OVER (PARTITION BY user_id) AS mad FROM m)
        |SELECT event_id, user_id,
        |  round((CAST(x AS DOUBLE) - med) / (1.4826 * mad), 6) AS robust_z
        |FROM m2 WHERE n >= 5 AND mad > 0
        |  AND abs(round((CAST(x AS DOUBLE) - med) / (1.4826 * mad), 6))
        |    > 3""".stripMargin,
    "ev_gap_fill" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, value
        |  FROM events),
        |daily AS (SELECT user_id, day, count(*) AS n_events,
        |  CAST(sum(CAST(trunc(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 100.0 AS day_value
        |  FROM ev GROUP BY user_id, day),
        |spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM ev GROUP BY user_id),
        |grid AS (SELECT user_id,
        |  CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |    AS day FROM spans)
        |SELECT g.user_id, g.day,
        |  coalesce(daily.n_events, 0) AS n_events,
        |  coalesce(daily.day_value, 0.0) AS day_value
        |FROM grid g LEFT JOIN daily
        |  ON g.user_id = daily.user_id AND g.day = daily.day"""
        .stripMargin)
}
