"""Semantics tests for the event-stream operators (operators/events.py):
as-of join bound/tie/no-match cases, exact percentile interpolation,
tumbling-window bucketing — plus a plan guard that the as-of join stays
a single-exchange window plan (no range join, no cartesian)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from leidenalg_spark.operators.events import asof_join, event_windows, value_profile


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def lr(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:05"), 100),  # after r@3 -> matches 3
            (1, _ts("2024-01-01 00:00:10"), 101),  # equal ts -> inclusive match r@10
            (1, _ts("2024-01-01 00:00:01"), 102),  # before any right row -> NULL
            (2, _ts("2024-01-01 00:00:30"), 103),  # key with no right rows -> NULL
        ],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:03"), 7, "a"),
            (1, _ts("2024-01-01 00:00:10"), 8, "b"),
            (1, _ts("2024-01-01 00:00:20"), 9, "c"),
        ],
        "k long, ts timestamp, rid long, tag string",
    )
    return left, right


def test_asof_backward_inclusive_and_nulls(lr):
    left, right = lr
    out = asof_join(left, right, key="k", right_cols=("rid", "tag"), tiebreak="rid")
    rows = {r["lid"]: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[100]["rid_r"] == 7 and rows[100]["tag_r"] == "a"
    assert rows[101]["rid_r"] == 8, "equal timestamps must match (l.ts >= r.ts)"
    assert rows[102]["rid_r"] is None and rows[102]["ts_r"] is None
    assert rows[103]["rid_r"] is None, "key absent from right side -> left-join NULLs"
    # left payload survives untouched
    assert rows[101]["ts"] == _ts("2024-01-01 00:00:10")


def test_asof_right_tie_latest_tiebreak_wins(spark):
    left = spark.createDataFrame([(1, 10, 0)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 2), (1, 5, 9)], "k long, ts long, rid long"
    )
    out = asof_join(left, right, key="k", right_cols=("rid",), tiebreak="rid").collect()
    assert out[0]["rid_r"] == 2, "equal-ts right rows: highest tiebreak carries"


def test_asof_plan_is_single_window_no_join(lr):
    left, right = lr
    plan = asof_join(left, right, key="k", right_cols=("rid",))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Window" in plan
    assert plan.count("Exchange") == 1, plan


def test_value_profile_exact_interpolation(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0)], "g string, v double"
    )
    row = value_profile(df, "g", "v", percentiles=(0.5, 0.9)).collect()[0]
    assert row["n"] == 4 and row["vmin"] == 1.0 and row["vmax"] == 10.0
    assert row["p50"] == pytest.approx(2.5)
    assert row["p90"] == pytest.approx(7.9), "rank = p*(n-1) linear interpolation"


def test_event_windows_buckets_align_to_epoch(spark):
    df = spark.createDataFrame(
        [
            (_ts("2024-01-01 00:59:59"), "x", 1.0),
            (_ts("2024-01-01 01:00:00"), "x", 2.0),
            (_ts("2024-01-01 01:30:00"), "y", 4.0),
        ],
        "ts timestamp, event_type string, value double",
    )
    out = {(r["window_start"], r["event_type"]): (r["n"], r["total"])
           for r in event_windows(df).collect()}
    assert out[(_ts("2024-01-01 00:00:00"), "x")] == (1, 1.0)
    assert out[(_ts("2024-01-01 01:00:00"), "x")] == (1, 2.0)
    assert out[(_ts("2024-01-01 01:00:00"), "y")] == (1, 4.0)


def test_jaccard_coefficient_square(spark):
    from leidenalg_spark.operators.kernels import jaccard_coefficient

    # 4-cycle 1-2-3-4-1: opposite corners share both neighbours,
    # deg=2 everywhere -> jc = 2 / (2+2-2) = 1.0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    ).withColumn("weight", F.lit(1.0))
    rows = {(r["src"], r["dst"]): r for r in jaccard_coefficient(spark, edges).collect()}
    assert set(rows) == {(1, 3), (2, 4)}, "adjacent pairs are anti-joined away"
    assert rows[(1, 3)]["n_common"] == 2 and rows[(1, 3)]["jc"] == pytest.approx(1.0)
    assert rows[(2, 4)]["jc"] == pytest.approx(1.0)


def test_jaccard_uses_true_degree_for_union(spark):
    from leidenalg_spark.operators.kernels import jaccard_coefficient

    # path 1-3, 2-3 plus pendant 2-4: pair (1,2) shares only vertex 3;
    # deg(1)=1, deg(2)=2 -> jc = 1 / (1+2-1) = 0.5
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (2, 4)], "src long, dst long"
    ).withColumn("weight", F.lit(1.0))
    rows = {(r["src"], r["dst"]): r["jc"] for r in jaccard_coefficient(spark, edges).collect()}
    assert rows[(1, 2)] == pytest.approx(0.5)


def test_funnel_strictly_after_and_horizon(spark):
    from leidenalg_spark.operators.events import funnel

    rows = [
        # user 1: clean view -> click -> purchase
        (1, _ts("2024-01-01 00:00:00"), "view"),
        (1, _ts("2024-01-01 00:01:00"), "click"),
        (1, _ts("2024-01-01 00:02:00"), "purchase"),
        # user 2: click BEFORE view, none after -> stops at view
        (2, _ts("2024-01-01 00:00:30"), "click"),
        (2, _ts("2024-01-01 00:01:30"), "view"),
        # user 3: click at the SAME ts as view -> strictly-after rejects it
        (3, _ts("2024-01-01 00:00:00"), "view"),
        (3, _ts("2024-01-01 00:00:00"), "click"),
        # user 4: purchase before click -> stops at click; first-match-wins
        # means the EARLIEST click after view is the step time
        (4, _ts("2024-01-01 00:00:00"), "view"),
        (4, _ts("2024-01-01 00:00:10"), "purchase"),
        (4, _ts("2024-01-01 00:05:00"), "click"),
        (4, _ts("2024-01-01 00:06:00"), "click"),
        # user 5: never views
        (5, _ts("2024-01-01 00:00:00"), "click"),
        (5, _ts("2024-01-01 00:01:00"), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r["step"]: r["n_keys"]
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": 4, "click": 2, "purchase": 1}

    # horizon 90s from the view: user 4's click at +5min falls out, and
    # user 1's purchase at +120s exceeds the horizon too
    out_h = {
        r["step"]: r["n_keys"]
        for r in funnel(ev, ["view", "click", "purchase"], horizon_s=90).collect()
    }
    assert out_h == {"view": 4, "click": 1, "purchase": 0}


def test_event_windows_sliding_double_counts(spark):
    ev = spark.createDataFrame(
        [
            (_ts("2024-01-01 00:10:00"), "view", 1.0),
            (_ts("2024-01-01 01:10:00"), "view", 2.0),
            (_ts("2024-01-01 01:50:00"), "click", 4.0),
        ],
        "ts timestamp, event_type string, value double",
    )
    out = event_windows(ev, width="2 hours", slide="1 hour").collect()
    # width/slide = 2 -> every event in exactly 2 windows
    assert sum(r["n"] for r in out) == 6
    by_w = {(r["window_start"].isoformat(), r["event_type"]): r for r in out}
    # window [00:00, 02:00) holds both views
    r = by_w[("2024-01-01T00:00:00", "view")]
    assert r["n"] == 2 and r["total"] == 3.0
    # window [23:00, 01:00) holds only the first view
    assert by_w[("2023-12-31T23:00:00", "view")]["n"] == 1
    # clicks never mix into view rows
    assert by_w[("2024-01-01T01:00:00", "click")]["n"] == 1


def test_event_windows_rejects_gapped_sampling(spark):
    ev = spark.createDataFrame(
        [(_ts("2024-01-01 00:10:00"), "view", 1.0)],
        "ts timestamp, event_type string, value double",
    )
    with pytest.raises(ValueError, match="slide.*must not exceed width"):
        event_windows(ev, width="1 hour", slide="2 hours")
    # equal width/slide is plain tumbling — allowed
    assert event_windows(ev, width="1 hour", slide="60 minutes").count() == 1


def test_retention_cohorts_hand_computed(spark):
    from leidenalg_spark.operators.events import retention_cohorts

    rows = [
        # user 1: cohort week of 2024-01-01 (Mon), active weeks 0, 1, 3
        (1, _ts("2024-01-02 10:00:00")), (1, _ts("2024-01-03 11:00:00")),
        (1, _ts("2024-01-08 09:00:00")), (1, _ts("2024-01-24 09:00:00")),
        # user 2: same cohort, only week 0
        (2, _ts("2024-01-05 12:00:00")),
        # user 3: cohort one week later, weeks 0 and 1
        (3, _ts("2024-01-10 12:00:00")), (3, _ts("2024-01-17 08:00:00")),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["cohort_start"].date().isoformat(), r["offset"]): r["n_active"]
        for r in retention_cohorts(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,  # users 1 and 2
        ("2024-01-01", 1): 1,  # user 1
        ("2024-01-01", 3): 1,  # user 1
        ("2024-01-08", 0): 1,  # user 3
        ("2024-01-08", 1): 1,  # user 3
    }


def test_association_rules_hand_computed(spark):
    from leidenalg_spark.operators.sessions import association_rules

    rows = [
        # user 1 session A: {x, y}; session B (2h+ later): {x}
        (1, _ts("2024-01-01 00:00:00"), "x", 1),
        (1, _ts("2024-01-01 00:10:00"), "y", 2),
        (1, _ts("2024-01-01 06:00:00"), "x", 3),
        # user 2 one session: {x, y, z}
        (2, _ts("2024-01-01 00:00:00"), "x", 4),
        (2, _ts("2024-01-01 00:05:00"), "y", 5),
        (2, _ts("2024-01-01 00:06:00"), "z", 6),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, event_id long")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(ev, gap_s=1800.0, tiebreak="event_id",
                                   min_support_n=2).collect()
    }
    # baskets: {x,y}, {x}, {x,y,z} -> nb=3; n_x=3, n_y=2, n_xy=2
    assert set(out) == {("x", "y"), ("y", "x")}
    r = out[("x", "y")]
    assert r["n_ab"] == 2
    assert r["support"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["confidence"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["lift"] == pytest.approx((2 / 3) / (2 / 3), abs=1e-6)
    r2 = out[("y", "x")]
    assert r2["confidence"] == pytest.approx(1.0)
    assert r2["lift"] == pytest.approx(1.0)


def test_conversation_profile_basic(spark):
    from leidenalg_spark.operators.sessions import conversation_profile

    rows = [
        ("c1", 0, "user", "hi", None, "2026-01-01 00:00:00"),
        ("c1", 1, "assistant", "hello!", None, "2026-01-01 00:00:10"),
        ("c1", 2, "tool", "ls", "bash", "2026-01-01 00:00:20"),
        ("c1", 3, "tool", "cat x", "bash", "2026-01-01 00:00:30"),
        ("c2", 0, "user", "solo", None, "2026-01-01 01:00:00"),
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["conv_id"]: r for r in conversation_profile(tr).collect()}
    c1, c2 = out["c1"], out["c2"]
    assert c1["n_turns"] == 4 and c1["n_user_turns"] == 1
    assert c1["n_tool_calls"] == 2 and c1["n_tools"] == 1
    assert c1["total_chars"] == len("hi") + len("hello!") + len("ls") + len("cat x")
    assert c1["duration_s"] == 30.0
    # role switches at turns 1 and 2, stays at 3 → 2/3
    assert abs(c1["alternation_rate"] - 2 / 3) < 1e-6
    assert c2["n_turns"] == 1 and c2["alternation_rate"] == 0.0 and c2["duration_s"] == 0.0


def test_anomaly_windows_flags_spike_and_null_baselines(spark):
    from leidenalg_spark.operators.events import anomaly_windows

    rows = []
    # alternating 4/6 baseline then a 50-count spike in hour 6
    for h, k in enumerate([4, 6, 4, 6, 4, 6, 50]):
        for i in range(k):
            rows.append((f"2026-01-01 0{h}:00:{i % 60:02d}", "click"))
    ev = spark.createDataFrame(rows, "ts string, event_type string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        r["window_start"].hour: r
        for r in anomaly_windows(
            ev, width="1 hour", baseline=6, threshold=3.0
        ).collect()
    }
    spike = out[6]
    assert spike["n"] == 50
    assert spike["baseline_mean"] == pytest.approx(5.0)
    # stddev_samp([4,6]*3) = sqrt(1.2); z = 45/sqrt(1.2)
    assert spike["zscore"] == pytest.approx(45 / 1.2**0.5, abs=1e-5)
    assert spike["is_anomaly"]
    # hour 0 has no baseline; hour 1 has one row (stddev_samp NULL)
    assert out[0]["zscore"] is None and not out[0]["is_anomaly"]
    assert out[1]["zscore"] is None and not out[1]["is_anomaly"]
    assert all(out[h]["zscore"] is not None for h in range(2, 7))


def test_anomaly_windows_constant_baseline_gives_null_z(spark):
    from leidenalg_spark.operators.events import anomaly_windows

    rows = []
    for h, k in enumerate([5, 5, 5, 20]):
        for i in range(k):
            rows.append((f"2026-01-01 0{h}:00:{i % 60:02d}", "err"))
    ev = spark.createDataFrame(rows, "ts string, event_type string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r["n"]: r for r in anomaly_windows(ev, baseline=6).collect()}
    # zero-variance baseline: z undefined by design, never flagged
    assert out[20]["zscore"] is None and not out[20]["is_anomaly"]
    assert out[20]["baseline_mean"] == pytest.approx(5.0)


def test_tool_chains_bigrams_in_turn_order(spark):
    from leidenalg_spark.operators.sessions import tool_chains

    rows = [
        ("c1", 0, "user", "q", None, "2026-01-01 00:00:00"),
        ("c1", 1, "tool", "x", "bash", "2026-01-01 00:00:01"),
        ("c1", 2, "tool", "y", "grep", "2026-01-01 00:00:02"),
        ("c1", 3, "tool", "z", "bash", "2026-01-01 00:00:03"),
        ("c2", 0, "tool", "a", "bash", "2026-01-01 01:00:00"),
        ("c2", 1, "tool", "b", "grep", "2026-01-01 01:00:01"),
        ("c3", 0, "tool", "solo", "edit", "2026-01-01 02:00:00"),  # < n calls
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["chain"]: (r["n_convs"], r["count"]) for r in tool_chains(tr, n=2).collect()}
    assert out == {"bash>grep": (2, 2), "grep>bash": (1, 1)}


def test_edge_set_drift_golden(spark):
    from leidenalg_spark.operators.edges import edge_set_drift

    # slice 1: {a,b}; slice 2: {b,c,d} -> common {b}, new {c,d}, gone {a}
    rows = [
        (1, "u1", "a"), (1, "u1", "b"), (1, "u1", "b"),
        (2, "u1", "b"), (2, "u1", "c"), (2, "u1", "d"),
    ]
    df = spark.createDataFrame(rows, "slice long, src string, dst string")
    got = {r.slice: (r.n_prev, r.n_curr, r.n_common, r.n_new, r.n_gone, r.jaccard)
           for r in edge_set_drift(df).collect()}
    assert got == {2: (2, 3, 1, 2, 1, 0.25)}


def test_burstiness_periodic_vs_bursty(spark):
    import datetime as dt
    from leidenalg_spark.operators.events import burstiness

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # user 1: perfectly periodic (gap 10s) -> sigma 0, B = -1
    for i in range(5):
        rows.append((i, t0 + dt.timedelta(seconds=10 * i), 1, "e", 0.0))
    # user 2: gaps 1,1,1,100 -> mu=25.75, sigma_pop~42.87, B~0.2495
    offs = [0, 1, 2, 3, 103]
    for j, o in enumerate(offs):
        rows.append((100 + j, t0 + dt.timedelta(seconds=o), 2, "e", 0.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.user_id: r for r in burstiness(ev).collect()}
    assert got[1].burstiness == -1.0 and got[1].cv == 0.0 and got[1].n_gaps == 4
    assert got[2].mean_gap_s == 25.75 and abs(got[2].burstiness - 0.249471) < 1e-6


def test_periodicity_daily_rhythm(spark):
    import datetime as dt
    from leidenalg_spark.operators.events import periodicity

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    # 'daily': a burst at hour 9 of every day for 6 days -> acf(24) = 1
    for day in range(6):
        for _ in range(5):
            rows.append((eid, t0 + dt.timedelta(days=day, hours=9), 1, "daily", 0.0))
            eid += 1
    # 'flat': one event every hour -> constant series, zero variance -> NULL
    for h in range(6 * 24):
        rows.append((eid, t0 + dt.timedelta(hours=h), 2, "flat", 0.0))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.event_type: r for r in periodicity(ev, lag=24).collect()}
    assert got["daily"].acf == 1.0
    assert got["flat"].acf is None


def test_lifecycle_accounting_states(spark):
    import datetime as dt
    from leidenalg_spark.operators.events import lifecycle_accounting

    t0 = dt.datetime(2026, 1, 5)  # week boundary alignment irrelevant
    W = dt.timedelta(days=7)
    rows = []
    # u1 active weeks 0,1,3 -> new@0, retained@1, churned@2, resurrected@3
    for w in (0, 1, 3):
        rows.append((len(rows), t0 + w * W, 1, "e", 0.0))
    # u2 active week 1 only -> new@1, churned@2
    rows.append((len(rows), t0 + W, 2, "e", 0.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {(r.bucket, r.state): r.n_users for r in lifecycle_accounting(ev).collect()}
    w0 = min(b for b, _ in got)
    rel = {(b - w0, s): n for (b, s), n in got.items()}
    assert rel == {
        (0, "new"): 1,
        (1, "new"): 1, (1, "retained"): 1,
        (2, "churned"): 2,
        (3, "resurrected"): 1,
    }


def test_rfm_scores_goldens(spark):
    from datetime import datetime

    from leidenalg_spark.operators.events import rfm_scores

    rows = [
        # heavy fresh spender: best on all three axes
        (1, datetime(2024, 1, 10), 50.0), (1, datetime(2024, 1, 10), 50.0),
        (1, datetime(2024, 1, 10), 50.0),
        # stale one-shot low spender: worst on all three
        (2, datetime(2024, 1, 1), 1.0),
        # middle
        (3, datetime(2024, 1, 5), 10.0), (3, datetime(2024, 1, 6), 10.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r.user_id: r for r in rfm_scores(ev).collect()}
    assert got[1].recency_days == 0 and got[2].recency_days == 9
    assert got[1].frequency == 3 and got[1].monetary == 150.0
    # histogram quantiles with n=3: best value -> ceil(5*3/3)=5,
    # middle -> ceil(5*2/3)=4, worst -> ceil(5*1/3)=2
    assert (got[1].r_score, got[1].f_score, got[1].m_score) == (5, 5, 5)
    assert (got[2].r_score, got[2].f_score, got[2].m_score) == (2, 2, 2)
    assert got[3].rfm == 444
    assert got[1].rfm == 555 and got[2].rfm == 222


def test_temporal_motifs_window_and_order(spark):
    """Planted sequence: user 0 emits view->click->purchase twice inside
    the window and once spanning beyond delta; user 1 interleaves (no
    cross-user motifs).  Ordering ties break on event_id."""
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.events import temporal_motifs

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 0: two in-window v->c->p runs back to back
        (0, t0 + timedelta(seconds=0), 0, "view"),
        (1, t0 + timedelta(seconds=10), 0, "click"),
        (2, t0 + timedelta(seconds=20), 0, "purchase"),
        (3, t0 + timedelta(seconds=30), 0, "view"),
        (4, t0 + timedelta(seconds=40), 0, "click"),
        (5, t0 + timedelta(seconds=50), 0, "purchase"),
        # user 0: a run whose span exceeds delta -> NOT a motif
        (6, t0 + timedelta(seconds=10_000), 0, "view"),
        (7, t0 + timedelta(seconds=10_010), 0, "click"),
        (8, t0 + timedelta(seconds=13_700), 0, "purchase"),
        # user 1: only two events -> no triple
        (9, t0 + timedelta(seconds=0), 1, "view"),
        (10, t0 + timedelta(seconds=5), 1, "click"),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, et, 0.0, "{}") for i, ts, u, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {(r.a, r.b, r.c): r.n for r in temporal_motifs(ev, delta_s=3600).collect()}
    assert got[("view", "click", "purchase")] == 2
    # the intermediate overlapping triples of user 0's back-to-back runs
    assert got[("click", "purchase", "view")] == 1
    assert got[("purchase", "view", "click")] == 1
    assert ("click", "purchase", "view") in got and len(got) == 3


def test_interarrival_ks_periodic_actor(spark):
    """Perfectly periodic gaps (all 10s, n=5): KS vs the matched
    exponential is F(10)=1-1/e at i=1 → 0.632121; short actors drop."""
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.events import interarrival_ks

    t0 = datetime(2024, 1, 1)
    rows = [(1, t0 + timedelta(seconds=10 * i)) for i in range(6)]
    rows += [(2, t0), (2, t0 + timedelta(seconds=5))]  # 1 gap → dropped
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.user_id: r for r in interarrival_ks(ev, min_gaps=5).collect()}
    assert set(out) == {1}
    r = out[1]
    assert r.n_gaps == 5 and r.mean_gap_s == 10.0
    import math
    assert abs(r.ks_stat - round(1 - math.exp(-1), 6)) < 1e-6


def test_session_concurrency_sweep(spark):
    """Two overlapping sessions: concurrency rises to 2 inside the
    overlap, half-open ends release before the outer session closes."""
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.sessions import session_concurrency

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 1), (1, t0 + timedelta(seconds=100), 2),
        (2, t0 + timedelta(seconds=50), 3), (2, t0 + timedelta(seconds=60), 4),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = {r.t: (r.n_delta, r.concurrent)
           for r in session_concurrency(ev, gap_s=1800.0, tiebreak="event_id").collect()}
    assert out[t0] == (1, 1)
    assert out[t0 + timedelta(seconds=50)] == (1, 2)
    assert out[t0 + timedelta(seconds=60)] == (-1, 1)
    assert out[t0 + timedelta(seconds=100)] == (-1, 0)


def test_leadlag_correlation_planted_shift(spark):
    """Type b is exactly type a shifted one day: r=1 at lag 1 (a leads
    b), r=-0.2 at lag 0 on the 4-day dense grid."""
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.events import leadlag_correlation

    t0 = datetime(2024, 1, 1)
    rows = []
    counts_a = [1, 2, 3, 0]
    for d, c in enumerate(counts_a):
        rows += [("a", t0 + timedelta(days=d, hours=i + 1)) for i in range(c)]
        rows += [("b", t0 + timedelta(days=d, hours=i + 12)) for i in range(counts_a[d - 1] if d > 0 else 0)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {(r.label_a, r.label_b, r.lag): r for r in leadlag_correlation(ev, max_lag=1).collect()}
    r_ab1 = out[("a", "b", 1)]
    assert r_ab1.n_buckets == 3 and abs(r_ab1.r - 1.0) < 1e-6
    assert abs(out[("a", "b", 0)].r - (-0.2)) < 1e-6


def test_attribution_models_conserve_credit(spark):
    """Hand-computed: last → email, first → ad, linear → ½/½; the
    touchless conversion lands in the NULL bucket; Σcredit = #conversions
    for every model."""
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.events import attribution

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, "ad"), (1, t0 + timedelta(seconds=10), "email"),
        (1, t0 + timedelta(seconds=20), "purchase"),
        (2, t0, "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    for model, want in (
        ("last", {"email": 1.0, None: 1.0}),
        ("first", {"ad": 1.0, None: 1.0}),
        ("linear", {"ad": 0.5, "email": 0.5, None: 1.0}),
    ):
        out = {r.label: r.credit for r in
               attribution(ev, "purchase", model=model).collect()}
        assert out == want, (model, out)
        assert abs(sum(out.values()) - 2.0) < 1e-9


def test_decayed_edges_half_life(spark):
    """Transitions at age 100s and 0s with half-life 100s → weights
    0.5 and 1.0."""
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.edges import events_to_decayed_edges

    t0 = datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, t0, "a", 1), (1, t0 + timedelta(seconds=100), "b", 2),
         (1, t0 + timedelta(seconds=200), "c", 3)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    out = {(r.src_name, r.dst_name): r for r in
           events_to_decayed_edges(ev, half_life_s=100.0).collect()}
    assert abs(out[("a", "b")].weight - 0.5) < 1e-6
    assert abs(out[("b", "c")].weight - 1.0) < 1e-6
    assert out[("a", "b")].n_transitions == 1


def test_population_stability_planted_shift(spark):
    """First half all 'a', second half all 'b': each label contributes
    (1−ε)·ln((1−ε)/ε)-ish; total PSI is large; shares sum to 1."""
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.events import population_stability

    t0 = datetime(2024, 1, 1)
    rows = [("a", t0 + timedelta(hours=i)) for i in range(10)]
    rows += [("b", t0 + timedelta(hours=100 + i)) for i in range(10)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.event_type: r for r in population_stability(ev).collect()}
    assert out["a"].p_first == 1.0 and out["a"].p_second == 0.0
    assert out["b"].p_first == 0.0 and out["b"].p_second == 1.0
    assert out[None].psi > 10  # ≈ 2·ln(1e6)
    assert abs(out[None].p_first - 1.0) < 1e-6


def test_population_stability_stable_mix(spark):
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.events import population_stability

    t0 = datetime(2024, 1, 1)
    rows = []
    for h in range(20):
        rows += [("a", t0 + timedelta(hours=h)), ("b", t0 + timedelta(hours=h, minutes=30))]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.event_type: r for r in population_stability(ev).collect()}
    assert abs(out[None].psi) < 0.01  # unchanged mix


def test_heavy_user_share_concentration(spark):
    """10 users: one whale with 91 events, nine with 1 → top-10% share
    = 0.91."""
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.events import heavy_user_share

    t0 = datetime(2024, 1, 1)
    rows = [(0, t0 + timedelta(seconds=i)) for i in range(91)]
    rows += [(u, t0) for u in range(1, 10)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.pct: r for r in heavy_user_share(ev, pcts=(0.1, 0.5)).collect()}
    assert out[0.1].n_top_users == 1 and out[0.1].share == 0.91
    assert out[0.5].n_top_users == 5 and out[0.5].share == 0.95


def test_session_entries_exits_census(spark):
    """Two sessions for one user (view->click, then view alone) plus a
    single-event click session for another: entry/exit/bounce counts."""
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.sessions import session_entries_exits

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, "view", 1), (1, t0 + timedelta(seconds=10), "click", 2),
        (1, t0 + timedelta(hours=2), "view", 3),     # new session, bounce
        (2, t0, "click", 4),                          # bounce
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, event_id long")
    out = {r.label: r for r in
           session_entries_exits(ev, gap_s=1800.0, tiebreak="event_id").collect()}
    assert out["view"].n_entries == 2 and out["view"].n_exits == 1
    assert out["view"].n_bounces == 1
    assert out["click"].n_entries == 1 and out["click"].n_exits == 2
    assert out["click"].n_bounces == 1
    assert abs(out["view"].entry_share - 2 / 3) < 1e-6


def test_markov_absorption_hand_computed(spark):
    """Chain: from 'a', half the journeys go a->b, half a->END;
    from 'b', all go to purchase.  P(a->purchase) = 0.5, P(b->purchase)=1."""
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.events import markov_absorption

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, "a", 1), (1, t0 + timedelta(seconds=1), "b", 2),
        (1, t0 + timedelta(seconds=2), "purchase", 3),
        (2, t0, "a", 4),  # ends after a
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, event_id long")
    out = {(r.state, r.absorbing_state): r.probability
           for r in markov_absorption(ev, ["purchase"]).collect()}
    assert abs(out[("a", "purchase")] - 0.5) < 1e-6
    assert abs(out[("a", "END")] - 0.5) < 1e-6
    assert abs(out[("b", "purchase")] - 1.0) < 1e-6
    # per-state probabilities sum to 1
    import collections
    sums = collections.Counter()
    for (s, _), p in out.items():
        sums[s] += p
    assert all(abs(v - 1.0) < 1e-6 for v in sums.values())


def test_adoption_curve_exposure_counts(spark):
    """Star graph: center adopts last after both leaves -> exposure 2;
    leaves adopt first/never -> exposures 0 and 1."""
    from datetime import datetime, timedelta

    from leidenalg_spark.operators.events import adoption_curve

    t0 = datetime(2024, 1, 1)
    e = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 3.0), (0, 3, 3.0)], "src long, dst long, weight double"
    )
    ev = spark.createDataFrame(
        [(1, t0, "buy", 1), (2, t0 + timedelta(hours=1), "buy", 2),
         (0, t0 + timedelta(hours=2), "buy", 3)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    out = {r.exposure: r for r in adoption_curve(ev, "buy", edges=e).collect()}
    # center (0): both 1 and 2 adopted earlier -> exposure 2, adopter
    assert out[2].n_users == 1 and out[2].n_adopters == 1
    # leaves 1,2: their only neighbour (0) adopted AFTER them -> exposure 0
    # leaf 3: never adopts, neighbour 0 adopted ever -> exposure 1, rate 0
    assert out[0].n_users == 2 and out[0].n_adopters == 2
    assert out[1].n_users == 1 and out[1].n_adopters == 0 and out[1].adoption_rate == 0.0
