"""Goldens for the round-2 second-wave operators (kept in a fresh file
so a long background pytest run never collides with appends)."""

from datetime import datetime


def test_json_field_stats_goldens(spark):
    from leidenalg_spark.operators.events import json_field_stats

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), 1, "click", 0.0, '{"k": 10}'),
            (2, datetime(2024, 1, 1), 1, "click", 0.0, '{"k": 20}'),
            (3, datetime(2024, 1, 1), 1, "click", 0.0, '{"k": 30}'),
            (4, datetime(2024, 1, 1), 1, "view", 0.0, '{"other": 1}'),
            (5, datetime(2024, 1, 1), 1, "view", 0.0, "not json"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {r.event_type: r for r in json_field_stats(ev).collect()}
    c = got["click"]
    assert (c.n, c.n_missing, c.vmin, c.vmax, c.mean, c.median) == (3, 0, 10.0, 30.0, 20.0, 20.0)
    v = got["view"]
    assert v.n == 2 and v.n_missing == 2 and v.median is None


def test_script_profile_goldens(spark):
    from leidenalg_spark.operators.textops import script_profile

    docs = spark.createDataFrame(
        [
            (1, "ab12 !?"),      # 2 letters, 2 digits, 1 space, 2 punct of 7
            (2, "日本語です"),     # all non-ascii
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in script_profile(docs).collect()}
    r = got[1]
    assert r.n_chars == 7
    assert round(r.letter_frac * 7) == 2 and round(r.digit_frac * 7) == 2
    assert round(r.space_frac * 7) == 1 and round(r.punct_frac * 7) == 2
    assert r.other_frac == 0.0
    assert got[2].other_frac == 1.0 and got[2].letter_frac == 0.0
    assert got[3].n_chars == 0 and got[3].other_frac == 0.0
    # the five fractions partition the characters
    s = r.letter_frac + r.digit_frac + r.space_frac + r.punct_frac + r.other_frac
    assert abs(s - 1.0) < 1e-5
