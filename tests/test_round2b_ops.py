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
