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


def test_onion_layers_goldens(spark):
    from leidenalg_spark.operators.kernels import onion_layers

    # star: leaves peel in wave 1 at k=1; the hub (degree 0 after) in wave 2
    star = spark.createDataFrame(
        [(0, i, 1.0) for i in range(1, 5)], "src long, dst long, weight double"
    )
    got = {r.id: (r.layer, r.k_at_peel) for r in onion_layers(spark, star).collect()}
    assert all(got[i] == (1, 1) for i in range(1, 5))
    assert got[0] == (2, 1)

    # path 1-2-3-4: ends peel wave 1, the middle pair wave 2 (k stays 1) —
    # all coreness 1, but onion layers separate periphery from interior
    p = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)], "src long, dst long, weight double"
    )
    got = {r.id: r.layer for r in onion_layers(spark, p).collect()}
    assert got[1] == got[4] == 1 and got[2] == got[3] == 2

    # triangle: one wave at k=2
    t = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0)], "src long, dst long, weight double"
    )
    rows = onion_layers(spark, t).collect()
    assert all(r.layer == 1 and r.k_at_peel == 2 for r in rows)


def test_dot_roundtrip_and_validation(spark, tmp_path):
    import pytest

    from leidenalg_spark.sources.dot import read_dot, write_dot

    e = spark.createDataFrame(
        [("a", "b", 2.5), ("b", "c d", 1.0)], "src string, dst string, weight double"
    )
    p = str(tmp_path / "g.dot")
    write_dot(e, p)
    back = {(r.src, r.dst): r.weight for r in read_dot(spark, p).collect()}
    assert back == {("a", "b"): 2.5, ("b", "c d"): 1.0}

    # unweighted write → default weight on read
    u = spark.createDataFrame([("x", "y")], "src string, dst string")
    p2 = str(tmp_path / "u.dot")
    write_dot(u, p2)
    assert read_dot(spark, p2).collect()[0].weight == 1.0

    # names with quotes are rejected at write
    bad = spark.createDataFrame([('a"b', "c", 1.0)], "src string, dst string, weight double")
    with pytest.raises(ValueError):
        write_dot(bad, str(tmp_path / "bad.dot"))


def test_bowtie_decomposition_goldens(spark):
    from leidenalg_spark.operators.kernels import bowtie_decomposition

    # textbook bow-tie: 1→(2↔3 core cycle)→4, plus a disconnected 8-9
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 2, 1.0), (3, 4, 1.0), (8, 9, 1.0)],
        "src long, dst long, weight double",
    )
    got = {r.id: r.cls for r in bowtie_decomposition(spark, e).collect()}
    assert got[2] == got[3] == "core"
    assert got[1] == "in" and got[4] == "out"
    assert got[8] == "other" and got[9] == "other"


def test_community_cartography_goldens(spark):
    from leidenalg_spark.operators.community import community_cartography

    # two triangles bridged by one edge; vertex 3 is the connector and
    # carries an extra internal spoke (7) so its within-module degree
    # stands out
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0), (3, 7, 1.0),
         (4, 5, 1.0), (5, 6, 1.0), (4, 6, 1.0),
         (3, 4, 1.0)],
        "src long, dst long, weight double",
    )
    m = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (7, 0), (4, 1), (5, 1), (6, 1)], "id long, comm long"
    )
    got = {r.id: r for r in community_cartography(e, m).collect()}
    # pure-internal vertices: participation 0
    assert got[1].participation == 0.0 and got[5].participation == 0.0
    # connector 3: k=4 (3 internal + 1 external) → P = 1 - (9+1)/16
    assert got[3].k == 4 and got[3].k_in == 3
    assert abs(got[3].participation - (1 - 10 / 16)) < 1e-6
    # the spoked connector has the highest within-module z; the regular
    # triangle community has zero variance → z = 0 for all members
    assert got[3].z > got[1].z
    assert got[4].z == got[5].z == got[6].z == 0.0


def test_s_core_goldens(spark):
    from leidenalg_spark.operators.kernels import s_core

    # heavy triangle (w=5 each) + a light pendant: the pendant peels
    # first at s=2, the triangle survives to a later wave at s=10
    e = spark.createDataFrame(
        [(1, 2, 5.0), (2, 3, 5.0), (1, 3, 5.0), (3, 4, 2.0)],
        "src long, dst long, weight double",
    )
    got = {r.id: r for r in s_core(spark, e).collect()}
    assert got[4].layer == 1 and got[4].s_at_peel == 2.0
    assert got[1].layer > 1 and got[1].s_at_peel == 10.0
    assert got[1].layer == got[2].layer == got[3].layer

    # unweighted-equivalent: s-core == degree peel when weights are 1
    u = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    rows = {r.id: r.layer for r in s_core(spark, u).collect()}
    assert rows[1] == rows[3] == 1 and rows[2] == 2


def test_avg_local_cc_vs_known(spark):
    from leidenalg_spark.operators.kernels import clustering_coefficient

    # triangle + pendant: lcc = (1, 1, 1/3, 0) → mean 0.583333
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0), (3, 4, 1.0)],
        "src long, dst long, weight double",
    )
    cc = clustering_coefficient(spark, e).collect()
    import pytest

    got = sum(r.lcc for r in cc) / len(cc)
    assert got == pytest.approx((1 + 1 + 1 / 3 + 0) / 4, abs=1e-6)


def test_ltv_cohorts_goldens(spark):
    from leidenalg_spark.operators.events import ltv_cohorts

    ev = spark.createDataFrame(
        [
            # cohort week of Jan 1 2024 (Monday): user 1 spends 10 then 5
            (1, datetime(2024, 1, 1), 1, "purchase", 10.0, None),
            (2, datetime(2024, 1, 9), 1, "purchase", 5.0, None),
            # user 2, same cohort, only week 0
            (3, datetime(2024, 1, 2), 2, "purchase", 20.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {r.offset: r for r in ltv_cohorts(ev).collect()}
    assert got[0].n_active == 2 and got[0].bucket_value == 30.0
    assert got[0].cum_value_per_user == 15.0
    assert got[1].n_active == 1 and got[1].bucket_value == 5.0
    assert got[1].cum_value == 35.0
    # per-user LTV divides by the COHORT size, not the surviving count
    assert got[1].cum_value_per_user == 17.5


def test_truss_layers_goldens(spark):
    from leidenalg_spark.operators.kernels import truss_layers

    # K4 (every edge in 2 triangles → trussness 4) plus a pendant edge
    k4 = [(i, j, 1.0) for i in range(1, 5) for j in range(i + 1, 5)]
    e = spark.createDataFrame(
        k4 + [(4, 9, 1.0)], "src long, dst long, weight double"
    )
    got = {(r.a, r.b): r for r in truss_layers(spark, e).collect()}
    assert got[(4, 9)].trussness == 2  # no triangle through the pendant
    for a, b, _ in k4:
        assert got[(a, b)].trussness == 4
    # the pendant peels strictly before the K4 body
    assert got[(4, 9)].layer < got[(1, 2)].layer

    # triangle chain: the shared cascade — removing the outer wave at
    # t=3 leaves the middle triangle intact, trussness 3 everywhere
    tri = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0)], "src long, dst long, weight double"
    )
    rows = truss_layers(spark, tri).collect()
    assert all(r.trussness == 3 for r in rows)
