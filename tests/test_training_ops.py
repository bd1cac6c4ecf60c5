"""Training-data pipeline operators: dedup (exact/jaccard/minhash/simhash),
similarity search, multimodal plumbing — planted-duplicate correctness."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from leidenalg_spark.operators import dedup as D
from leidenalg_spark.operators import similarity as S
from leidenalg_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "a completely different sentence about spark partitions and shuffles",
        "numbers one two three four five six seven eight nine ten",
        "der schnelle braune fuchs springt heute nacht",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t))
    rows.append((10, base[0]))  # exact duplicate of doc 0
    rows.append((11, base[0].replace("tonight", "today")))  # near-dup of doc 0
    rows.append((12, base[2]))  # exact duplicate of doc 2
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])).persist()


def test_dedup_exact_planted(spark, docs):
    out = D.dedup_exact(docs).toPandas().set_index("doc_id")
    assert bool(out.loc[0, "is_kept"]) and not bool(out.loc[10, "is_kept"])
    assert bool(out.loc[2, "is_kept"]) and not bool(out.loc[12, "is_kept"])
    assert out.loc[0, "group_size"] == 2 and out.loc[10, "group_size"] == 2
    assert bool(out.loc[11, "is_kept"])  # near-dup is NOT an exact dup


def test_ngram_jaccard_finds_neardup(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.5).toPandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 10) in got  # exact dup -> jaccard 1.0
    assert (0, 11) in got  # near dup above 0.5
    assert (2, 12) in got
    assert not any({1, 3} & set(p) for p in got)  # unrelated docs absent


def test_repetition_stats_known_values(spark):
    from leidenalg_spark.operators import textops as T

    rows = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "a a a a b",               # top token 4/5; trigrams: aaa aaa aab abb? -> see below
            "one two three four five", # all distinct
            "",                        # degenerate
        ],
    })
    out = (
        T.repetition_stats(spark.createDataFrame(rows))
        .toPandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "top_token_frac"] == pytest.approx(0.8)
    # trigrams of doc 0: "a a a", "a a a", "a a b" -> 1 - 2/3
    assert out.loc[0, "dup_trigram_frac"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert out.loc[1, "top_token_frac"] == pytest.approx(0.2)
    assert out.loc[1, "dup_trigram_frac"] == 0.0
    assert out.loc[2, "n_tokens"] == 0
    assert out.loc[2, "top_token_frac"] == 0.0 and out.loc[2, "dup_trigram_frac"] == 0.0


def test_hash_split_deterministic_and_stable_under_append(spark):
    from leidenalg_spark.operators.sampling import hash_split

    rows = pd.DataFrame({"doc_id": range(2000), "text": "x"})
    df = spark.createDataFrame(rows)
    a = hash_split(df, seed=1).toPandas().set_index("doc_id")["split"]
    b = hash_split(df, seed=1).toPandas().set_index("doc_id")["split"]
    pd.testing.assert_series_equal(a, b)  # pure function of (id, seed)
    # appending rows must not reshuffle existing assignments
    more = spark.createDataFrame(pd.DataFrame({"doc_id": range(2000, 4000), "text": "y"}))
    c = hash_split(df.unionByName(more), seed=1).toPandas().set_index("doc_id")["split"]
    pd.testing.assert_series_equal(a, c.loc[a.index])
    # proportions roughly honoured (98/1/1 on 2000 ids)
    frac = a.value_counts(normalize=True)
    assert frac["train"] > 0.95 and frac.get("val", 0) < 0.05 and frac.get("test", 0) < 0.05
    # custom weights + different seed → different assignment
    d = hash_split(df, weights={"a": 1, "b": 1}, seed=2).toPandas()
    assert set(d["split"]) == {"a", "b"}
    assert 0.4 < (d["split"] == "a").mean() < 0.6
    with pytest.raises(ValueError):
        hash_split(df, weights={"a": -1.0, "b": 2.0})


def test_pack_sequences_two_pass_prefix_sum(spark):
    from leidenalg_spark.operators.sampling import pack_sequences

    # token counts 3,4,5,2,6,1 over sparse non-contiguous ids; capacity 8:
    # offsets 0,3,7,12,14,20 -> bins 0,0,0,1,1,2 (doc starts decide)
    rows = pd.DataFrame({
        "doc_id": [0, 1, 5, 9, 103, 207],
        "text": ["a b c", "a b c d", "a b c d e", "a b", "a b c d e f", "a"],
    })
    df = spark.createDataFrame(rows)
    # block=2 forces several blocks -> the broadcast-offset path is live
    out = (
        pack_sequences(df, capacity=8, block=2)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["start_offset"].tolist() == [0, 3, 7, 12, 14, 20]
    assert out["bin"].tolist() == [0, 0, 0, 1, 1, 2]
    # block size must not change the global result
    out_big = (
        pack_sequences(df, capacity=8, block=1 << 20)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out_big)
    with pytest.raises(ValueError):
        pack_sequences(df, capacity=0)


def test_stratified_sample_per_stratum_fractions(spark):
    from leidenalg_spark.operators.sampling import stratified_sample

    rows = pd.DataFrame({
        "doc_id": range(3000),
        "lang": ["en", "de", "fr"] * 1000,
    })
    df = spark.createDataFrame(rows)
    out = stratified_sample(df, {"en": 0.5, "de": 0.1}, strata_col="lang", seed=3).toPandas()
    n = out["lang"].value_counts()
    assert "fr" not in n  # absent strata keep nothing
    assert 400 < n["en"] < 600 and 50 < n["de"] < 160
    # global-fraction form, deterministic across calls
    g1 = stratified_sample(df, 0.25, seed=4).toPandas()["doc_id"]
    g2 = stratified_sample(df, 0.25, seed=4).toPandas()["doc_id"]
    assert set(g1) == set(g2) and 600 < len(g1) < 900


def test_decontaminate_flags_ngram_overlap(spark, docs):
    # benchmark = doc 0's text: docs 0 (itself), 10 (exact dup) and 11
    # (near-dup sharing 5-grams) are contaminated; 1/2/3/12 are clean
    bench = docs.where(F.col("doc_id") == 0)
    out = D.decontaminate(docs, bench, n=5).toPandas().set_index("doc_id")
    assert bool(out.loc[0, "contaminated"]) and bool(out.loc[10, "contaminated"])
    assert bool(out.loc[11, "contaminated"])  # shares leading 5-grams
    for clean in (1, 2, 3, 12):
        assert not bool(out.loc[clean, "contaminated"]), clean
    assert out.loc[0, "n_hits"] == out.loc[10, "n_hits"] > 0
    assert 0 < out.loc[11, "n_hits"] < out.loc[0, "n_hits"]
    # every training doc appears exactly once, hit or not
    assert len(out) == docs.count()


def test_minhash_lsh_matches_exact_jaccard(spark, docs):
    exact = D.ngram_jaccard_pairs(docs, n=3, threshold=0.6).toPandas()
    lsh = D.minhash_dedup_pairs(docs, n=3, num_hashes=32, bands=16, threshold=0.6).toPandas()
    e = {(int(a), int(b)) for a, b in zip(exact["a"], exact["b"])}
    l = {(int(a), int(b)) for a, b in zip(lsh["a"], lsh["b"])}
    # LSH candidates are verified with exact jaccard -> subset; with 16
    # bands of 2 rows recall at j>=0.6 is ~1 on this tiny corpus
    assert l == e
    # and the jaccard values agree where present
    m = exact.merge(lsh, on=["a", "b"], suffixes=("_e", "_l"))
    assert np.allclose(m["jaccard_e"], m["jaccard_l"])


def test_simhash_deterministic_and_discriminative(spark, docs):
    sh = D.simhash(docs).toPandas().set_index("doc_id")["simhash"]
    assert sh.loc[0] == sh.loc[10]  # identical docs -> identical signature
    ham = bin(np.uint64(sh.loc[0]) ^ np.uint64(sh.loc[11])).count("1")
    ham_far = bin(np.uint64(sh.loc[0]) ^ np.uint64(sh.loc[1])).count("1")
    assert ham < ham_far  # near-dup closer than unrelated doc
    cands = D.simhash_candidates(D.simhash(docs), band_bits=16).toPandas()
    got = {(int(a), int(b)) for a, b in zip(cands["a"], cands["b"])}
    assert (0, 10) in got


def test_embedding_knn_and_lsh_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    exact = S.cosine_topk(emb, q, k=10).toPandas()
    assert set(exact["query_id"]) == set(range(5))
    assert (exact.groupby("query_id").size() == 10).all()
    # ranks ordered by descending cosine
    for _, grp in exact.groupby("query_id"):
        cs = grp.sort_values("rank")["cos_sim"].to_numpy()
        assert (np.diff(cs) <= 1e-9).all()
    approx = S.lsh_cosine_topk(emb, q, k=10, n_planes=4, seed=1).toPandas()
    # approximate scores must agree with the exact cosine wherever a pair
    # appears in both result sets, and each query finds its own bucket
    both = exact.merge(approx, on=["query_id", "neighbor_id"], suffixes=("_e", "_a"))
    assert len(both) >= 1
    assert np.allclose(both["cos_sim_e"], both["cos_sim_a"], atol=1e-6)
    top1 = exact[exact["rank"] == 1][["query_id", "neighbor_id"]]
    hit = top1.merge(approx, on=["query_id", "neighbor_id"], how="inner")
    assert len(hit) >= 1  # probabilistic but stable for the fixed seed


def test_embedding_neardup_pairs(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # plant a duplicate vector
    dup = emb.where(F.col("vec_id") == 0).select(
        F.lit(9999).cast("long").alias("vec_id"), "embedding", "label"
    )
    pairs = S.embedding_neardup_pairs(emb.unionByName(dup), threshold=0.999).toPandas()
    assert ((pairs["a"] == 0) & (pairs["b"] == 9999)).any()


def test_ivf_assignment_partitions_space(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cells = S.ivf_assign(emb, n_cells=8, seed=3).groupBy("cell").count().toPandas()
    assert cells["count"].sum() == emb.count()
    assert len(cells) > 1  # vectors actually spread over cells


def test_ivf_topk_recall_and_exact_degenerate(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    exact = S.cosine_topk(emb, q, k=5).toPandas()
    # n_probe == n_cells probes every cell → identical to exact search
    full = S.ivf_topk(emb, q, k=5, n_cells=4, n_probe=4, seed=3).toPandas()
    e = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    f = full.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (e["neighbor_id"].to_numpy() == f["neighbor_id"].to_numpy()).all()
    assert np.allclose(e["cos_sim"], f["cos_sim"], atol=1e-6)
    # pruned probing: scores agree with exact cosine wherever pairs overlap
    approx = S.ivf_topk(emb, q, k=5, n_cells=8, n_probe=2, seed=3).toPandas()
    assert (approx.groupby("query_id").size() <= 5).all()
    both = exact.merge(approx, on=["query_id", "neighbor_id"], suffixes=("_e", "_a"))
    assert len(both) >= 1
    assert np.allclose(both["cos_sim_e"], both["cos_sim_a"], atol=1e-6)


def test_multimodal_features_and_stub(spark):
    media = M.synthetic_media(spark, 60)
    feats = M.extract_features(media).toPandas()
    assert len(feats) == 60
    assert set(feats["media_type"]) <= {"image", "audio", "video"}
    assert (feats["n_bytes"] > 0).all()
    assert feats["feature"].map(len).eq(8).all()
    # deterministic: same input -> same checksums
    feats2 = M.extract_features(M.synthetic_media(spark, 60)).toPandas()
    pd.testing.assert_series_equal(
        feats.sort_values("media_id")["checksum"].reset_index(drop=True),
        feats2.sort_values("media_id")["checksum"].reset_index(drop=True),
    )
    # real decode of a type with no importable decoder still raises with
    # a clear message (video needs pyav; the synthetic payloads include it)
    if "video" not in M.available_decoders():
        with pytest.raises(Exception):
            M.extract_features(media, decode_real=True).collect()


def test_real_audio_decode_wav_stdlib(spark):
    """decode_real=True over genuine WAV payloads through the stdlib
    ``wave`` decoder — the optional-extra path exercised for real (no
    external codec needed for RIFF/PCM)."""
    if "audio" not in M.available_decoders():
        pytest.skip("no audio decoder importable")
    import io
    import math
    import struct
    import wave as wavemod

    def make_wav(freq, n=800, rate=8000):
        buf = io.BytesIO()
        with wavemod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(
                b"".join(
                    struct.pack("<h", int(20000 * math.sin(2 * math.pi * freq * i / rate)))
                    for i in range(n)
                )
            )
        return buf.getvalue()

    rows = [(i, "audio", make_wav(200 + 100 * i), 0, 0, 100) for i in range(6)]
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, payload binary, width long, "
        "height long, duration_ms long",
    )
    feats = M.extract_features(media, decode_real=True).toPandas()
    assert len(feats) == 6
    assert feats["feature"].map(len).eq(8).all()
    f = np.array(feats.sort_values("media_id")["feature"].tolist())
    # a real sine decode: near-zero mean, stddev ~ amplitude/sqrt(2)
    assert np.all(np.abs(f[:, 0]) < 0.05)
    assert np.all((f[:, 1] > 0.3) & (f[:, 1] < 0.6))


def test_real_image_decode_if_pillow_available(spark):
    if "image" not in M.available_decoders():
        pytest.skip("pillow not importable in this environment")
    import io

    import PIL.Image

    def make_png(v):
        img = PIL.Image.new("L", (16, 16), color=v)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [(i, "image", make_png(i * 40), 16, 16, 0) for i in range(4)]
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, payload binary, width long, "
        "height long, duration_ms long",
    )
    feats = M.extract_features(media, decode_real=True).toPandas()
    f = np.array(feats.sort_values("media_id")["feature"].tolist())
    assert np.allclose(f[:, 0], [0.0, 40 / 255, 80 / 255, 120 / 255], atol=1e-3)


def test_feature_dims_uniform_across_decoders():
    """ADVICE r3: every decoder path — real image/audio/video and the
    deterministic fake — returns the SAME 8-dim moment vector, so a
    mixed-type corpus can never yield ragged feature arrays."""
    from leidenalg_spark.operators.multimodal import _decode_stub, available_decoders

    for t in ("image", "audio", "video"):
        assert len(_decode_stub(b"\x01\x02\x03", t, False)) == 8
    if "image" in available_decoders():
        import io

        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.new("L", (16, 16), color=7).save(buf, format="PNG")
        assert len(_decode_stub(buf.getvalue(), "image", True, available_decoders())) == 8


def test_frame_sample_plan(spark):
    media = M.synthetic_media(spark, 40)
    plan = M.frame_sample_plan(media, every_ms=500).toPandas()
    vids = media.where(F.col("media_type") == "video").toPandas()
    expected = int((vids["duration_ms"] // 500 + 1).sum())
    assert len(plan) == expected


def test_dedup_exact_null_text_not_dropped(spark):
    """Regression: md5(NULL) is NULL and the fingerprint equi-join never
    matches null keys, so NULL-text docs silently vanished."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["same", "same", None]}),
        "doc_id long, text string",
    )
    got = D.dedup_exact(docs).toPandas().set_index("doc_id")
    assert sorted(got.index) == [1, 2, 3]   # nobody dropped
    assert bool(got.loc[3, "is_kept"])      # its own (empty) group
    assert int(got.loc[3, "group_size"]) == 1


def test_minhash_lsh_rejects_bands_beyond_signature(spark, docs):
    """Regression: bands > len(sig) sliced past the signature, giving
    every doc the md5('') band key — an all-pairs cross join."""
    sigs = D.minhash_signatures(docs, num_hashes=4)
    with pytest.raises(ValueError, match="bands"):
        D.minhash_lsh_candidates(sigs, bands=8)


def test_clean_text_strips_and_counts(spark):
    from leidenalg_spark.operators.textops import clean_text

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": [
                "Visit https://example.com/page now or mail a.b@test.org  thanks",
                "plain  text\twith\x01control chars",
                None,
                "a b",
            ],
        }),
        "doc_id long, text string",
    )
    out = clean_text(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "clean_text"] == "Visit now or mail thanks"
    assert int(out.loc[0, "n_urls"]) == 1 and int(out.loc[0, "n_emails"]) == 1
    assert out.loc[1, "clean_text"] == "plain text with control chars"
    assert out.loc[2, "clean_text"] == "" and int(out.loc[2, "n_chars_removed"]) == 0
    assert int(out.loc[3, "n_chars_removed"]) == 0  # already clean


def test_top_ngrams_counts_and_order(spark):
    from leidenalg_spark.operators.textops import top_ngrams

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": ["a b a b c", "a b x", "z"],  # doc 2 too short for bigrams? no: 1 token
        }),
        "doc_id long, text string",
    )
    out = top_ngrams(docs, n=2, k=3).toPandas()
    # "a b" appears 3 times across 2 docs; ties broken by ngram asc
    assert list(out["ngram"])[0] == "a b"
    assert int(out.loc[0, "count"]) == 3 and int(out.loc[0, "n_docs"]) == 2
    assert len(out) == 3
    uni = top_ngrams(docs, n=1, k=2).toPandas()
    assert list(uni["ngram"]) == ["a", "b"]  # 3 each, alphabetical tiebreak


def test_mixture_sample_temperature_flattening(spark):
    from leidenalg_spark.operators.sampling import mixture_sample, mixture_weights

    # T=1 keeps raw ratios (dominant source = 1.0); T→∞ flattens to 1.0
    w = {"big": 9.0, "small": 1.0}
    assert mixture_weights(w, 1.0) == {"big": 1.0, "small": pytest.approx(1 / 9)}
    f2 = mixture_weights(w, 2.0)
    assert f2["big"] == 1.0 and f2["small"] == pytest.approx(1 / 3)
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, "big").otherwise("small").alias("source"),
    )
    got = mixture_sample(df, w, temperature=2.0).groupBy("source").count().toPandas()
    counts = dict(zip(got["source"], got["count"]))
    assert counts["big"] == 1000                       # dominant kept in full
    assert abs(counts["small"] - 333) < 60             # hash-approximate 1/3
    # determinism + append stability: same rows kept on a prefix
    a = set(r.doc_id for r in mixture_sample(df.where("doc_id < 500"), w, temperature=2.0).collect())
    b = set(r.doc_id for r in mixture_sample(df, w, temperature=2.0).collect())
    assert a == {x for x in b if x < 500}
    with pytest.raises(ValueError):
        mixture_weights(w, 0.0)


def test_bm25_scores_and_nulls(spark):
    import math

    from leidenalg_spark.operators.textops import bm25_score

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": ["spark join spark", "join window", None, "plain words only here"],
        }),
        "doc_id long, text string",
    )
    out = bm25_score(docs, ["spark", "join"]).toPandas().set_index("doc_id")
    # doc 2 (NULL) and doc 3 (no hits) are absent; doc 0 hits both terms
    assert set(out.index) == {0, 1}
    assert int(out.loc[0, "n_hits"]) == 2 and int(out.loc[1, "n_hits"]) == 1
    # hand-computed: N=4, avgdl=(3+2+0+4)/4=2.25
    k1, b = 1.2, 0.75
    idf_spark = math.log((4 - 1 + 0.5) / (1 + 0.5) + 1.0)
    idf_join = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    norm0 = k1 * (1 - b + b * 3 / 2.25)
    exp0 = idf_spark * 2 * (k1 + 1) / (2 + norm0) + idf_join * 1 * (k1 + 1) / (1 + norm0)
    assert abs(out.loc[0, "bm25"] - round(exp0, 6)) < 2e-6
    with pytest.raises(ValueError):
        bm25_score(docs, [])


def test_tfidf_top_terms_rank_and_ties(spark):
    import math

    from leidenalg_spark.operators.textops import tfidf_top_terms

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": ["common rare rare", "common alpha beta", "common"],
        }),
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2).toPandas()
    d0 = out[out.doc_id == 0].sort_values("pos")
    # "rare" (tf=2, df=1) dominates; "common" idf = ln(3/3) = 0
    assert list(d0["term"]) == ["rare", "common"]
    assert abs(d0.iloc[0]["tfidf"] - round(2 * math.log(3.0), 6)) < 1e-9
    assert d0.iloc[1]["tfidf"] == 0.0
    d1 = out[out.doc_id == 1].sort_values("pos")
    # alpha/beta tie at ln(3); alphabetical tie-break
    assert list(d1["term"]) == ["alpha", "beta"]
    with pytest.raises(ValueError):
        tfidf_top_terms(docs, k=0)


def test_pii_mask_patterns_and_counts(spark):
    from leidenalg_spark.operators.textops import pii_mask

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": [
                "mail a.b+spam@test.org or call +1-555-0100-77 now",
                "server at 192.168.0.1 port 8080",
                None,
                "clean text no pii",
            ],
        }),
        "doc_id long, text string",
    )
    out = pii_mask(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "masked_text"] == "mail [EMAIL] or call [PHONE] now"
    assert int(out.loc[0, "n_emails"]) == 1 and int(out.loc[0, "n_phones"]) == 1
    assert out.loc[1, "masked_text"] == "server at [IP] port 8080"
    assert int(out.loc[1, "n_ips"]) == 1 and int(out.loc[1, "n_phones"]) == 0
    assert out.loc[2, "masked_text"] == ""
    assert out.loc[3, "masked_text"] == "clean text no pii"
    assert (out[["n_emails", "n_ips", "n_phones"]].loc[3] == 0).all()


def test_neardup_dedup_transitive_collapse(spark):
    # chain: 0 ~ 1 (share most shingles), 1 ~ 2, but 0 !~ 2 at the
    # threshold — the CC step must still collapse {0,1,2} to one keeper
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "alpha beta gamma delta epsilon zeta eta theta omega psi"
    c = "gamma delta epsilon zeta eta theta omega psi chi phi"
    rows = [(0, a), (1, b), (2, c), (7, "totally unrelated words about spark")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.4).toPandas()
    got = {(int(x), int(y)) for x, y in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in got and (1, 2) in got and (0, 2) not in got, got

    out = D.neardup_dedup(spark, docs, n=3, threshold=0.4).toPandas().set_index("doc_id")
    assert out.loc[0, "canonical_id"] == 0 and bool(out.loc[0, "is_kept"])
    assert out.loc[1, "canonical_id"] == 0 and not bool(out.loc[1, "is_kept"])
    assert out.loc[2, "canonical_id"] == 0 and not bool(out.loc[2, "is_kept"])
    assert out.loc[7, "canonical_id"] == 7 and bool(out.loc[7, "is_kept"])
    assert len(out) == 4


def test_pmi_cooccurrence_hand_computed(spark):
    import math
    from leidenalg_spark.operators import textops as T

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "a b d"]})
    )
    out = T.pmi_cooccurrence(docs, window=1, min_pairs=1).toPandas()
    got = {(r.a, r.b): (r.n_ab, r.pmi) for r in out.itertuples()}
    # pairs: (a,b)x2, (b,c), (b,d); N_pair=4, N_tok=6, occ a=2 b=2 c=1 d=1
    assert set(got) == {("a", "b"), ("b", "c"), ("b", "d")}
    assert got[("a", "b")][0] == 2 and got[("b", "c")][0] == 1
    # pmi(a,b) = ln((2/4)/((2/6)*(2/6))) = ln(4.5); same value for (b,c)
    assert abs(got[("a", "b")][1] - round(math.log(4.5), 6)) < 2e-6
    assert abs(got[("b", "c")][1] - round(math.log(4.5), 6)) < 2e-6

    # window=2 additionally pairs (a,c) and (a,d)
    out2 = T.pmi_cooccurrence(docs, window=2, min_pairs=1).toPandas()
    assert set(zip(out2["a"], out2["b"])) == {
        ("a", "b"), ("b", "c"), ("b", "d"), ("a", "c"), ("a", "d")
    }

    # min_pairs filters the singletons but totals still count them
    out3 = T.pmi_cooccurrence(docs, window=1, min_pairs=2).toPandas()
    assert set(zip(out3["a"], out3["b"])) == {("a", "b")}
    assert abs(out3["pmi"].iloc[0] - round(math.log(4.5), 6)) < 2e-6

    # frequency cap drops stopword-grade tokens; window is measured on
    # ORIGINAL positions, so survivors separated by a dropped token at
    # distance > window do not pair
    out4 = T.pmi_cooccurrence(docs, window=1, min_pairs=1, max_token_freq=1).toPandas()
    assert len(out4) == 0


def test_training_set_each_filter_bites(spark):
    from leidenalg_spark.operators.pipeline import training_set

    good = ("the quick brown fox jumps over the lazy dog and then the "
            "dog is of the opinion that it is time to sleep in the sun "
            "and the fox agrees to it so they rest together in peace")
    rows = [
        (0, good),                      # survives everything
        (17, good),                     # exact dup of 0 -> not keeper
        (2, "der schnelle braune fuchs springt und die katze ist nicht da "
            "und das ist der ganze satz der hier steht und nicht endet"),  # de
        (3, "!!! ??? ... ,,, ;;; :::"),  # quality floor
        (4, good + " benchmark marker"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    # doc 4 is "benchmark": its 5-grams contaminate docs sharing them
    bench = docs.where(F.col("doc_id") == 4)
    out = training_set(docs, bench, min_quality=0.5, langs=("en",)).toPandas()
    kept = set(out["doc_id"])
    # 0 shares 5-grams with the benchmark doc 4 -> contaminated; so is 4
    # itself and dup 17; 2 is German; 3 is junk -> nothing survives...
    assert kept == set(), kept

    # ...but without the contamination screen, 0 survives (17 is a dup,
    # 2 wrong lang, 3 junk, 4 is its own benchmark)
    empty_bench = docs.where(F.lit(False))
    out2 = training_set(docs, empty_bench, min_quality=0.5, langs=("en",)).toPandas()
    assert set(out2["doc_id"]) == {0, 4}
    assert (out2["lang_pred"] == "en").all()
    assert (out2["quality_score"] >= 0.5).all()


def test_embedding_covariance_and_pca_match_numpy(spark):
    rng = np.random.default_rng(9)
    n, d = 80, 6
    X = rng.normal(size=(n, d)) @ np.diag([3.0, 2.0, 1.0, 0.5, 0.2, 0.1])
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": [[float(x) for x in row] for row in X],
    }))
    cov = S.embedding_covariance(emb).toPandas()
    C = np.cov(X, rowvar=False, bias=True)  # population covariance
    assert len(cov) == d * (d + 1) // 2
    for r in cov.itertuples():
        assert abs(r.cov - round(C[r.i, r.j], 6)) < 2e-6, (r.i, r.j)

    # PCA: centered scores against a numpy reference with the same
    # largest-|entry|-positive sign convention
    k = 3
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for c in range(k):
        if comps[c][np.argmax(np.abs(comps[c]))] < 0:
            comps[c] = -comps[c]
    exp = (X - X.mean(0)) @ comps.T  # (n, k)
    got = (
        S.embedding_pca(spark, emb, k=k).toPandas()
        .pivot(index="vec_id", columns="comp", values="score")
        .sort_index().to_numpy()
    )
    assert np.allclose(got, np.round(exp, 6), atol=5e-6)


def test_duplicate_spans_planted_boilerplate(spark):
    from leidenalg_spark.operators.dedup import duplicate_spans

    boiler = "all rights reserved contact us today"   # 6 tokens
    rows = [
        ("a", f"alpha beta gamma {boiler}"),          # 9 tokens, 6 dup
        ("b", f"{boiler} delta epsilon zeta eta"),     # 10 tokens, 6 dup
        ("c", "totally unique text with no duplicated span at all"),
        ("d", "tiny"),                                 # < k tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in duplicate_spans(docs, k=5, min_docs=2).collect()}
    # the 6-token boilerplate contributes two overlapping 5-grams in each doc
    assert out["a"]["n_dup_grams"] == 2 and out["b"]["n_dup_grams"] == 2
    assert out["a"]["dup_tokens"] == 6 and out["b"]["dup_tokens"] == 6
    assert abs(out["a"]["dup_frac"] - 6 / 9) < 1e-6
    assert abs(out["b"]["dup_frac"] - 6 / 10) < 1e-6
    assert out["c"]["n_dup_grams"] == 0 and out["c"]["dup_frac"] == 0.0
    assert out["d"]["n_tokens"] == 1 and out["d"]["dup_frac"] == 0.0


def test_bpe_pair_counts_vocabulary_weighted(spark):
    from leidenalg_spark.operators.textops import bpe_pair_counts

    docs = spark.createDataFrame(
        [("a", "aaa bb"), ("b", "aaa")], "doc_id string, text string"
    )
    out = {r["pair"]: r for r in bpe_pair_counts(docs, k=10).collect()}
    # 'aaa' occurs twice, contributes two 'aa' slots each -> count 4
    assert out["aa"]["count"] == 4 and out["aa"]["n_words"] == 2
    assert out["bb"]["count"] == 1 and out["bb"]["n_words"] == 1
    assert set(out) == {"aa", "bb"}


def test_importance_sample_prefers_heavy_weights_and_is_stable(spark):
    from leidenalg_spark.operators.sampling import importance_sample

    rows = [(i, "x " * (1000 if i < 5 else 1)) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = importance_sample(docs, n=10, weight=F.length("text") + 1, seed=42)
    picked = {r["doc_id"] for r in out.collect()}
    # the 5 heavy docs (weight ~2001 vs ~3) are near-certain picks
    assert {0, 1, 2, 3, 4} <= picked and len(picked) == 10
    # retry-stability: same seed, same rows -> identical selection
    again = {r["doc_id"] for r in importance_sample(
        docs, n=10, weight=F.length("text") + 1, seed=42).collect()}
    assert picked == again
    # append-stability: adding light rows never evicts by key change
    more = docs.union(spark.createDataFrame(
        [(i, "y") for i in range(100, 120)], "doc_id long, text string"))
    keys_old = {r["doc_id"]: r["sample_key"] for r in out.collect()}
    keys_new = {
        r["doc_id"]: r["sample_key"]
        for r in importance_sample(more, n=10, weight=F.length("text") + 1, seed=42).collect()
    }
    for d in set(keys_old) & set(keys_new):
        assert keys_old[d] == keys_new[d]


def test_importance_sample_drops_nonpositive_weights(spark):
    from leidenalg_spark.operators.sampling import importance_sample

    docs = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)], "doc_id long, w double"
    )
    picked = {r["doc_id"] for r in importance_sample(docs, n=4, weight="w").collect()}
    assert picked == {1, 4}


def test_vocab_coverage_golden(spark):
    from leidenalg_spark.operators.textops import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b x")], "doc_id long, text string"
    )
    rows = {r.rank: (r.token, r.cnt, r.coverage) for r in vocab_coverage(docs, k=3).collect()}
    # 9 tokens total: a=4, b=3, c=1, x=1 (tie broken to 'c' first)
    assert rows == {
        1: ("a", 4, round(4 / 9, 6)),
        2: ("b", 3, round(7 / 9, 6)),
        3: ("c", 1, round(8 / 9, 6)),
    }


def test_filter_funnel_golden(spark):
    from leidenalg_spark.operators.textops import filter_funnel

    good = "the cat and the dog is in the house and it is warm " * 5
    docs = spark.createDataFrame(
        [(1, good), (2, good), (3, "short"), (4, "x" * 200)],
        "doc_id long, text string",
    )
    rows = {r.stage: (r.stage_idx, r.n_docs, r.frac_of_total)
            for r in filter_funnel(docs, min_chars=50, max_chars=1000).collect()}
    # doc3 fails length; doc4 passes length but has no stopwords/length
    # signal -> fails quality; docs 1,2 pass everything but are identical
    assert rows["total"] == (0, 4, 1.0)
    assert rows["length"] == (1, 3, 0.75)
    assert rows["quality"] == (2, 2, 0.5)
    assert rows["dedup"] == (3, 1, 0.25)


def test_cross_source_dupes_golden(spark):
    from leidenalg_spark.operators.dedup import cross_source_dupes

    docs = spark.createDataFrame(
        [
            (1, "aaa", "s1"), (2, "aaa", "s2"), (3, "aaa", "s3"),
            (4, "bbb", "s1"), (5, "bbb", "s2"), (6, "bbb", "s1"),
            (7, "ccc", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    got = {(r.source_a, r.source_b): r.n_shared_texts
           for r in cross_source_dupes(docs).collect()}
    assert got == {("s1", "s2"): 2, ("s1", "s3"): 1, ("s2", "s3"): 1}


def test_vocab_growth_prefix_golden(spark):
    from leidenalg_spark.operators.textops import vocab_growth

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "a e"), (4, "f f f")],
        "doc_id long, text string",
    )
    rows = {r.point: (r.n_docs, r.n_tokens, r.n_types)
            for r in vocab_growth(docs, n_points=4).collect()}
    assert rows == {1: (1, 3, 3), 2: (2, 6, 4), 3: (3, 8, 5), 4: (4, 11, 6)}


def test_textrank_keywords_goldens(spark):
    from leidenalg_spark.operators.textops import textrank_keywords

    # hub word "spark" bridges every sentence: it must rank first
    docs = spark.createDataFrame(
        [
            (1, "spark joins tables"),
            (2, "spark shuffles data"),
            (3, "spark broadcasts data"),
            (4, "tables hold data"),
        ],
        "doc_id long, text string",
    )
    out = textrank_keywords(spark, docs, top_k=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    # "spark" and "data" are the two degree-3 hubs bridging sentences
    assert {out[0].token, out[1].token} == {"spark", "data"}
    # the two hubs tie exactly (isomorphic neighbourhoods) and beat #3;
    # the tie breaks on token, so ordering is still deterministic
    assert out[0].score == out[1].score > out[2].score > 0

    # determinism: same input, same full result
    again = textrank_keywords(spark, docs, top_k=3).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_source_divergence_goldens(spark):
    from leidenalg_spark.operators.textops import source_divergence

    docs = spark.createDataFrame(
        [
            (1, "a b c", "web"),
            (2, "a b c", "chat"),       # identical mixture to web
            (3, "x y z", "code"),       # disjoint vocabulary
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source_a, r.source_b): r for r in source_divergence(docs).collect()
    }
    # identical unigram mixtures → JS 0
    assert got[("chat", "web")].js_divergence == 0.0
    assert got[("chat", "web")].shared_tokens == 3
    # disjoint vocabularies → JS 1 bit (maximum), distance 1
    assert got[("chat", "code")].js_divergence == 1.0
    assert got[("chat", "code")].js_distance == 1.0
    assert got[("chat", "code")].shared_tokens == 0
    assert got[("code", "web")].js_divergence == 1.0


def test_bigram_lm_score_goldens(spark):
    import math

    from leidenalg_spark.operators.textops import bigram_lm_score

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # stereotypical bigrams
            (2, "b a b a b a"),   # same vocabulary, same chains
            (3, "a a b b a b"),   # scrambled: rarer bigrams
            (4, ""),              # degenerate
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    # word salad scores strictly worse than stereotypical text
    assert got[3].mean_logp < got[1].mean_logp
    assert got[3].perplexity > got[1].perplexity
    assert got[4].n_tokens == 0 and got[4].mean_logp == 0.0 and got[4].perplexity == 1.0
    assert got[1].n_tokens == 6
    # perplexity really is exp(-mean_logp)
    assert abs(got[1].perplexity - math.exp(-got[1].mean_logp)) < 1e-5


# ---------------------------------------------------------- round-2 additions
def test_jaccard_prefix_equals_uncapped_exact_join(spark, docs):
    """Prefix filtering is LOSSLESS: output == the uncapped exact join at
    the same threshold (same pairs, same rounded jaccard values)."""
    for t in (0.3, 0.8):
        exact = {
            (r.a, r.b): r.jaccard
            for r in D.ngram_jaccard_pairs(
                docs, n=3, threshold=t, max_shingle_freq=None
            ).collect()
        }
        pref = {
            (r.a, r.b): r.jaccard
            for r in D.jaccard_prefix_pairs(docs, n=3, threshold=t).collect()
        }
        assert pref == exact and len(exact) > 0


def test_jaccard_prefix_hub_shingle_no_spurious_pairs(spark):
    """A shingle shared by EVERY doc lands at the end of the frequency
    order (outside most prefixes) and must neither create spurious pairs
    nor lose the planted near-dup."""
    hub = "common common common"
    rows = [
        (0, f"alpha beta gamma delta epsilon {hub}"),
        (1, f"alpha beta gamma delta zeta {hub}"),       # near-dup of 0
        (2, f"one two three four five {hub}"),
        (3, f"six seven eight nine ten {hub}"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.a, r.b): r.jaccard for r in D.jaccard_prefix_pairs(d, n=3, threshold=0.3).collect()}
    exact = {
        (r.a, r.b): r.jaccard
        for r in D.ngram_jaccard_pairs(d, n=3, threshold=0.3, max_shingle_freq=None).collect()
    }
    assert got == exact
    assert (0, 1) in got and all(p == (0, 1) for p in got)


def test_hard_negatives_planted_geometry(spark):
    """Anchor [1,0,0,0]: nearest same-label vec must NOT appear; the
    nearest different-label vec must be rank 1."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # anchor
        (1, [0.99, 0.14, 0.0, 0.0], 0),  # same label, closest overall
        (2, [0.9, 0.43, 0.0, 0.0], 1),   # different label, closest negative
        (3, [0.0, 1.0, 0.0, 0.0], 1),
        (4, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = S.hard_negatives(emb, emb.where(F.col("vec_id") == 0), k=3).collect()
    assert all(r.query_id == 0 for r in out)
    assert all(r.neighbor_label != 0 for r in out)       # no same-label rows
    ranks = {r.rank: r.neighbor_id for r in out}
    assert ranks[1] == 2 and ranks[2] == 3 and ranks[3] == 4
    assert len(out) == 3


def test_k_anonymity_class_sizes(spark):
    from leidenalg_spark.operators.sampling import k_anonymity

    rows = [(i, "a", "en") for i in range(5)] + [(9, "a", "de"), (10, "b", "en"), (11, "b", "en")]
    df = spark.createDataFrame(rows, "id long, source string, lang string")
    got = {(r.source, r.lang): (r.class_size, r.meets_k) for r in k_anonymity(df, ["source", "lang"], k=3).collect()}
    assert got == {("a", "en"): (5, True), ("a", "de"): (1, False), ("b", "en"): (2, False)}


def test_calibration_curve_perfect_and_clipped(spark):
    from leidenalg_spark.operators.events import calibration_curve

    rows = []
    # bin 2 (scores 0.25): 4 rows, 1 positive -> pos_rate 0.25, gap 0
    rows += [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0)]
    # bin 7 (scores 0.75): 4 rows, 3 positive -> gap 0
    rows += [(0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)]
    # score exactly 1.0 clips into bin 9, not bin 10
    rows += [(1.0, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r.bin: r for r in calibration_curve(df, bins=10).collect()}
    assert set(got) == {2, 7, 9}
    assert got[2].n == 4 and got[2].pos_rate == 0.25 and got[2].abs_gap == 0.0
    assert got[7].pos_rate == 0.75 and got[7].abs_gap == 0.0
    assert got[9].n == 1 and got[9].mean_score == 1.0 and got[9].pos_rate == 1.0


def test_source_minhash_overlap_exact_when_union_fits(spark):
    """Unions under k make the KMV estimate exact: token sets
    {a,b,c,d} vs {a,b,x} → J = 2/5."""
    from leidenalg_spark.operators.dedup import source_minhash_overlap

    docs = spark.createDataFrame(
        [(0, "a b c d", "A"), (1, "a b x", "B")],
        "doc_id long, text string, source string",
    )
    r = source_minhash_overlap(docs, n=1, k=128).collect()[0]
    assert (r.source_a, r.source_b) == ("A", "B")
    assert r.k_used == 5 and r.n_inter == 2
    assert abs(r.est_jaccard - 0.4) < 1e-6


def test_source_minhash_overlap_sketch_bounded(spark):
    """k smaller than the union: k_used caps at k and the estimate stays
    in [0, 1]."""
    from leidenalg_spark.operators.dedup import source_minhash_overlap

    docs = spark.createDataFrame(
        [(0, " ".join(f"tok{i}" for i in range(60)), "A"),
         (1, " ".join(f"tok{i}" for i in range(30, 90)), "B")],
        "doc_id long, text string, source string",
    )
    r = source_minhash_overlap(docs, n=1, k=16).collect()[0]
    assert r.k_used == 16
    assert 0.0 <= r.est_jaccard <= 1.0


def test_l_diversity_flags_homogeneous_class(spark):
    from leidenalg_spark.operators.sampling import l_diversity

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("b", 1), ("b", 2)],
        "quasi string, sensitive int",
    )
    out = {r.quasi: r for r in l_diversity(df, ["quasi"], "sensitive", l=2).collect()}
    assert out["a"].class_size == 3 and out["a"].n_sensitive == 1 and not out["a"].meets_l
    assert out["b"].n_sensitive == 2 and out["b"].meets_l


def test_winnowing_identical_docs_share_all_fingerprints(spark):
    """Identical texts produce identical fingerprint sets; a disjoint
    text shares none; fingerprint volume ≤ window count."""
    from leidenalg_spark.operators.dedup import (
        winnowing_fingerprints, winnowing_pairs,
    )

    t = " ".join(f"w{i % 7}x{i % 3}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, t), (2, t), (3, other)], "doc_id long, text string"
    )
    fps = winnowing_fingerprints(docs).groupBy("doc_id").count().collect()
    n_fp = {r.doc_id: r["count"] for r in fps}
    assert n_fp[1] == n_fp[2] and 0 < n_fp[1] <= 40 - 5 + 1
    pairs = {(r.doc_a, r.doc_b): r.n_shared for r in
             winnowing_pairs(docs, min_shared=1).collect()}
    assert set(pairs) == {(1, 2)} and pairs[(1, 2)] == n_fp[1]


def test_winnowing_guarantee_on_planted_overlap(spark):
    """A shared run of ≥ k+w−1 tokens must yield ≥ 1 shared fingerprint."""
    from leidenalg_spark.operators.dedup import winnowing_pairs

    shared = " ".join(f"s{i}" for i in range(10))  # 10 > 5+4-1
    docs = spark.createDataFrame(
        [(1, "a b c d e f " + shared), (2, shared + " q r s t u v")],
        "doc_id long, text string",
    )
    pairs = winnowing_pairs(docs, min_shared=1).collect()
    assert len(pairs) == 1 and pairs[0].n_shared >= 1


def test_disparate_impact_four_fifths_rule(spark):
    from leidenalg_spark.operators.sampling import disparate_impact
    from pyspark.sql import functions as F

    rows = [("A", i < 8) for i in range(10)] + [("B", i < 2) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, kept boolean")
    out = {r.grp: r for r in disparate_impact(df, "grp", "kept").collect()}
    assert out["A"].rate == 0.8 and out["A"].impact_ratio == 1.0 and not out["A"].adverse
    assert out["B"].rate == 0.2 and out["B"].impact_ratio == 0.25 and out["B"].adverse


def test_table_expectations_null_counts_as_fail(spark):
    from pyspark.sql import functions as F

    from leidenalg_spark.operators.validate import table_expectations

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id long, v double"
    )
    out = {r.rule: r for r in table_expectations(df, {
        "id_not_null": F.col("id").isNotNull(),
        "v_nonneg": F.col("v") >= 0,
    }).collect()}
    assert out["id_not_null"].n_pass == 3 and out["id_not_null"].ok
    # -1 fails, NULL comparison yields NULL -> counted as fail
    assert out["v_nonneg"].n_pass == 1 and not out["v_nonneg"].ok
    assert abs(out["v_nonneg"].pass_rate - 1 / 3) < 1e-5


def test_referential_integrity_orphans_and_nulls(spark):
    from leidenalg_spark.operators.validate import referential_integrity

    parent = spark.createDataFrame([(1,), (2,)], "k long")
    child = spark.createDataFrame([(1,), (1,), (9,), (None,)], "fk long")
    r = referential_integrity(child, parent, "fk", "k").collect()[0]
    assert (r.n_child, r.n_null_key, r.n_orphan) == (4, 1, 1)
    assert r.orphan_rate == 0.25 and not r.ok


def test_media_dedup_planted_binary_dupes(spark):
    """Two identical payloads collapse to one kept row; NULL payloads
    group as the empty blob instead of vanishing."""
    from leidenalg_spark.operators.multimodal import media_dedup

    rows = [(1, "image", b"abc"), (2, "image", b"abc"), (3, "audio", b"xyz"),
            (4, "video", None), (5, "video", None)]
    m = spark.createDataFrame(rows, "media_id long, media_type string, payload binary")
    out = {r.media_id: r for r in media_dedup(m).collect()}
    assert out[1].is_kept and not out[2].is_kept and out[2].group_size == 2
    assert out[3].is_kept and out[3].group_size == 1
    assert out[4].is_kept and not out[5].is_kept  # NULLs grouped, not dropped
