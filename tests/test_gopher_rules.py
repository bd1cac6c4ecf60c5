"""Gopher A1 per-rule quality signals: hand-computed goldens for each
rule, degenerate docs, and the admission flag."""
from leidenalg_spark.operators.textops import gopher_rules


def _rows(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}


def test_rule_signals_and_flag(spark):
    got = _rows(spark, [
        (1, "the cat sat to be of and that have with " + "word " * 60),
        (2, "short doc"),                       # too few words
        (3, "- one\n- two\n- three\nplain"),    # bullet lines
        (4, "#### #### " + "the to of and be " * 20),   # symbol ratio
        (5, "ends with dots...\nnormal line\nmore dots…"),
        (6, ""),                                # degenerate
        (7, "seq " + " ".join(str(i) for i in range(80)) + " the of"),  # numeric
    ])
    assert got[1]["passes_gopher"] and got[1]["n_words"] == 70 and got[1]["n_stopwords"] == 8
    assert not got[2]["passes_gopher"] and got[2]["n_words"] == 2
    assert got[3]["bullet_line_frac"] == 0.75
    assert got[4]["symbol_ratio"] == round(8 / 102, 6) and not got[4]["passes_gopher"]
    assert got[5]["ellipsis_line_frac"] == round(2 / 3, 6)
    assert got[6] == {
        "doc_id": 6, "n_words": 0, "mean_word_len": 0.0, "symbol_ratio": 0.0,
        "alpha_word_frac": 0.0, "n_stopwords": 0, "bullet_line_frac": 0.0,
        "ellipsis_line_frac": 0.0, "passes_gopher": False,
    }
    # 3 alpha words (seq/the/of) of 83 → fails the 80% alpha rule
    assert got[7]["alpha_word_frac"] == round(3 / 83, 6)
    assert not got[7]["passes_gopher"]


def test_mean_word_length_windows(spark):
    got = _rows(spark, [
        (1, " ".join(["supercalifragilistic"] * 60) + " the of"),  # mean too long
        (2, " ".join(["aa"] * 60) + " the of"),                    # mean too short
    ])
    assert got[1]["mean_word_len"] > 10 and not got[1]["passes_gopher"]
    assert got[2]["mean_word_len"] < 3 and not got[2]["passes_gopher"]
