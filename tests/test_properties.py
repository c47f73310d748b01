"""Property-based invariants (hypothesis) + warehouse upsert."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ehdc_llpg_address_matching_spark.functions.normalize import (
    canonicalize_series, extract_postcode)
from ehdc_llpg_address_matching_spark.functions.phonetic import phonetic_series
from ehdc_llpg_address_matching_spark.functions.similarity import (
    jaro_sim_batch, levenshtein_sim_batch, trigram_sim_batch)

addr_text = st.text(
    alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 ,.&-'",
    max_size=80)


@given(st.lists(addr_text, min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_canonicalize_idempotent(raws):
    s = pd.Series(raws)
    once = canonicalize_series(s)
    twice = canonicalize_series(once["addr_can"])
    assert (twice["addr_can"] == once["addr_can"]).all()
    # canonical form never contains a postcode or double spaces
    assert (extract_postcode(once["addr_can"]) == "").all()
    assert (~once["addr_can"].str.contains("  ", regex=False)).all()


@given(st.lists(addr_text, min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_similarity_bounds_and_identity(raws):
    s = pd.Series([r.upper() for r in raws])
    for fn in (trigram_sim_batch, jaro_sim_batch, levenshtein_sim_batch):
        self_sim = fn(s, s)
        assert ((self_sim >= 0) & (self_sim <= 1)).all()
        nonempty = s.str.strip().str.len() > 0
        assert (self_sim[list(nonempty)] == 1.0).all() or fn is trigram_sim_batch
        # trigram of a string against itself is 1 unless no grams
        if fn is trigram_sim_batch:
            has_word = s.str.contains(r"\S")
            assert (self_sim[list(has_word)] == 1.0).all()


@given(st.lists(st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ", max_size=15),
                min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_phonetic_deterministic_and_bounded(words):
    s = pd.Series(words)
    a = phonetic_series(s)
    b = phonetic_series(s)
    assert (a == b).all()
    assert (a.str.len() <= 6).all()


def test_warehouse_upsert(spark, tmp_path):
    from ehdc_llpg_address_matching_spark.sources.catalog import Warehouse
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df1 = spark.createDataFrame(
        [("d1", "U1", 0.8), ("d2", "U2", 0.9)],
        "doc_id string, uprn string, confidence double")
    wh.upsert(df1, "matches", ["doc_id"])
    df2 = spark.createDataFrame(
        [("d2", "U9", 0.95), ("d3", "U3", 0.7)],
        "doc_id string, uprn string, confidence double")
    wh.upsert(df2, "matches", ["doc_id"])
    out = {r["doc_id"]: (r["uprn"], r["confidence"])
           for r in wh.load("matches").collect()}
    assert out == {"d1": ("U1", 0.8), "d2": ("U9", 0.95), "d3": ("U3", 0.7)}


@given(st.lists(st.lists(st.text(alphabet="ABCDE", min_size=1, max_size=4),
                         max_size=8), min_size=1, max_size=15))
@settings(max_examples=30, deadline=None)
def test_token_cosine_bounds_and_identity(token_lists):
    from ehdc_llpg_address_matching_spark.functions.similarity import \
        token_cosine_batch
    a = pd.Series(token_lists)
    out = token_cosine_batch(a, a)
    assert ((out >= 0.0) & (out <= 1.0 + 1e-9)).all()
    # self-cosine is exactly 1 (also for the both-empty convention)
    assert (abs(out - 1.0) < 1e-9).all()
    # symmetry against a shifted copy
    b = pd.Series(token_lists[1:] + token_lists[:1])
    ab = token_cosine_batch(a, b)
    ba = token_cosine_batch(b, a)
    assert (abs(ab - ba) < 1e-9).all()
