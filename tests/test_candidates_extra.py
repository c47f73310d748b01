"""Round-2 operator tests: J7 full rule matcher, J5 hierarchical
cascade, J4 strategies (c)/(d), F4 token-frequency cosine, F11 meta
flags, N7 locality fallback."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ehdc_llpg_address_matching_spark.functions.normalize import _parse_one
from ehdc_llpg_address_matching_spark.functions.similarity import (
    token_cosine_batch, trigram_sim_batch)
from ehdc_llpg_address_matching_spark.operators import candidates as C
from ehdc_llpg_address_matching_spark.pipeline import normalize_documents


def _gaz(spark, rows):
    """rows: list of full_address strings -> prepared gazetteer."""
    pdf = pd.DataFrame({
        "uprn": [str(100 + i) for i in range(len(rows))],
        "full_address": rows,
        "usrn": [str(20000 + i) for i in range(len(rows))],
        "blpu_class": ["RD02"] * len(rows),
        "status_code": ["1"] * len(rows),
        "easting": [470000.0 + i for i in range(len(rows))],
        "northing": [120000.0 + i for i in range(len(rows))],
    })
    return C.prepare_gazetteer(spark.createDataFrame(pdf)).cache()


def _uaddr(spark, raws):
    pdf = pd.DataFrame({
        "doc_id": [f"T{i}" for i in range(len(raws))],
        "spans": [[{"kind": "text", "text": r, "media_ref": None,
                    "offset": 0}] for r in raws],
    })
    docs = spark.createDataFrame(
        pdf, schema="doc_id string, spans array<struct<kind:string,"
                    "text:string,media_ref:string,offset:int>>")
    dn = normalize_documents(docs, None)
    from ehdc_llpg_address_matching_spark.operators.blocking import \
        with_blocking_keys
    return with_blocking_keys(C.prepare_unique_addresses(dn)).cache()


# ------------------------------------------------------------------ J7

def test_rule_rewrite_former_site(spark):
    gaz = _gaz(spark, ["ROSE COTTAGE, HIGH ROAD, ALTON, GU34 1AA"])
    ua = _uaddr(spark, ["FORMER SITE OF ROSE COTTAGE, HIGH ROAD, ALTON"])
    out = C.cand_rule_rewrite(ua, gaz).collect()
    assert len(out) >= 1
    r = out[0]
    assert r["method"] == "rule_former_site_prefix"
    # base 0.75, sim >= 0.90 on the clean rewrite -> +0.10
    assert r["method_conf"] == pytest.approx(0.85)


def test_rule_first_match_wins(spark):
    gaz = _gaz(spark, ["12 HIGH ROAD, ALTON, GU34 1AA"])
    # matches former_site (id 5) before land_at (id 6)
    ua = _uaddr(spark, ["FORMER SITE OF LAND AT 12 HIGH ROAD, ALTON"])
    out = C.cand_rule_rewrite(ua, gaz, min_sim=0.3).collect()
    assert out and all(r["method"] == "rule_former_site_prefix" for r in out)


def test_rule_lucky_lite(spark):
    gaz = _gaz(spark,
               ["LUCKYLITE FARM, CATHERINGTON LANE, HORNDEAN, PO8 1AA"])
    ua = _uaddr(spark, ["LUCKY LITE FARM BARN 2, HORNDEAN"])
    out = C.cand_rule_rewrite(ua, gaz).collect()
    assert out and out[0]["method"] == "rule_lucky_lite_farm"
    assert out[0]["method_conf"] >= 0.95


# ------------------------------------------------------------------ J5

def test_hierarchical_stop_at_first(spark):
    gaz = _gaz(spark, [
        "12 CHURCH LANE, ALTON, GU34 1AA",
        "14 CHURCH LANE, ALTON, GU34 1AB",
    ])
    ua = _uaddr(spark, [
        "12 CHURCH LANE, ALTON, GU34 1AA",   # level 1: pc + house
        "SOMEWHERE UNPARSEABLE, ALTON",      # level 5: locality only
    ])
    out = C.cand_hierarchical(ua, gaz).toPandas()
    ids = ua.select("addr_id", "addr_can").toPandas()
    m = out.merge(ids, on="addr_id")
    lvl1 = m[m.addr_can.str.startswith("12 CHURCH")]
    assert set(lvl1.method) == {"hier_postcode_house"}
    assert (lvl1.method_conf == 0.95).all()
    # stop-at-first: the pc+house doc must NOT also carry lower levels
    assert len(lvl1) == 1
    lvl5 = m[~m.addr_can.str.startswith("12 CHURCH")]
    assert set(lvl5.method) == {"hier_locality_only"}
    assert (lvl5.method_conf == 0.70).all()
    assert len(lvl5) == 2  # both ALTON gazetteer rows


def test_hierarchical_street_house(spark):
    gaz = _gaz(spark, ["7 GREEN LANE, LISS, GU33 7AB"])
    ua = _uaddr(spark, ["7 GREEN LANE, LISS"])  # no postcode -> level 2
    out = C.cand_hierarchical(ua, gaz).collect()
    assert out and out[0]["method"] == "hier_street_house_locality"
    assert out[0]["method_conf"] == pytest.approx(0.90)


# ------------------------------------------------------------- J4 c/d

def test_fuzzy_road_with_house(spark):
    gaz = _gaz(spark, ["9 GREEN LANES EAST, ALTON, GU34 2AA"])
    ua = _uaddr(spark, ["9 GREEN LANE EAST, ALTON"])
    out = C.cand_component_joins(ua, gaz).toPandas()
    assert "comp_fuzzy_road" in set(out.method)


def test_fuzzy_road_requires_house_equality(spark):
    gaz = _gaz(spark, ["11 GREEN LANES EAST, ALTON, GU34 2AA"])
    ua = _uaddr(spark, ["9 GREEN LANE EAST, ALTON"])
    out = C.cand_component_joins(ua, gaz).toPandas()
    assert "comp_fuzzy_road" not in set(out.method)


def test_business_name_match(spark):
    gaz = _gaz(spark, ["ROSE COTTAGE, HIGH ROAD, ALTON, GU34 1AA"])
    ua = _uaddr(spark, ["ROSE COTTAGES, ALTON"])  # name-led, small typo
    out = C.cand_component_joins(ua, gaz).toPandas()
    assert "business_name" in set(out.method)


# ------------------------------------------------------------- F4/F11

def test_token_cosine_semantics():
    a = pd.Series([["HIGH", "ROAD"], ["HIGH", "HIGH", "ROAD"], [], [],
                   ["A", "B"]])
    b = pd.Series([["HIGH", "ROAD"], ["HIGH", "ROAD"], [], ["X"],
                   ["C", "D"]])
    out = token_cosine_batch(a, b)
    assert out[0] == pytest.approx(1.0)
    # repeated token changes the tf vector: (2,1)·(1,1)/(sqrt5*sqrt2)
    assert out[1] == pytest.approx(3 / (np.sqrt(5) * np.sqrt(2)))
    assert out[2] == pytest.approx(1.0)   # both empty
    assert out[3] == pytest.approx(0.0)   # one empty
    assert out[4] == pytest.approx(0.0)   # disjoint


def test_meta_flags_usrn_blpu(spark):
    from ehdc_llpg_address_matching_spark.operators.scoring import (
        attach_pair_attrs, with_column_features)
    gaz = _gaz(spark, ["12 CHURCH LANE, ALTON, GU34 1AA"])
    ua = _uaddr(spark, ["12 CHURCH LANE, ALTON, GU34 1AA"]) \
        .withColumn("usrn", F.lit("20000"))
    cands = C.union_candidates(C.cand_exact_canonical(ua, gaz))
    pairs = with_column_features(attach_pair_attrs(cands, ua, gaz))
    row = pairs.select("usrn_match", "blpu_class_compat").collect()[0]
    assert row["usrn_match"] is True      # both sides usrn 20000
    assert row["blpu_class_compat"] is True  # RD02 residential


# ------------------------------------------------------------------ N7

def test_locality_fallback_multiword():
    house, street, loc, name = _parse_one("2 HIGH STREET FOUR MARKS")
    assert house == "2"
    assert street == "HIGH STREET"
    assert loc == "FOUR MARKS"


def test_locality_fallback_single():
    _, street, loc, _ = _parse_one("14 MILL LANE PETERSFIELD")
    assert loc == "PETERSFIELD"
    assert street == "MILL LANE"


def test_name_led_parse():
    house, street, loc, name = _parse_one("ROSE COTTAGE, ALTON")
    assert name == "ROSE COTTAGE"
    assert loc == "ALTON"


# ------------------------------------------------- decision integration

def test_method_conf_accept_rung(spark):
    """A high-confidence rule/cascade match accepts even when the
    fuzzy score alone would only reach review."""
    from ehdc_llpg_address_matching_spark.operators.decision import (
        Thresholds, decide)
    pdf = pd.DataFrame([
        # rank-1 row: mediocre fuzzy score, strong method_conf
        dict(addr_id="a", uprn="1", methods=["rule_lucky_lite_farm"],
             score=0.72, validator_ok=False, d_vague=False,
             house_match=False, house_exact=False, house_conflict=False,
             pc_match=False, g_source_type="original", method_conf=0.95),
        dict(addr_id="a", uprn="2", methods=["blocked_fuzzy"],
             score=0.40, validator_ok=False, d_vague=False,
             house_match=False, house_exact=False, house_conflict=False,
             pc_match=False, g_source_type="original", method_conf=None),
    ])
    out = decide(spark.createDataFrame(pdf), Thresholds()).toPandas()
    top = out[out["rank"] == 1].iloc[0]
    assert top["decision"] == "accept"
    assert top["confidence"] == pytest.approx(0.95)


# ------------------------------------------------- hot-token df cap

def _toy_gaz(spark, n=30):
    rows = [dict(uprn=str(100 + i),
                 addr_core=f"NAME{i} HOUSE{i} STREET",
                 tokens=[f"NAME{i}", f"HOUSE{i}", "STREET"])
            for i in range(n)]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_gaz_hot_tokens_cap(spark):
    from ehdc_llpg_address_matching_spark.operators.candidates import \
        gaz_hot_tokens
    hot = {r["tok"] for r in gaz_hot_tokens(_toy_gaz(spark), 5).collect()}
    assert hot == {"STREET"}
    assert gaz_hot_tokens(_toy_gaz(spark), 10000).count() == 0


def test_rule_rewrite_hot_token_capped_same_output(spark):
    """Every gazetteer row shares the hot suffix token; dropping it
    from the join key must not change the rule-matcher output (pairs
    still connect through >=2 rare tokens) while bounding the join."""
    from ehdc_llpg_address_matching_spark.operators.candidates import \
        cand_rule_rewrite
    gaz = _toy_gaz(spark)
    docs = spark.createDataFrame(pd.DataFrame([
        # rule hit, two rare shared tokens with uprn 103
        dict(addr_id="a1", addr_can="LAND AT NAME3 HOUSE3 STREET"),
        # rule hit, shares ONLY the hot token -> no candidate either way
        dict(addr_id="a2", addr_can="FORMER SITE OF UNKNOWN STREET"),
    ]))
    capped = cand_rule_rewrite(docs, gaz, token_df_cap=5).toPandas()
    uncapped = cand_rule_rewrite(docs, gaz, token_df_cap=10**9).toPandas()
    key = ["addr_id", "uprn", "method", "method_conf"]
    assert sorted(map(tuple, capped[key].values.tolist())) == \
        sorted(map(tuple, uncapped[key].values.tolist()))
    assert set(capped[capped.addr_id == "a1"].uprn) == {"103"}
    assert (capped.addr_id != "a2").all()


def test_rule_rewrite_plan_has_hot_token_anti_join(spark):
    """The hot-token drop must be a broadcast anti-join (map-side
    filter) applied to BOTH explode sides before the token equi-join."""
    from ehdc_llpg_address_matching_spark.operators.candidates import \
        cand_rule_rewrite
    docs = spark.createDataFrame(pd.DataFrame(
        [dict(addr_id="a1", addr_can="LAND AT NAME3 HOUSE3 STREET")]))
    plan = cand_rule_rewrite(docs, _toy_gaz(spark))._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("LeftAnti") >= 2
