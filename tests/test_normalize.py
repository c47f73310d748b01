"""Golden canonicalization cases ported from the reference's
internal/normalize/address_test.go:7-81 (FIXTURES.md §4)."""

import pandas as pd
import pytest

from ehdc_llpg_address_matching_spark.functions.normalize import (
    canonicalize_series, clean_uprn_series, extract_postcode,
    house_numbers_series, is_vague_series, parse_components_series,
    tokens_series)

GOLDEN = [
    ("12 High Street, Alton, GU34 1AA", "12 HIGH STREET ALTON", "GU34 1AA"),
    ("Flat 3, 45 Church Rd, Petersfield, GU31 4HX",
     "FLAT 3 45 CHURCH ROAD PETERSFIELD", "GU31 4HX"),
    ("Oakleigh, West Tisted Road, West Tisted, Alresford, SO24 0HJ",
     "OAKLEIGH WEST TISTED ROAD WEST TISTED ALRESFORD", "SO24 0HJ"),
    ("The Old Rectory, Church Lane, Selborne",
     "THE OLD RECTORY CHURCH LANE SELBORNE", ""),
    ("2A St. James Gdns, Four Marks, Alton, GU34 5EZ",
     "2A SAINT JAMES GARDENS FOUR MARKS ALTON", "GU34 5EZ"),
]


@pytest.mark.parametrize("raw,want_can,want_pc", GOLDEN)
def test_canonicalize_golden(raw, want_can, want_pc):
    out = canonicalize_series(pd.Series([raw]))
    assert out["addr_can"].iloc[0] == want_can
    assert out["postcode"].iloc[0] == want_pc


def test_postcode_unspaced_respaced():
    # reference: address_test.go:69-70 — GU341AA -> GU34 1AA
    assert extract_postcode(pd.Series(["10 X RD GU341AA"])).iloc[0] == "GU34 1AA"


def test_postcode_first_of_multiple():
    pc = extract_postcode(pd.Series(["GU34 1AA then SO24 0HJ"]))
    assert pc.iloc[0] == "GU34 1AA"


def test_clean_uprn_strips_suffix():
    # reference: engine_components_fixed.go:253-257
    out = clean_uprn_series(pd.Series(["100001234.00", "5001.000", None, "abc"]))
    assert out.tolist() == ["100001234", "5001", None, None]


def test_tokens_drop_stopwords():
    toks = tokens_series(pd.Series(["THE OLD RECTORY OF ALTON"])).iloc[0]
    assert "THE" not in toks and "OF" not in toks
    assert "RECTORY" in toks and "ALTON" in toks


def test_house_numbers():
    hn = house_numbers_series(pd.Series(["FLAT 3 45 CHURCH ROAD"])).iloc[0]
    assert set(hn) == {"3", "45"}
    hn2 = house_numbers_series(pd.Series(["12A HIGH STREET"])).iloc[0]
    assert hn2 == ["12A"]


def test_business_name_normalization():
    # N5 (reference: internal/normalize/enhanced.go:244-273)
    out = canonicalize_series(pd.Series([
        "M&S, 1 High St, Alton", "The Co-op, 2 High St", "Smith & Son Ltd."]))
    assert out["addr_can"].iloc[0].startswith("MARKS AND SPENCER 1 HIGH")
    assert out["addr_can"].iloc[1] == "THE COOPERATIVE 2 HIGH STREET"
    assert out["addr_can"].iloc[2] == "SMITH AND SON LIMITED"


def test_vague_gate():
    v = is_vague_series(pd.Series([
        "LAND AT CHURCH FARM", "REAR OF 12 HIGH ST", "12 HIGH STREET"]))
    assert v.tolist() == [True, True, False]


def test_parse_components_flat():
    out = parse_components_series(
        pd.Series(["Flat 3, 45 Church Rd, Petersfield, GU31 4HX"]))
    r = out.iloc[0]
    assert r["house_number"] == "FLAT 3 45"
    assert r["street"] == "CHURCH ROAD"
    assert r["locality"] == "PETERSFIELD"
    assert r["postcode"] == "GU31 4HX"
    assert r["parse_valid"]


def test_parse_components_simple():
    r = parse_components_series(pd.Series(["12 High Street, Alton, GU34 1AA"])).iloc[0]
    assert (r["house_number"], r["street"], r["locality"]) == \
        ("12", "HIGH STREET", "ALTON")


def test_parse_components_range():
    r = parse_components_series(pd.Series(["10-11 HIGH STREET, ALTON"])).iloc[0]
    assert r["house_number"] == "10-11"
