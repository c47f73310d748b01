"""CSV ingest (S1-S4), facts/views/export (S6/S8/A6), integrity +
threshold tuner (A4/§5.4), group rescue (G2), component joins (J4/J8)."""

import os

import pytest
from pyspark.sql import functions as F

from ehdc_llpg_address_matching_spark.operators import audit, facts
from ehdc_llpg_address_matching_spark.operators.candidates import (
    cand_component_joins, prepare_gazetteer)
from ehdc_llpg_address_matching_spark.operators.rescue import \
    group_fuzzy_rescue
from ehdc_llpg_address_matching_spark.sources import ingest


# ------------------------------------------------------------- ingest

def test_gazetteer_csv_load(spark, tmp_path):
    p = tmp_path / "llpg.csv"
    p.write_text(
        "UPRN,FULL_ADDRESS,Easting,Northing,STATUS_CODE\n"
        "100001,\"12 High Street, Alton, GU34 1AA\",470000,140000,1\n"
        ",\"MISSING UPRN\",1,1,1\n"
        "100002,\"  45 church   rd, PFTERSFTELD \",bad,140001,1\n")
    out = ingest.load_gazetteer_csv(spark, str(p)).orderBy("uprn").collect()
    assert len(out) == 2  # missing-uprn row dropped
    assert out[0]["full_address"] == "12 HIGH STREET, ALTON, GU34 1AA"
    assert out[1]["full_address"] == "45 CHURCH RD, PETERSFIELD"  # repaired
    assert out[1]["easting"] is None  # try_cast of 'bad'
    assert out[0]["easting"] == 470000.0


def test_source_document_csv_load_and_date_guard(spark, tmp_path):
    p = tmp_path / "dn.csv"
    p.write_text(
        "Reference,Address,Decision_Date,UPRN\n"
        "DN/1,\"12 High St, Alton\",25/03/2001,100001.00\n"
        "DN/2,\"45 Church Rd\",31/12/1875,\n")
    df = ingest.load_source_documents_csv(spark, str(p), "decision_notice")
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows["decision_notice:DN/1"]["doc_date"].isoformat() == "2001-03-25"
    assert rows["decision_notice:DN/2"]["doc_date"] is None  # 1875 < 1900
    assert rows["decision_notice:DN/1"]["raw_uprn"] == "100001.00"
    span = rows["decision_notice:DN/1"]["spans"][0]
    assert span["kind"] == "text" and "12 HIGH ST" in span["text"]


def test_union_source_documents(spark, tmp_path):
    a = tmp_path / "a.csv"
    a.write_text("Reference,Address\nA1,12 High St\n")
    b = tmp_path / "b.csv"
    b.write_text("Charge_Ref,Adress,Charge_Date\nC1,45 Church Rd,01/01/2000\n")
    da = ingest.load_source_documents_csv(spark, str(a), "decision_notice")
    db = ingest.load_source_documents_csv(spark, str(b), "land_charge")
    u = ingest.union_source_documents(da, db)
    assert u.count() == 2
    assert set(r["doc_type"] for r in u.collect()) == \
        {"decision_notice", "land_charge"}


# -------------------------------------------------- component joins

@pytest.fixture(scope="module")
def small_gazp(spark):
    import pandas as pd
    gaz = pd.DataFrame([
        {"uprn": "U1", "full_address": "12 HIGH STREET, ALTON, GU34 1AA",
         "status_code": "1", "easting": 1.0, "northing": 1.0},
        {"uprn": "U2", "full_address": "13 HIGH STREET, ALTON, GU34 1AA",
         "status_code": "1", "easting": 2.0, "northing": 2.0},
    ])
    return prepare_gazetteer(spark.createDataFrame(gaz)).cache()


def test_component_joins(spark, small_gazp):
    uaddr = spark.createDataFrame(
        [("A1", "GU34 1AA", "12", "HIGH STREET", "ALTON")],
        "addr_id string, postcode string, c_house string, "
        "c_street string, c_locality string")
    out = cand_component_joins(uaddr, small_gazp).toPandas()
    methods = set(zip(out.uprn, out.method))
    assert ("U1", "comp_pc_house") in methods
    assert ("U1", "comp_street_loc") in methods
    assert ("U2", "comp_pc_house") not in methods   # house 13 != 12
    assert ("U2", "postcode_block") in methods       # J8 blocks on pc only


# ------------------------------------------------------------ rescue

def test_group_fuzzy_rescue(spark, small_gazp):
    docs_n = spark.createDataFrame(
        [("d1", "G1", "12 HIGH STRET ALTON", ["12", "HIGH", "STRET", "ALTON"]),
         ("d2", "G1", "12 HIGH ST", ["12", "HIGH"]),
         ("d3", "G2", "13 HIGH STREET ALTON", ["13", "HIGH", "STREET", "ALTON"])],
        "doc_id string, group_key string, addr_core string, tokens array<string>")
    matched = spark.createDataFrame([("d3",)], "doc_id string")
    out = group_fuzzy_rescue(docs_n, matched, small_gazp).toPandas()
    # G1 (no matches) rescued to U1 via its longest member; G2 untouched
    got = dict(zip(out.doc_id, out.uprn))
    assert got.get("d1") == "U1" and got.get("d2") == "U1"
    assert "d3" not in got
    assert (out.method == "group_rescue").all()


# ------------------------------------------------------ facts / views

@pytest.fixture(scope="module")
def fact(spark, small_gazp):
    result = spark.createDataFrame(
        [("d1", "raw 1", "RAW 1", "GU34 1AA", "G1", "U1", "exact", 0.99, 0.99),
         ("d2", "raw 2", "RAW 2", "", "G1", None, None, None, None),
         ("d3", "raw 3", "RAW 3", "GU34 1AA", "G2", "U2", "fuzzy", 0.82, 0.82)],
        "doc_id string, raw_address string, addr_can string, postcode string,"
        "group_key string, uprn string, method string, score double,"
        "confidence double")
    return facts.build_fact(result, small_gazp)


def test_fact_measures(fact):
    rows = {r["doc_id"]: r for r in fact.collect()}
    assert rows["d1"]["is_matched"] and rows["d1"]["is_high_confidence"]
    assert rows["d1"]["match_quality"] == "GOOD"
    assert rows["d1"]["matched_address"] == "12 HIGH STREET ALTON"
    assert not rows["d2"]["is_matched"]
    assert rows["d2"]["match_quality"] == "UNMATCHED"
    assert rows["d3"]["match_quality"] == "FAIR"


def test_fact_corrections_overlay(spark, small_gazp, fact):
    result = spark.createDataFrame(
        [("d1", "U1", 0.6)], "doc_id string, uprn string, confidence double") \
        .withColumn("addr_can", F.lit("X")).withColumn("postcode", F.lit(""))
    corr = spark.createDataFrame(
        [("d1", "U2", 0.95, "group vote")],
        "doc_id string, corrected_uprn string, corrected_confidence double,"
        "correction_reason string")
    out = facts.build_fact(result, small_gazp, corrections=corr).collect()[0]
    assert out["final_uprn"] == "U2" and out["is_corrected"]
    assert out["final_confidence"] == 0.95


def test_views(spark, fact):
    names = facts.register_views(spark, fact)
    assert "vw_needs_review" in names
    assert len(facts.VIEW_DEFS) >= 20  # S8: the reference's view surface
    perf = spark.sql("SELECT * FROM vw_match_method_performance").collect()
    assert {r["method"] for r in perf} == {"exact", "fuzzy"}
    hq = spark.sql("SELECT doc_id FROM vw_high_quality_matches").collect()
    assert [r["doc_id"] for r in hq] == ["d1"]
    # every registered view must actually execute
    for name in facts.VIEW_DEFS:
        spark.sql(f"SELECT * FROM {name}").collect()
    dq = spark.sql("SELECT * FROM vw_data_quality_dashboard").collect()[0]
    assert dq["total_documents"] == dq["matched"] + dq["unmatched"]


def test_export(tmp_path, fact):
    out = str(tmp_path / "export")
    facts.export_enhanced(fact, out)
    assert any("match_quality=GOOD" in d for d in os.listdir(out))


# ---------------------------------------------------- audit / tuner

def test_integrity_checks(spark, small_gazp):
    result = spark.createDataFrame(
        [("d1", "U1", 0.9), ("d2", "UNKNOWN", 0.9), ("d2", "U2", 1.5)],
        "doc_id string, uprn string, confidence double")
    out = {r["check"]: r["violations"]
           for r in audit.integrity_checks(result, small_gazp).collect()}
    assert out["matched_uprn_in_gazetteer"] == 1   # UNKNOWN
    assert out["one_row_per_document"] == 1        # d2 twice
    assert out["confidence_in_unit_range"] == 1    # 1.5


def test_threshold_tuner(spark):
    decided = spark.createDataFrame(
        [("a1", "U1", 0.95, 1), ("a2", "U2", 0.75, 1),
         ("a3", "U9", 0.72, 1), ("a4", "U4", 0.40, 1)],
        "addr_id string, uprn string, score double, rank int")
    gold = spark.createDataFrame(
        [("a1", "U1"), ("a2", "U2"), ("a3", "U3"), ("a4", "U4")],
        "addr_id string, uprn string")
    out = audit.tune_thresholds(decided, gold, sweep=[0.5, 0.74, 0.9],
                                min_precision=0.95)
    by_t = {o["threshold"]: o for o in out["sweep"]}
    assert by_t[0.5]["tp"] == 2 and by_t[0.5]["fp"] == 1   # a3 wrong
    assert by_t[0.74]["tp"] == 2 and by_t[0.74]["fp"] == 0
    assert out["best"]["threshold"] == 0.74  # highest F1 at precision 1.0
