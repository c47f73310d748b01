"""Span extraction + the per-row span-sequence invariant."""

from pyspark.sql import functions as F

from ehdc_llpg_address_matching_spark.sources.documents import (
    media_spans, span_fingerprint, with_raw_address)


def _doc(doc_id, spans):
    return (doc_id, [{"kind": k, "text": t, "media_ref": m, "offset": o}
                     for (k, t, m, o) in spans])


SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
          "media_ref:string,offset:int>>")


def test_raw_address_drops_prose_keeps_address(spark):
    df = spark.createDataFrame([_doc("d1", [
        ("text", "Planning application for development at", None, 0),
        ("image", None, "media://img/1.jpg", 1),
        ("text", "12 High Street,", None, 2),
        ("text", "Alton, GU34 1AA", None, 3),
    ])], SCHEMA)
    out = with_raw_address(df).collect()[0]
    assert out["raw_address"] == "12 High Street, Alton, GU34 1AA"


def test_raw_address_out_of_order_offsets(spark):
    df = spark.createDataFrame([_doc("d1", [
        ("text", "Alton, GU34 1AA", None, 3),
        ("text", "12 High Street,", None, 2),
    ])], SCHEMA)
    out = with_raw_address(df).collect()[0]
    assert out["raw_address"] == "12 High Street, Alton, GU34 1AA"


def test_raw_address_back_extends_property_name(spark):
    df = spark.createDataFrame([_doc("d1", [
        ("text", "Decision notice issued in respect of", None, 0),
        ("text", "Oakleigh,", None, 1),
        ("text", "West Tisted Road, Alresford", None, 2),
    ])], SCHEMA)
    out = with_raw_address(df).collect()[0]
    assert out["raw_address"] == "Oakleigh, West Tisted Road, Alresford"


def test_raw_address_no_qualifier_falls_back_to_all(spark):
    df = spark.createDataFrame([_doc("d1", [
        ("text", "hello world", None, 0)])], SCHEMA)
    assert with_raw_address(df).collect()[0]["raw_address"] == "hello world"


def test_fingerprint_detects_reorder_and_mutation(spark):
    base = [("text", "A", None, 0), ("image", None, "m://1", 1),
            ("text", "B", None, 2)]
    df = spark.createDataFrame(
        [_doc("ok", base),
         _doc("swapped", [("text", "B", None, 0), ("image", None, "m://1", 1),
                          ("text", "A", None, 2)]),
         _doc("mutated", [("text", "A", None, 0), ("image", None, "m://X", 1),
                          ("text", "B", None, 2)])], SCHEMA)
    fps = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", span_fingerprint().alias("fp")).collect()}
    assert fps["ok"] != fps["swapped"]
    assert fps["ok"] != fps["mutated"]


def test_fingerprint_invariant_to_physical_order(spark):
    # same logical sequence, different array order => same fingerprint
    df = spark.createDataFrame(
        [_doc("a", [("text", "A", None, 0), ("text", "B", None, 1)]),
         _doc("b", [("text", "B", None, 1), ("text", "A", None, 0)])], SCHEMA)
    fps = [r["fp"] for r in
           df.select(span_fingerprint().alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_media_spans_view(spark):
    df = spark.createDataFrame([_doc("d1", [
        ("text", "12 High St", None, 0),
        ("image", None, "media://img/1.jpg", 1),
        ("pdf_page", None, "media://pdf/2.pdf", 2),
    ])], SCHEMA)
    rows = media_spans(df).orderBy("offset").collect()
    assert [(r["kind"], r["media_ref"]) for r in rows] == [
        ("image", "media://img/1.jpg"), ("pdf_page", "media://pdf/2.pdf")]
