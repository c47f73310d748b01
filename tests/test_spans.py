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


def test_pixel_decode_with_pil(spark):
    """Real pixel decode path — runs only where pillow is installed
    (deployment); the sandbox exercises the no-PIL branch below."""
    import pytest
    from ehdc_llpg_address_matching_spark.operators import media as M
    if M._PILImage is None:
        pytest.skip("pillow not installed")
    import io
    im = M._PILImage.new("RGB", (5, 3), (10, 20, 30))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    arr = M.decode_image(buf.getvalue())
    assert arr.shape == (3, 5, 3)


def test_pixel_stats_without_pil(spark):
    """Without pillow the decode-bearing operator must keep the Spark
    plumbing intact and emit px_ok=False (never fake pixels); with
    pillow, header-only fixture bytes are undecodable so px_ok is
    False there too."""
    import pandas as pd
    from pyspark.sql import functions as F
    from ehdc_llpg_address_matching_spark.operators import media as M
    refs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b"],
                      "media_ref": ["media://img/a.jpg",
                                    "media://img/b.jpg"]}))
    out = M.with_pixel_stats(
        M.with_synth_image_bytes(refs), content_col="content").toPandas()
    assert list(out.px_ok) == [False, False]
    assert {"px_w", "px_h", "px_mean", "px_std"} <= set(out.columns)


def test_decode_image_raises_without_pil():
    import pytest
    from ehdc_llpg_address_matching_spark.operators import media as M
    if M._PILImage is not None:
        pytest.skip("pillow installed — stub unreachable")
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")
