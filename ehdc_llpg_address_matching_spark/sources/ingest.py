"""CSV ingestion layer (SURVEY.md §2.1 S1-S5 + N13 repair pass).

The reference stages every CSV as all-text tables and then applies a
typed transform (migrations/001_staging_tables.sql -> internal/etl/
pipeline.go:27-131). Spark shape: read all-string (inferSchema OFF —
explicit schemas only, per SURVEY §1.3), lower-case the headers, then
a typed select with cast guards. Dates arrive as DD/MM/YYYY with
garbage years, guarded exactly like the reference's CASE
(internal/etl/pipeline.go:446-460).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# literal data-quality repairs applied before matching — the reference
# hard-codes observed OCR/typing damage (cmd/matcher-v2/main.go:3264-3362);
# ours is a configurable map with the same shape
DEFAULT_REPAIRS = {
    "PFTERSFTELD": "PETERSFIELD",
    "PETERSFTELD": "PETERSFIELD",
    "ALTQN": "ALTON",
    "LIPHQOK": "LIPHOOK",
}


def read_staging_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1/S3 staging read: header-keyed, every column string, headers
    lower-cased (tolerates source typos like 'adress' — mapping is by
    name downstream, reference: internal/etl/pipeline.go:62-65)."""
    df = (spark.read
          .option("header", True)
          .option("inferSchema", False)
          .option("mode", "PERMISSIVE")
          .csv(path))
    return df.toDF(*[c.strip().lower() for c in df.columns])


def parse_uk_date(col: F.Column) -> F.Column:
    """DD/MM/YYYY with a sanity window (reference CASE guard:
    internal/etl/pipeline.go:446-460): out-of-range years -> null."""
    d = F.try_to_date(col, "d/M/yyyy")  # ANSI-safe: garbage -> null
    return F.when((F.year(d) >= 1900) & (F.year(d) <= 2100), d)


def repair_text(col: F.Column, repairs: dict[str, str] | None = None) -> F.Column:
    """N13 repair pass: literal fixes + TRIM/UPPER + collapse spaces."""
    out = F.upper(F.trim(col))
    for bad, good in (repairs or DEFAULT_REPAIRS).items():
        out = F.regexp_replace(out, rf"\b{bad}\b", good)
    return F.regexp_replace(out, r"\s+", " ")


def load_gazetteer_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2: LLPG CSV -> typed gazetteer dimension. Filters rows
    without uprn/address (reference: internal/etl/pipeline.go:134-191);
    coordinates cast with try-semantics (bad numbers -> null)."""
    stg = read_staging_csv(spark, path)
    cols = set(stg.columns)

    def opt(name, typ="string"):
        return (F.col(name).cast(typ) if name in cols
                else F.lit(None).cast(typ))

    return (stg
            .select(
                F.col("uprn").cast("string").alias("uprn"),
                repair_text(F.col("full_address")).alias("full_address"),
                opt("usrn").alias("usrn"),
                opt("blpu_class").alias("blpu_class"),
                opt("status_code").alias("status_code"),
                F.expr("try_cast(easting AS double)").alias("easting")
                if "easting" in cols else F.lit(None).cast("double").alias("easting"),
                F.expr("try_cast(northing AS double)").alias("northing")
                if "northing" in cols else F.lit(None).cast("double").alias("northing"),
            )
            .filter(F.col("uprn").isNotNull() & (F.col("uprn") != ""))
            .filter(F.col("full_address").isNotNull() &
                    (F.col("full_address") != "")))


# per-document-type column mappings: staging header -> engine column
# (the reference has one hand-written transform per type,
#  internal/etl/pipeline.go:194-574; ours is a declarative map)
DOC_TYPE_MAPPINGS = {
    "decision_notice": {"reference": "external_reference",
                        "address": "raw_address", "decision_date": "doc_date",
                        "uprn": "raw_uprn"},
    "land_charge": {"charge_ref": "external_reference",
                    "adress": "raw_address",   # source typo preserved, 001_staging_tables.sql:42
                    "address": "raw_address", "charge_date": "doc_date",
                    "uprn": "raw_uprn"},
    "enforcement_notice": {"notice_ref": "external_reference",
                           "site_address": "raw_address",
                           "served_date": "doc_date", "uprn": "raw_uprn"},
    "agreement": {"agreement_ref": "external_reference",
                  "property_address": "raw_address", "signed_date": "doc_date",
                  "uprn": "raw_uprn"},
}


def load_source_documents_csv(spark: SparkSession, path: str,
                              doc_type: str) -> DataFrame:
    """S3: one typed source-document load per type; output shape is the
    engine's spans-document schema (one text span holding the address)
    so CSV-born documents flow through the same pipeline as
    interleaved-media documents."""
    mapping = DOC_TYPE_MAPPINGS[doc_type]
    stg = read_staging_csv(spark, path)
    cols = {}
    for src, dst in mapping.items():
        if src in stg.columns and dst not in cols:
            cols[dst] = F.col(src)
    raw_addr = repair_text(cols.get("raw_address", F.lit(None)))
    doc_id = F.concat(F.lit(doc_type + ":"),
                      F.coalesce(cols.get("external_reference"),
                                 F.monotonically_increasing_id().cast("string")))
    span = F.array(F.struct(
        F.lit("text").alias("kind"),
        raw_addr.alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset")))
    return stg.select(
        doc_id.alias("doc_id"),
        span.alias("spans"),
        cols.get("raw_uprn", F.lit(None).cast("string")).alias("raw_uprn"),
        parse_uk_date(cols["doc_date"]).alias("doc_date")
        if "doc_date" in cols else F.lit(None).cast("date").alias("doc_date"),
        F.lit(doc_type).alias("doc_type"))


def union_source_documents(*dfs: DataFrame) -> DataFrame:
    """S3 tail: unionByName across the per-type loads."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
