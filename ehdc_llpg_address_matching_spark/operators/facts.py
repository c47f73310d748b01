"""Dimensional fact build, operational views, and enhanced export
(SURVEY.md §2.1 S6/S8 + §2.7 A6/A7).

The reference rebuilds a wide `fact_documents_lean` with measures and
generated booleans (migrations/010_create_lean_fact_table.sql) via a
multi-join (cmd/matcher-v2/main.go:1035-1251), overlays corrections
with COALESCE (:1097-1106), exposes ~20 operational views
(migrations/008/013), and exports per-type enhanced CSVs with quality
grading (internal/engine/exporter.go:60-441). Spark: one denormalizing
select, temp views, and a partitioned write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_fact(result: DataFrame, gazp: DataFrame,
               corrections: DataFrame | None = None) -> DataFrame:
    """A6: wide fact table. result = pipeline 'result' output
    (doc per row + match cols); corrections (doc_id, corrected_uprn,
    corrected_confidence, correction_reason) overlay wins via COALESCE
    (reference: cmd/matcher-v2/main.go:1097-1106)."""
    gaz = (gazp.filter(F.col("source_type") == "original")
           .select(F.col("uprn").alias("g_uprn"),
                   F.col("addr_can").alias("matched_address"),
                   F.col("postcode").alias("matched_postcode"),
                   F.col("easting").alias("matched_easting"),
                   F.col("northing").alias("matched_northing"),
                   F.col("status_code").alias("matched_status"))
           .dropDuplicates(["g_uprn"]))
    f = result
    if corrections is not None:
        f = (f.join(corrections, "doc_id", "left")
             .withColumn("final_uprn",
                         F.coalesce("corrected_uprn", "uprn"))
             .withColumn("final_confidence",
                         F.coalesce("corrected_confidence", "confidence"))
             .withColumn("is_corrected", F.col("corrected_uprn").isNotNull()))
    else:
        f = (f.withColumn("final_uprn", F.col("uprn"))
             .withColumn("final_confidence", F.col("confidence"))
             .withColumn("is_corrected", F.lit(False)))
    f = f.join(gaz, f.final_uprn == gaz.g_uprn, "left").drop("g_uprn")
    # generated measures/booleans (010_create_lean_fact_table.sql:34-55)
    quality = (F.when(F.col("final_confidence") >= 0.95, "GOOD")
               .when(F.col("final_confidence") >= 0.80, "FAIR")
               .when(F.col("final_confidence").isNotNull(), "POOR")
               .otherwise("UNMATCHED"))
    completeness = (
        (F.col("addr_can") != "").cast("int")
        + (F.col("postcode") != "").cast("int")
        + F.col("final_uprn").isNotNull().cast("int")
        + (F.col("final_confidence") >= 0.85).cast("int")) / 4.0
    return (f
            .withColumn("is_matched", F.col("final_uprn").isNotNull())
            .withColumn("is_high_confidence",
                        F.coalesce(F.col("final_confidence") >= 0.85,
                                   F.lit(False)))
            .withColumn("match_quality", quality)
            .withColumn("completeness_score",
                        F.coalesce(completeness, F.lit(0.0))))


VIEW_DEFS = {
    # S8 operational views (migrations/008_create_operational_views.sql)
    "vw_high_quality_matches":
        "SELECT * FROM fact_documents WHERE is_high_confidence",
    "vw_needs_review": """
        SELECT * FROM fact_documents
        WHERE is_matched AND NOT is_high_confidence""",
    "vw_unmatched_addresses": """
        SELECT doc_id, raw_address, addr_can, postcode
        FROM fact_documents WHERE NOT is_matched""",
    "vw_match_method_performance": """
        SELECT method, COUNT(*) AS n, AVG(final_confidence) AS avg_conf,
               SUM(CASE WHEN is_high_confidence THEN 1 ELSE 0 END) AS n_high
        FROM fact_documents WHERE is_matched GROUP BY method""",
    "vw_quality_distribution": """
        SELECT match_quality, COUNT(*) AS n,
               AVG(completeness_score) AS avg_completeness
        FROM fact_documents GROUP BY match_quality""",
    "vw_group_summary": """
        SELECT group_key, COUNT(*) AS n_docs,
               SUM(CASE WHEN is_matched THEN 1 ELSE 0 END) AS n_matched,
               COUNT(DISTINCT final_uprn) AS n_uprns
        FROM fact_documents WHERE group_key IS NOT NULL GROUP BY group_key""",
    # --- BI / dashboard family (migrations/013_*_lean variants fold in)
    "vw_business_intelligence": """
        SELECT match_quality, method,
               COUNT(*) AS n_documents,
               COUNT(DISTINCT final_uprn) AS n_distinct_uprns,
               AVG(final_confidence) AS avg_confidence,
               AVG(completeness_score) AS avg_completeness,
               SUM(CASE WHEN is_corrected THEN 1 ELSE 0 END) AS n_corrected
        FROM fact_documents GROUP BY match_quality, method""",
    "vw_data_quality_dashboard": """
        SELECT COUNT(*) AS total_documents,
               SUM(CASE WHEN is_matched THEN 1 ELSE 0 END) AS matched,
               SUM(CASE WHEN is_high_confidence THEN 1 ELSE 0 END) AS high_conf,
               SUM(CASE WHEN NOT is_matched THEN 1 ELSE 0 END) AS unmatched,
               SUM(CASE WHEN postcode = '' THEN 1 ELSE 0 END) AS missing_postcode,
               AVG(completeness_score) AS avg_completeness,
               SUM(CASE WHEN is_matched THEN 1 ELSE 0 END) * 1.0
                 / GREATEST(COUNT(*), 1) AS match_rate
        FROM fact_documents""",
    "vw_geographic_summary": """
        SELECT matched_postcode, COUNT(*) AS n_docs,
               COUNT(DISTINCT final_uprn) AS n_uprns,
               AVG(final_confidence) AS avg_conf,
               AVG(matched_easting) AS centroid_easting,
               AVG(matched_northing) AS centroid_northing
        FROM fact_documents WHERE is_matched GROUP BY matched_postcode""",
    "vw_spatial_analysis": """
        SELECT CAST(FLOOR(matched_easting / 1000) AS BIGINT) AS km_x,
               CAST(FLOOR(matched_northing / 1000) AS BIGINT) AS km_y,
               COUNT(*) AS n_docs, AVG(final_confidence) AS avg_conf
        FROM fact_documents
        WHERE matched_easting IS NOT NULL GROUP BY 1, 2""",
    "vw_documents_complete": """
        SELECT doc_id, raw_address, addr_can, postcode, group_key,
               final_uprn, matched_address, matched_postcode,
               final_confidence, method, match_quality,
               completeness_score, is_corrected
        FROM fact_documents""",
    "vw_missing_uprns": """
        SELECT doc_id, raw_address, addr_can, postcode, group_key
        FROM fact_documents
        WHERE NOT is_matched AND addr_can <> ''""",
    # --- planning-group consistency family (migrations/008)
    "vw_planning_app_groups": """
        SELECT group_key, COUNT(*) AS n_docs,
               SUM(CASE WHEN is_matched THEN 1 ELSE 0 END) AS n_matched,
               MIN(final_confidence) AS min_conf,
               MAX(final_confidence) AS max_conf
        FROM fact_documents WHERE group_key IS NOT NULL GROUP BY group_key""",
    "vw_inconsistent_planning_groups": """
        SELECT group_key, COUNT(DISTINCT final_uprn) AS n_uprns,
               COUNT(*) AS n_matched_docs
        FROM fact_documents
        WHERE group_key IS NOT NULL AND is_matched
        GROUP BY group_key HAVING COUNT(DISTINCT final_uprn) > 1""",
    # --- audit / validation family
    "vw_processing_audit": """
        SELECT method, match_quality, COUNT(*) AS n,
               MIN(final_confidence) AS min_conf,
               MAX(final_confidence) AS max_conf,
               AVG(final_confidence) AS avg_conf
        FROM fact_documents WHERE is_matched GROUP BY method, match_quality""",
    "vw_validation_issues": """
        SELECT doc_id, raw_address, final_uprn, final_confidence,
               CASE WHEN final_confidence < 0 OR final_confidence > 1
                      THEN 'confidence_out_of_range'
                    WHEN is_matched AND matched_address IS NULL
                      THEN 'uprn_not_in_gazetteer'
                    WHEN postcode <> '' AND matched_postcode <> ''
                         AND postcode <> matched_postcode
                      THEN 'postcode_mismatch'
               END AS issue
        FROM fact_documents
        WHERE (final_confidence < 0 OR final_confidence > 1)
           OR (is_matched AND matched_address IS NULL)
           OR (postcode <> '' AND matched_postcode <> ''
               AND postcode <> matched_postcode)""",
    "vw_dimension_usage_stats": """
        SELECT final_uprn, COUNT(*) AS n_documents,
               AVG(final_confidence) AS avg_conf
        FROM fact_documents WHERE is_matched GROUP BY final_uprn""",
    # --- CSV-export family (internal/engine/exporter.go:60-441); the
    # per-document-type variants are the same projection filtered by
    # source_type, which local synth docs don't carry — these three are
    # the shared shapes
    "vw_csv_export_high_confidence": """
        SELECT doc_id, raw_address, final_uprn, matched_address,
               final_confidence, method
        FROM fact_documents WHERE is_high_confidence""",
    "vw_csv_export_unmatched": """
        SELECT doc_id, raw_address, addr_can, postcode
        FROM fact_documents WHERE NOT is_matched""",
    "vw_csv_export_all_documents": """
        SELECT doc_id, raw_address, final_uprn, matched_address,
               matched_postcode, final_confidence, method, match_quality
        FROM fact_documents""",
}


def register_views(spark: SparkSession, fact: DataFrame) -> list[str]:
    """S8: register the fact table + operational views as temp views."""
    fact.createOrReplaceTempView("fact_documents")
    for name, sql in VIEW_DEFS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")
    return ["fact_documents", *VIEW_DEFS]


def export_enhanced(fact: DataFrame, out_dir: str,
                    partition_by: str | None = "match_quality") -> None:
    """S6: enhanced export — the fact columns a consumer system needs,
    written as CSV partitioned by quality grade (the reference writes
    one CSV per document type; partitioning is the Spark-native shape
    and keeps each grade independently consumable)."""
    cols = ["doc_id", "raw_address", "final_uprn", "matched_address",
            "matched_postcode", "final_confidence", "method",
            "match_quality", "completeness_score", "is_corrected"]
    out = fact.select(*[c for c in cols if c in fact.columns])
    w = out.write.mode("overwrite").option("header", True)
    if partition_by and partition_by in fact.columns:
        w = w.partitionBy(partition_by)
    w.csv(out_dir)
