"""Candidate generation — every reference "query per row" re-expressed
as a Spark join (SURVEY.md §2.3).

Contracts:
  uaddr : one row per UNIQUE dirty address (the J11 dedup-join input):
          addr_id, addr_can, addr_core, postcode, tokens,
          house_numbers, c_house, c_street, c_locality, street_phonetic,
          is_vague, easting, northing, block_keys
  gazp  : prepared gazetteer (original ∪ range-expanded):
          uprn, addr_can, addr_core, postcode, tokens, house_numbers,
          c_house, c_street, c_locality, street_phonetic, easting,
          northing, status_code, source_type, embedding

Every generator returns (addr_id, uprn, method). The gazetteer is
broadcast-sized per blocking partition in the local tests; at 100 TB
the doc side is the big side and each join below is either an
equi-join on a blocking key (shuffle both sides on the key — AQE skew
split + explicit salting) or a broadcast of the 72K-row gazetteer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.normalize import with_canonical, with_components
from ..functions.phonetic import with_street_phonetic
from .blocking import explode_keys, salt_hot_keys, with_blocking_keys

MAX_RANGE_UNITS = 50  # reference guard: internal/llpg/range_expander.go:140-181


def expand_ranges(gazp: DataFrame) -> DataFrame:
    """Gazetteer densification (J10; reference:
    internal/llpg/range_expander.go:78-210): '10-11 HIGH ST' spawns
    rows for 10 and 11 (same UPRN), F.sequence + explode; ≤50-unit
    guard; numeric-numeric ranges only (alpha ranges are <0.1% of LLPG
    and fall back to the fuzzy path)."""
    rng = gazp.filter(F.col("c_house").rlike(r"^\d+-\d+$"))
    lo = F.split("c_house", "-").getItem(0).cast("int")
    hi = F.split("c_house", "-").getItem(1).cast("int")
    exp = (rng
           .withColumn("_lo", lo).withColumn("_hi", hi)
           .filter((F.col("_hi") > F.col("_lo")) &
                   (F.col("_hi") - F.col("_lo") <= MAX_RANGE_UNITS))
           .withColumn("_n", F.explode(F.sequence("_lo", "_hi")))
           .withColumn("_ns", F.col("_n").cast("string"))
           .withColumn("addr_can",
                       F.regexp_replace("addr_can", r"\b\d+-\d+\b", F.col("_ns")))
           .withColumn("addr_core",
                       F.regexp_replace("addr_core", r"\b\d+-\d+\b", F.col("_ns")))
           .withColumn("c_house", F.col("_ns"))
           .withColumn("house_numbers", F.array(F.col("_ns")))
           .withColumn("source_type", F.lit("expanded"))
           .drop("_lo", "_hi", "_n", "_ns"))
    return gazp.withColumn("source_type", F.lit("original")).unionByName(exp)


def prepare_gazetteer(gaz: DataFrame) -> DataFrame:
    """Normalize + parse + phonetic + blocking keys + range expansion.
    Mirrors the reference's combined original∪expanded address table
    (cmd/matcher-v2/optimize_layer2.go:23-57)."""
    # derive everything from full_address (the reference re-parses via
    # gopostal too); drop any pre-parsed source columns that would
    # collide with the derived names
    drop = [c for c in ("postcode", "house_number", "street", "locality",
                        "tokens", "house_numbers")
            if c in gaz.columns]
    g = with_canonical(gaz.drop(*drop), raw_col="full_address")
    g = with_components(g, raw_col="full_address")
    g = with_street_phonetic(g, street_col="c_street")
    g = expand_ranges(g)
    g = with_blocking_keys(g)
    return g


def prepare_unique_addresses(docs_norm: DataFrame) -> DataFrame:
    """J11 dedup-join: match once per unique dirty address, fan results
    back to documents later (reference: cmd/matcher-v2/enhanced_layer3.go:50-97).

    The representative row per (addr_can, postcode) is the one from the
    min doc_id (min_by, NOT F.first — first is partition-order-dependent
    and made repeated runs disagree near decision thresholds); the
    representative coordinates come from the min doc_id that HAS
    coordinates (min_by skips rows whose ordering key is null)."""
    rep = F.min_by(
        F.struct("addr_core", "tokens", "house_numbers", "c_house",
                 "c_street", "c_locality", "c_postcode",
                 "street_phonetic", "is_vague"),
        F.col("doc_id")).alias("_rep")
    coord = F.min_by(
        F.struct("easting", "northing"),
        F.when(F.col("easting").isNotNull() &
               F.col("northing").isNotNull(), F.col("doc_id"))).alias("_coord")
    return (docs_norm
            # postcode is part of the identity: '12 HIGH ST' with and
            # without 'GU34 1AA' are different match problems (the
            # postcode disambiguates twin canonical strings)
            .groupBy("addr_can", "postcode")
            .agg(rep, coord)
            .select("addr_can", "postcode", "_rep.*",
                    F.col("_coord.easting").alias("easting"),
                    F.col("_coord.northing").alias("northing"))
            .withColumn("addr_id", F.sha2(
                F.concat_ws("|", "addr_can", "postcode"), 256)))


def legacy_uprn_matches(docs_norm: DataFrame, gazp: DataFrame) -> DataFrame:
    """J1: validate the document's legacy UPRN against the gazetteer
    ('.00' suffix already stripped into uprn_clean). Broadcast join —
    gazetteer is the small side. Returns doc-level direct matches."""
    gaz_uprns = gazp.filter(F.col("source_type") == "original") \
                    .select("uprn").distinct()
    return (docs_norm
            .filter(F.col("uprn_clean").isNotNull())
            .join(F.broadcast(gaz_uprns),
                  F.col("uprn_clean") == F.col("uprn"), "inner")
            .select("doc_id", "uprn",
                    F.lit("legacy_uprn").alias("method"),
                    F.lit(1.0).alias("score")))


def cand_exact_canonical(uaddr: DataFrame, gazp: DataFrame) -> DataFrame:
    """J2: equi-join on the descriptor-stripped canonical string."""
    g = gazp.select(F.col("addr_core").alias("g_core"), "uprn")
    return (uaddr.select("addr_id", "addr_core")
            .join(g, F.col("addr_core") == F.col("g_core"), "inner")
            .select("addr_id", "uprn", F.lit("exact_canonical").alias("method")))


def cand_blocked(uaddr: DataFrame, gazp: DataFrame,
                 hot_threshold: int = 2000, n_salt: int = 8) -> DataFrame:
    """J3: the main fuzzy candidate source. Explode blocking keys on
    both sides, salt hot keys, equi-join on (kind, key, salt). The
    similarity filter happens downstream in the scoring UDF."""
    dk = explode_keys(uaddr, ["addr_id"])
    gk = explode_keys(gazp, ["uprn"])
    dk, gk = salt_hot_keys(dk, gk, hot_threshold=hot_threshold,
                           n_salt=n_salt, doc_id_col="addr_id")
    # no distinct here: a pair meeting under several keys is collapsed
    # by union_candidates' groupBy — one shuffle instead of two
    return (dk.join(gk, ["block_kind", "block_key", "salt"], "inner")
            .select("addr_id", "uprn")
            .withColumn("method", F.lit("blocked_fuzzy")))


def cand_component_joins(uaddr: DataFrame, gazp: DataFrame) -> DataFrame:
    """J4 component-equality strategies + J8 postcode-block join
    (reference: internal/matcher/engine_components_fixed.go:201-241 +
    internal/engine/postcode_matcher.go:143-248):
      (a) postcode + house-number equality        -> 'comp_pc_house'
      (b) street + locality + house equality      -> 'comp_street_loc'
      (c) full-postcode block (J8)                -> 'postcode_block'
    All plain equi-joins on parsed component columns; the strict
    validator downstream enforces the house rule."""
    nh = lambda c: F.regexp_replace(F.upper(F.coalesce(c, F.lit(""))),
                                    r"[^0-9A-Z]", "")
    d = uaddr.select("addr_id",
                     F.col("postcode").alias("d_pc2"),
                     nh(F.col("c_house")).alias("d_h"),
                     F.col("c_street").alias("d_st"),
                     F.col("c_locality").alias("d_loc"))
    g = gazp.select("uprn",
                    F.col("postcode").alias("g_pc2"),
                    nh(F.col("c_house")).alias("g_h"),
                    F.col("c_street").alias("g_st"),
                    F.col("c_locality").alias("g_loc"))
    a = (d.filter((F.col("d_pc2") != "") & (F.col("d_h") != ""))
         .join(g.filter((F.col("g_pc2") != "") & (F.col("g_h") != "")),
               (F.col("d_pc2") == F.col("g_pc2")) &
               (F.col("d_h") == F.col("g_h")))
         .select("addr_id", "uprn")
         .withColumn("method", F.lit("comp_pc_house")))
    b = (d.filter((F.col("d_st") != "") & (F.col("d_h") != "") &
                  (F.col("d_loc") != ""))
         .join(g, (F.col("d_st") == F.col("g_st")) &
               (F.col("d_h") == F.col("g_h")) &
               (F.col("d_loc") == F.col("g_loc")))
         .select("addr_id", "uprn")
         .withColumn("method", F.lit("comp_street_loc")))
    c = (d.filter(F.col("d_pc2") != "")
         .join(g.filter(F.col("g_pc2") != ""),
               F.col("d_pc2") == F.col("g_pc2"))
         .select("addr_id", "uprn")
         .withColumn("method", F.lit("postcode_block")))
    return a.unionByName(b).unionByName(c)


def cand_spatial(uaddr: DataFrame, gazp: DataFrame,
                 radius_m: float = 100.0) -> DataFrame:
    """J6 spatial proximity as a grid-cell range join (reference:
    internal/engine/spatial_matcher.go:158-248, ST_DWithin R=100m).
    Cell = floor(coord/R); doc side explodes into its 3x3 neighborhood
    so the join is a plain equi-join on the cell; exact Euclidean
    filter afterwards. No custom Catalyst rule needed."""
    d = (uaddr
         .filter(F.col("easting").isNotNull() & F.col("northing").isNotNull())
         .select("addr_id", "easting", "northing",
                 F.floor(F.col("easting") / radius_m).alias("cx"),
                 F.floor(F.col("northing") / radius_m).alias("cy")))
    d = (d
         .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
         .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
         .select("addr_id", "easting", "northing",
                 (F.col("cx") + F.col("dx")).alias("cell_x"),
                 (F.col("cy") + F.col("dy")).alias("cell_y")))
    g = (gazp
         .filter(F.col("easting").isNotNull() & F.col("northing").isNotNull())
         .select("uprn",
                 F.col("easting").alias("g_e"), F.col("northing").alias("g_n"),
                 F.floor(F.col("easting") / radius_m).alias("cell_x"),
                 F.floor(F.col("northing") / radius_m).alias("cell_y")))
    dist2 = (F.col("easting") - F.col("g_e")) ** 2 + \
            (F.col("northing") - F.col("g_n")) ** 2
    # no distinct: a (doc, gaz-row) pair meets in exactly one neighbor
    # cell; (addr_id, uprn) duplicates from expanded gazetteer variants
    # are collapsed by union_candidates' groupBy anyway
    return (d.join(g, ["cell_x", "cell_y"], "inner")
            .filter(dist2 <= radius_m * radius_m)
            .select("addr_id", "uprn")
            .withColumn("method", F.lit("spatial")))


# Rule rewrites (J7; reference: internal/engine/rule_matcher.go:50-153).
# Each rule: (pattern, replacement, rule_conf). Applied to addr_core;
# first rule that changes the string wins; the rewritten string feeds
# the exact join (rewritten equality) — fuzzy re-scoring happens later.
REWRITE_RULES = [
    (r"^(LAND |SITE |PLOT \d+ )", "", 0.80),
    (r"\b(\d+)[A-Z]\b", r"$1", 0.70),       # drop alpha suffix fallback
    (r"\bTHE\b ", "", 0.75),
]


def cand_rule_rewrite(uaddr: DataFrame, gazp: DataFrame) -> DataFrame:
    """J7: regex rewrite then exact join on the rewritten string."""
    out = None
    g = gazp.select(F.col("addr_core").alias("g_core"), "uprn")
    for i, (pat, rep, _conf) in enumerate(REWRITE_RULES):
        rw = (uaddr
              .withColumn("_rw", F.regexp_replace("addr_core", pat, rep))
              .withColumn("_rw", F.trim(F.regexp_replace("_rw", r"\s+", " ")))
              .filter(F.col("_rw") != F.col("addr_core"))
              .select("addr_id", "_rw"))
        m = (rw.join(g, F.col("_rw") == F.col("g_core"), "inner")
             .select("addr_id", "uprn")
             .withColumn("method", F.lit(f"rule_{i}")))
        out = m if out is None else out.unionByName(m)
    return out


def cand_vector(uaddr: DataFrame, gazp: DataFrame, embed_dim: int,
                top_k: int = 10, min_sim: float = 0.70) -> DataFrame:
    """J9: embedding ANN without a vector service. The gazetteer
    embedding matrix (n x d float32) is collected once and BROADCAST;
    each Arrow batch of addresses is hash-embedded and scored against
    it with one (batch x d) @ (d x n) GEMM; np.argpartition top-k.

    At 10^12 docs this stays the right shape: the model side is small
    (gazetteer), the doc side streams through mapInPandas, nothing
    shuffles. Replaces Qdrant HNSW (reference: internal/vector/
    qdrant.go:45-110) and the brute-force store (vector_db.go:68-118).
    """
    import numpy as np
    import pandas as pd

    gaz_rows = (gazp.filter(F.col("source_type") == "original")
                .select("uprn", "embedding").collect())
    uprns = np.array([r["uprn"] for r in gaz_rows])
    mat = np.array([r["embedding"] for r in gaz_rows], dtype=np.float32)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    spark = uaddr.sparkSession
    b_uprns = spark.sparkContext.broadcast(uprns)
    b_mat = spark.sparkContext.broadcast(mat)

    from ..functions.embed import hash_embed_batch

    def score_batches(it):
        u = b_uprns.value
        m = b_mat.value
        k = min(top_k, len(u))
        for pdf in it:
            if len(pdf) == 0:
                continue
            q = hash_embed_batch(pdf["addr_core"], m.shape[1])
            sims = q @ m.T  # (batch, n_gaz)
            idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
            rows_sim = np.take_along_axis(sims, idx, axis=1)
            keep = rows_sim >= (2 * min_sim - 1)  # cosine in [-1,1] space
            bi, ki = np.nonzero(keep)
            yield pd.DataFrame({
                "addr_id": pdf["addr_id"].to_numpy()[bi],
                "uprn": u[idx[bi, ki]],
            })

    out = uaddr.select("addr_id", "addr_core").mapInPandas(
        score_batches, schema="addr_id string, uprn string")
    return out.withColumn("method", F.lit("vector"))


def union_candidates(*cands: DataFrame) -> DataFrame:
    """D7 union + dedupe keep-all-methods: one row per (addr_id, uprn)
    with the set of generating methods."""
    allc = cands[0]
    for c in cands[1:]:
        if c is not None:
            allc = allc.unionByName(c)
    return (allc.groupBy("addr_id", "uprn")
            .agg(F.collect_set("method").alias("methods")))
