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

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import DataFrame, functions as F

from ..functions.normalize import norm_house_expr
from .blocking import explode_keys, salt_hot_keys, with_blocking_keys

# reference guard, internal/llpg/range_expander.go:174: reject when
# (end - start) > 50 — i.e. a SPAN of at most 50, which expands to up
# to 51 inclusive house numbers ('47-93' passes, '47-98' does not)
MAX_RANGE_UNITS = 50


def expand_ranges(gazp: DataFrame) -> DataFrame:
    """Gazetteer densification (J10; reference:
    internal/llpg/range_expander.go:78-210): '10-11 HIGH ST' spawns
    rows for 10 and 11 (same UPRN), F.sequence + explode; span ≤ 50
    guard (see MAX_RANGE_UNITS); numeric-numeric ranges only (alpha
    ranges are <0.1% of LLPG and fall back to the fuzzy path)."""
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
    from ..functions.normalize import with_normalized
    from ..session import spread_for_udf
    g = with_normalized(spread_for_udf(gaz.drop(*drop)),
                        raw_col="full_address")
    # materialize the normalized frame ONCE before the range-expansion
    # union: both union branches (original ∪ expanded) reference it, and
    # without a materialization Spark re-executes the whole UDF chain
    # per branch — the round-6 stage profile showed an extra full
    # _parse pass (the range filter) plus a re-canonicalization riding
    # the expanded branch. localCheckpoint preserves the plan's size
    # stats (verified on Spark 4.1), so compact_reference_frame below
    # still sees real sizes. At warehouse scale this frame is cached by
    # every caller anyway — the checkpoint is the same storage class,
    # and it halves the normalization-UDF work per materialization.
    g = g.localCheckpoint(eager=True)
    g = expand_ranges(g)
    g = with_blocking_keys(g)
    # compact the reference frame before callers cache it: the spread +
    # expansion union leaves a small gazetteer as dozens of near-empty
    # partitions that every downstream broadcast build re-scans
    # (session.compact_reference_frame — size-derived, no-op at scale)
    from ..session import compact_reference_frame
    return compact_reference_frame(g)


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
                 "c_street", "c_locality", "c_name", "c_postcode",
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


def missing_legacy_uprns(docs_norm: DataFrame, gazp: DataFrame) -> DataFrame:
    """Documents whose cleaned legacy UPRN is plausibly valid (6-12
    digits — production UPRNs are 9-12; the lower bound guards against
    digit fragments surviving clean_uprn_series) but absent from the
    gazetteer. Anti-join on uprn; the gazetteer side is the distinct
    UPRN projection, so at 10^8 gazetteer rows this is one narrow
    shuffled anti-join Spark can also turn into a broadcast under AQE."""
    gaz_uprns = gazp.filter(F.col("source_type") == "original") \
                    .select("uprn").distinct()
    return (docs_norm
            .filter(F.col("uprn_clean").isNotNull()
                    & F.length("uprn_clean").between(6, 12))
            .select("doc_id", "raw_address",
                    F.col("uprn_clean").alias("uprn"))
            .join(gaz_uprns, "uprn", "left_anti"))


# back-compat alias (pre-round-4 name)
_missing_legacy_uprns = missing_legacy_uprns


def historic_uprn_records(docs_norm: DataFrame, gazp: DataFrame,
                          missing: DataFrame | None = None) -> DataFrame:
    """Bulk historic-UPRN creation — the reference's single largest
    correction bucket (5,119 of 10,015 production corrections,
    ADDRESS_MATCHING_PROCESS.md:239-249): a legacy UPRN that is valid
    but not in the LLPG becomes a NEW gazetteer record flagged
    is_historic, carrying the document's address (reference:
    internal/matcher/engine_components_fixed.go:73-92,765-790, bulk
    path cmd/bulk-historic-uprns/main.go:80-104, schema
    migrations/029_add_historic_uprn_support.sql:8-13).

    One row per missing UPRN; the representative full_address is the
    most common raw_address for that UPRN (the bulk tool's ORDER BY
    document_count DESC), ties broken lexicographically for
    determinism. Output is appendable to the raw gazetteer table
    (Iceberg append at scale).

    `missing` (optional): a precomputed missing_legacy_uprns frame —
    pipeline callers compute it ONCE (cache/localCheckpoint) and feed
    it to both this and historic_uprn_matches, so the gazetteer-UPRN
    distinct + anti-join never executes per consumer."""
    if missing is None:
        missing = missing_legacy_uprns(docs_norm, gazp)
    per_addr = (missing
                .groupBy("uprn", "raw_address")
                .agg(F.count("*").alias("n_docs"),
                     F.min("doc_id").alias("sample_doc")))
    return (per_addr.groupBy("uprn")
            .agg(F.max_by(F.struct("raw_address", "sample_doc"),
                          F.struct("n_docs", "raw_address")).alias("_r"),
                 F.sum("n_docs").alias("n_source_docs"))
            .select("uprn",
                    F.col("_r.raw_address").alias("full_address"),
                    F.lit(True).alias("is_historic"),
                    F.col("_r.sample_doc").alias("source_document_id"),
                    "n_source_docs"))


def historic_uprn_matches(docs_norm: DataFrame, gazp: DataFrame,
                          missing: DataFrame | None = None) -> DataFrame:
    """Doc-level direct matches for the historic path: every document
    whose legacy UPRN triggered historic creation auto-accepts against
    that UPRN at confidence 1.0 (reference decision 'auto_accept',
    engine_components_fixed.go:76-90). Runs BEFORE fuzzy precedence-
    wise — the pipeline's deterministic-beats-fuzzy rule applies.
    `missing`: see historic_uprn_records."""
    if missing is None:
        missing = missing_legacy_uprns(docs_norm, gazp)
    return (missing
            .select("doc_id", "uprn",
                    F.lit("historic_uprn").alias("method"),
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


def cand_component_joins(uaddr: DataFrame, gazp: DataFrame,
                         fuzzy_street_sim: float = 0.8,
                         name_sim: float = 0.8) -> DataFrame:
    """J4 component-equality strategies + J8 postcode-block join
    (reference: internal/matcher/engine_components_fixed.go:201-241,
    322-599 + internal/engine/postcode_matcher.go:143-248):
      (a) postcode + house-number equality        -> 'comp_pc_house'
      (b) street + locality + house equality      -> 'comp_street_loc'
      (c) FUZZY street (trigram >= 0.8) with MANDATORY house equality
          (engine_components_fixed.go:525-599's critical fix) —
          phonetic-street + house as the blocking equi-join, trigram
          verify after                            -> 'comp_fuzzy_road'
      (d) business/property-name similarity >= 0.8
          (engine_components_fixed.go:378-448) — blocked on the name's
          first token + locality                  -> 'business_name'
      (e) full-postcode block (J8)                -> 'postcode_block'
    All blocking steps are equi-joins on parsed component columns; the
    strict validator downstream enforces the house rule. Trigram
    verifies run in whole-stage codegen (trigram_sim_expr over hashed
    gram arrays — identical values to the Python kernel)."""
    from ..functions.similarity import trigram_grams_expr, trigram_sim_expr

    nh = norm_house_expr
    opt = lambda df, c: (F.col(c) if c in df.columns
                         else F.lit("")).alias(c)
    d = uaddr.select("addr_id",
                     F.col("postcode").alias("d_pc2"),
                     nh(F.col("c_house")).alias("d_h"),
                     F.col("c_street").alias("d_st"),
                     F.col("c_locality").alias("d_loc"),
                     opt(uaddr, "c_name").alias("d_name"),
                     opt(uaddr, "street_phonetic").alias("d_phon"))
    g = gazp.select("uprn",
                    F.col("postcode").alias("g_pc2"),
                    nh(F.col("c_house")).alias("g_h"),
                    F.col("c_street").alias("g_st"),
                    F.col("c_locality").alias("g_loc"),
                    opt(gazp, "c_name").alias("g_name"),
                    opt(gazp, "street_phonetic").alias("g_phon"))
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
    # (c): house equality IS the blocking key (with phonetic street to
    # bound the block); exact trigram on the street verifies after.
    # A pair whose street typo changes the phonetic skeleton still
    # meets via the J3 blocked join; this strategy exists to catch
    # same-sounding misspellings with a confirmed house number.
    # (c)/(d) trigram verifies: gram arrays are computed once per SIDE
    # row (before the join fan-out) and ride the equi-join —
    # trigram_grams_expr is interpreted (nested higher-order functions
    # are CodegenFallback), so per-pair evaluation was measurably the
    # strategy's dominant cost (round-6 profile); per-side arrays make
    # the pair verify pure codegen set algebra, the same shape
    # scoring.attach_pair_attrs already uses.
    c = (d.filter((F.col("d_st") != "") & (F.col("d_h") != "") &
                  (F.col("d_phon") != ""))
         .withColumn("_dsg", trigram_grams_expr(F.col("d_st")))
         .join(g.filter((F.col("g_st") != "") & (F.col("g_h") != "") &
                        (F.col("g_phon") != ""))
                .withColumn("_gsg", trigram_grams_expr(F.col("g_st"))),
               (F.col("d_phon") == F.col("g_phon")) &
               (F.col("d_h") == F.col("g_h")))
         .filter(F.col("d_st") != F.col("g_st"))  # exact handled by (b)
         .withColumn("_ssim", trigram_sim_expr(F.col("_dsg"), F.col("_gsg")))
         .filter(F.col("_ssim") >= fuzzy_street_sim)
         .select("addr_id", "uprn")
         .withColumn("method", F.lit("comp_fuzzy_road")))
    # (d): property/business names ('ROSE COTTAGE', 'MARKS AND
    # SPENCER'): block on (first name token, locality), trigram verify
    nm = (d.filter(F.col("d_name") != "")
          .withColumn("_tok1", F.split("d_name", " ").getItem(0))
          .withColumn("_dng", trigram_grams_expr(F.col("d_name")))
          .join(g.filter(F.col("g_name") != "")
                 .withColumn("_tok1", F.split("g_name", " ").getItem(0))
                 .withColumn("_gng", trigram_grams_expr(F.col("g_name"))),
                "_tok1")
          .filter((F.col("d_loc") == "") | (F.col("g_loc") == "") |
                  (F.col("d_loc") == F.col("g_loc")))
          .withColumn("_nsim", trigram_sim_expr(F.col("_dng"), F.col("_gng")))
          .filter(F.col("_nsim") >= name_sim)
          .select("addr_id", "uprn")
          .withColumn("method", F.lit("business_name")))
    e = (d.filter(F.col("d_pc2") != "")
         .join(g.filter(F.col("g_pc2") != ""),
               F.col("d_pc2") == F.col("g_pc2"))
         .select("addr_id", "uprn")
         .withColumn("method", F.lit("postcode_block")))
    return a.unionByName(b).unionByName(c).unionByName(nm).unionByName(e)


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


# Rule rewrites (J7; reference: internal/engine/rule_matcher.go:50-153):
# (name, pattern, replacement, base_confidence). Applied to addr_can
# (descriptors still present); FIRST matching rule wins (list order);
# the rewritten string feeds a TRIGRAM join (sim >= 0.70, top 5), and
# the rule confidence is adjusted by similarity (+0.10 at sim>=0.90,
# +0.05 at sim>=0.80 — rule_matcher.go:364-377).
REWRITE_RULES = [
    ("lucky_lite_farm", r"LUCKY LITE FARM.*",
     "LUCKYLITE FARM CATHERINGTON LANE HORNDEAN", 0.95),
    ("lasham_airfield", r"LASHAM AIRFIELD.*", "LASHAM AERODROME LASHAM", 0.90),
    ("four_marks_spacing", r"FOUR MARKS", "FOURMARKS", 0.85),
    ("co_op_variations", r"(?:CO-OP|COOP|CO OP)", "COOPERATIVE", 0.80),
    ("former_site_prefix", r"FORMER SITE OF (.+)", "$1", 0.75),
    ("land_at_prefix", r"LAND AT (.+)", "$1", 0.70),
    ("rear_of_references", r"REAR OF (\d+[A-Z]?\s.+)", "$1A", 0.65),
    ("adjacent_to", r"ADJ(?:ACENT)? TO (.+)", "$1", 0.60),
    ("opposite_references", r"OPP(?:OSITE)? (.+)", "$1", 0.60),
    ("compass_expansion", r"\b[NSEW]\b", None, 0.75),  # special-cased
]


def _compass_expand(col):
    out = col
    for a, b in (("N", "NORTH"), ("S", "SOUTH"), ("E", "EAST"), ("W", "WEST")):
        out = F.regexp_replace(out, rf"\b{a}\b", b)
    return out


def gaz_hot_tokens(gazp: DataFrame, token_df_cap: int) -> DataFrame:
    """Tokens whose gazetteer document-frequency exceeds the cap.
    STOP_TOKENS drops THE/OF/AND but NOT street suffixes: at a 10^8-row
    gazetteer a bare ROAD/LANE token joins every document against
    millions of rows before any >=2-shared-tokens aggregation can
    prune. The hot set is tiny (a handful of suffixes/localities), so
    both join sides drop it with a broadcast anti-join — a map-side
    filter, no extra shuffle. With the cap, token-blocked join output
    is bounded by sum_over_rare_tokens df_docs(t) * df_gaz(t) with
    df_gaz(t) <= cap — linear in the doc side, never quadratic."""
    return (gazp.select(F.explode(F.array_distinct("tokens")).alias("tok"))
            .groupBy("tok").agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > token_df_cap)
            .select("tok"))


def cand_rule_rewrite(uaddr: DataFrame, gazp: DataFrame,
                      min_sim: float = 0.70, top_k: int = 5,
                      token_df_cap: int = 10000,
                      keep_sim: bool = False) -> DataFrame:
    """J7 full rule matcher: first-matching-rule rewrite (single
    when-chain projection — no per-rule pass over the corpus), token
    equi-join blocking (>=2 shared RARE tokens — tokens above
    token_df_cap gazetteer df are dropped from the join key on both
    sides, see gaz_hot_tokens), trigram sim >= min_sim, top-k per
    address, per-rule confidence +-adjusted by similarity.
    Returns (addr_id, uprn, method, method_conf); keep_sim=True
    appends the raw trigram sim (audit / oracle slicing)."""
    from ..functions.normalize import STOP_TOKENS
    from ..functions.similarity import trigram_grams_expr, trigram_sim_expr

    # first matching rule wins: one nested CASE expression, built
    # innermost-last so the FIRST rule is the outermost WHEN
    chain = None
    for name, pat, rep, conf in reversed(REWRITE_RULES):
        rw = (_compass_expand(F.col("addr_can")) if rep is None
              else F.regexp_replace("addr_can", pat, rep))
        rw = F.trim(F.regexp_replace(rw, r"\s+", " "))
        hit = F.col("addr_can").rlike(pat)
        branch = F.struct(F.lit(name).alias("rule"),
                          F.lit(conf).alias("conf"), rw.alias("rw"))
        chain = (F.when(hit, branch) if chain is None
                 else F.when(hit, branch).otherwise(chain))

    rw = (uaddr.select("addr_id", "addr_can")
          .withColumn("_r", chain)
          .filter(F.col("_r").isNotNull() &
                  (F.col("_r.rw") != F.col("addr_can")))
          .select("addr_id",
                  F.col("_r.rule").alias("rule"),
                  F.col("_r.conf").alias("base_conf"),
                  F.col("_r.rw").alias("rw")))
    toks = F.array_distinct(F.filter(
        F.split("rw", " "),
        lambda t: (F.length(t) >= 2) & ~t.isin(*STOP_TOKENS)))
    hot = gaz_hot_tokens(gazp, token_df_cap)
    # ids-only through the token join and the shared-token count: rule /
    # base_conf / rw are FUNCTIONS of addr_id (first-matching-rule), so
    # carrying them through the explode+join+groupBy only widened the
    # shuffles — they re-attach with the gram join below
    rw_tok = (rw.select("addr_id", F.explode(toks).alias("tok"))
              .join(F.broadcast(hot), "tok", "left_anti"))
    g_tok = (gazp.select("uprn", F.col("addr_core").alias("g_core"),
                         F.explode(F.array_distinct("tokens")).alias("tok"))
             .join(F.broadcast(hot), "tok", "left_anti"))
    cand = (rw_tok.join(g_tok, "tok")
            .groupBy("addr_id", "uprn", "g_core")
            .agg(F.count("*").alias("_n_common"))
            .filter(F.col("_n_common") >= 2))

    from pyspark.sql import Window
    w = Window.partitionBy("addr_id").orderBy(F.desc("sim"), F.asc("uprn"))
    adj = (F.when(F.col("sim") >= 0.90, F.col("base_conf") + 0.10)
           .when(F.col("sim") >= 0.80, F.col("base_conf") + 0.05)
           .otherwise(F.col("base_conf")))
    # Per-SIDE gram arrays, re-attached to the candidate pairs by
    # equi-join — NOT computed per pair: trigram_grams_expr is built
    # from nested higher-order functions (transform/flatten), which are
    # CodegenFallback in Spark (interpreted, ~10-100x slower than
    # codegen), so evaluating it once per candidate row was this
    # generator's dominant cost (round-6 measured: 55 s for the sim
    # filter over 57K pairs at the 20K-doc bench corpus vs ~1 s per
    # side). One gram row per rewritten address (addr_id is unique in
    # `rw` — first-matching-rule) and per DISTINCT gazetteer core
    # string; both frames are small next to the pair set, and at scale
    # the re-attach is the standard decide-small/attach-once shape.
    rw_grams = rw.select("addr_id", "rule", "base_conf",
                         trigram_grams_expr(F.col("rw")).alias("_rwg"))
    g_grams = (gazp.select(F.col("addr_core").alias("g_core")).distinct()
               .select("g_core",
                       trigram_grams_expr(F.col("g_core")).alias("_gg")))
    return (cand
            .join(rw_grams, "addr_id")
            .join(g_grams, "g_core")
            # JVM trigram verify (identical values to the Python kernel)
            .withColumn("sim", trigram_sim_expr(F.col("_rwg"), F.col("_gg")))
            .filter(F.col("sim") >= min_sim)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= top_k)
            .select("addr_id", "uprn",
                    F.concat(F.lit("rule_"), "rule").alias("method"),
                    F.least(adj, F.lit(1.0)).alias("method_conf"),
                    *([F.col("sim")] if keep_sim else [])))


# J5 hierarchical cascade levels (reference:
# internal/engine/hierarchical_matcher.go:51-107): most -> least
# specific with base scores 0.95 -> 0.70; stop at the FIRST level that
# yields hits for an address; keep <= 5 candidates per level.
HIER_BASE = {
    "postcode_house": 0.95,
    "street_house_locality": 0.90,
    "street_locality": 0.80,
    "street_phonetic": 0.75,
    "locality_only": 0.70,
}


def cand_hierarchical(uaddr: DataFrame, gazp: DataFrame,
                      top_k: int = 5) -> DataFrame:
    """J5: 5-level component cascade with stop-at-first-hit semantics.

    Two passes (round-6 restructure):

    1. PROBE: one LEFT SEMI join per level over the full address set —
       "does this address have ANY hit at level k". Semi joins never
       fan out (output <= |d| rows of just addr_id), so probing the
       hot levels 4-5 for every address is safe at any scale, unlike
       their full joins. One tiny groupBy then yields each address's
       winning (minimum) level.
    2. FETCH: each level's full join runs ONLY for the addresses whose
       winning level it is — exactly the rows stop-at-first keeps, and
       a subset of what the previous residue-anti-join chain joined
       (its l4 join ran for every level-1-3 miss, including addresses
       whose l4 rows a later step discarded).

    Output is identical to the sequential residue formulation: per
    address the same winning level and the same hit set. The win is
    plan shape: the residue chain serialized ~10 dependent stage
    materializations (each level's anti-join waited on the previous
    level's distinct), where the probe pass runs all five semi joins
    CONCURRENTLY and the fetch pass all five full joins concurrently —
    critical path ~5 stages instead of ~10, and only one small frame
    (ids + winning level) is cached instead of three level frames.
    cache(), not an eager localCheckpoint, for the same reason as
    before: lazy, so the probe subtree executes once inside the
    downstream candidate-union job at full parallelism.

    Returns (addr_id, uprn, method='hier_<level>', method_conf=base).
    """
    from pyspark.sql import Window

    nh = norm_house_expr
    d = uaddr.select("addr_id",
                     F.col("postcode").alias("d_pc"),
                     nh(F.col("c_house")).alias("d_h"),
                     F.col("c_street").alias("d_st"),
                     F.col("c_locality").alias("d_loc"),
                     F.col("street_phonetic").alias("d_phon"))
    g = gazp.select("uprn",
                    F.col("postcode").alias("g_pc"),
                    nh(F.col("c_house")).alias("g_h"),
                    F.col("c_street").alias("g_st"),
                    F.col("c_locality").alias("g_loc"),
                    F.col("street_phonetic").alias("g_phon"))

    # (rank, name, d-side filter, g-side filter, join condition) — the
    # SAME filters/conditions drive both the semi probe and the fetch,
    # so the two passes cannot disagree.
    levels = [
        (1, "postcode_house",
         (F.col("d_pc") != "") & (F.col("d_h") != ""),
         (F.col("g_pc") != "") & (F.col("g_h") != ""),
         (F.col("d_pc") == F.col("g_pc")) & (F.col("d_h") == F.col("g_h"))),
        (2, "street_house_locality",
         (F.col("d_st") != "") & (F.col("d_h") != ""),
         (F.col("g_st") != "") & (F.col("g_h") != ""),
         (F.col("d_st") == F.col("g_st")) & (F.col("d_h") == F.col("g_h"))
         & ((F.col("d_loc") == "") | (F.col("g_loc") == "") |
            (F.col("d_loc") == F.col("g_loc")))),
        (3, "street_locality",
         (F.col("d_st") != "") & (F.col("d_loc") != ""),
         F.lit(True),
         (F.col("d_st") == F.col("g_st")) &
         (F.col("d_loc") == F.col("g_loc"))),
        (4, "street_phonetic",
         F.col("d_phon") != "",
         F.col("g_phon") != "",
         F.col("d_phon") == F.col("g_phon")),
        (5, "locality_only",
         F.col("d_loc") != "",
         F.col("g_loc") != "",
         F.col("d_loc") == F.col("g_loc")),
    ]

    probes = [
        d.filter(df_).join(g.filter(gf), cond, "left_semi")
         .select("addr_id", F.lit(rank).alias("_lvl"))
        for rank, _, df_, gf, cond in levels
    ]
    allp = probes[0]
    for p in probes[1:]:
        allp = allp.unionByName(p)
    winners = allp.groupBy("addr_id").agg(F.min("_lvl").alias("_lvl"))
    # addresses with no hit at any level drop out here (inner join),
    # exactly as they produced no rows before
    d_ann = d.join(winners, "addr_id").cache()

    def lvl(df, name):
        return df.select("addr_id", "uprn",
                         F.lit(name).alias("level_name"),
                         F.lit(HIER_BASE[name]).alias("method_conf"))

    parts = [
        lvl(d_ann.filter((F.col("_lvl") == rank) & df_)
            .join(g.filter(gf), cond), name)
        for rank, name, df_, gf, cond in levels
    ]
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)

    w_k = Window.partitionBy("addr_id").orderBy(F.asc("uprn"))
    return (allc.dropDuplicates(["addr_id", "uprn"])
            .withColumn("_rn", F.row_number().over(w_k))
            .filter(F.col("_rn") <= top_k)
            .select("addr_id", "uprn",
                    F.concat(F.lit("hier_"), "level_name").alias("method"),
                    "method_conf"))


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
                # clamp to the reference's (dot+1)/2 in [0,1]
                # (internal/engine/vector_db.go:171-193)
                "vec_sim": (rows_sim[bi, ki].astype(float) + 1.0) / 2.0,
            })

    out = uaddr.select("addr_id", "addr_core").mapInPandas(
        score_batches, schema="addr_id string, uprn string, vec_sim double")
    return out.withColumn("method", F.lit("vector"))


def cand_vector_ivf(uaddr: DataFrame, gazp: DataFrame,
                    top_k: int = 10, min_sim: float = 0.70,
                    n_cells: int = 64, n_probe: int = 8,
                    embed_dim: int = 0) -> DataFrame:
    """J9 at gazetteer scales where broadcast is impossible: a 10^8-row
    x 384-dim float32 gazetteer matrix is ~150 GB — cand_vector's
    collect-and-broadcast GEMM (the right plan for the reference's
    72K-row gazetteer) cannot ship that to every executor. This path
    routes the same semantics through the IVF coarse quantizer
    (operators/ann.ivf_topk): centroids train on a bounded seeded
    sample, the gazetteer is bucketed by nearest centroid in one
    map-only pass, each address probes its n_probe nearest cells, and
    the only shuffle is the equi-join on the short cell id. Recall is
    tunable via n_probe (n_probe = n_cells degenerates to exact).

    Returns (addr_id, uprn, vec_sim, method='vector') — same contract
    and the reference's (dot+1)/2 similarity convention as
    cand_vector, so the two are drop-in alternatives behind
    PipelineConfig.vector_mode."""
    from .ann import ivf_topk
    from ..functions.embed import hash_embed_batch

    if embed_dim <= 0:
        # one-row schema probe of the corpus embedding width — O(1)
        # at any corpus scale (not the whole-matrix collect this
        # path exists to avoid)
        embed_dim = len(gazp.select("embedding").first()[0])

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, FloatType

    @pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        m = hash_embed_batch(texts, embed_dim)
        return pd.Series([row.tolist() for row in m])

    q = uaddr.select(F.col("addr_id").alias("vec_id"),
                     _embed(F.col("addr_core")).alias("embedding"))
    c = (gazp.filter(F.col("source_type") == "original")
         .select(F.col("uprn").alias("vec_id"), "embedding"))
    out = ivf_topk(q, c, k=top_k, n_cells=n_cells, n_probe=n_probe,
                   exclude_self=False)
    # same keep-gate as cand_vector: cosine >= 2*min_sim - 1, reported
    # in the reference's (dot+1)/2 in-[0,1] space
    return (out.filter(F.col("cosine") >= 2 * min_sim - 1)
            .select(F.col("query_id").alias("addr_id"),
                    F.col("neighbor_id").alias("uprn"),
                    ((F.col("cosine") + 1.0) / 2.0).alias("vec_sim"),
                    F.lit("vector").alias("method")))


def union_candidates(*cands: DataFrame) -> DataFrame:
    """D7 union + dedupe keep-all-methods: one row per (addr_id, uprn)
    with the set of generating methods and the max method-carried
    confidence (rule/hierarchical base scores; null for the purely
    similarity-scored generators)."""
    withc = []
    for c in cands:
        if c is None:
            continue
        for col in ("method_conf", "vec_sim"):
            if col not in c.columns:
                c = c.withColumn(col, F.lit(None).cast("double"))
        withc.append(c)
    allc = withc[0]
    for c in withc[1:]:
        allc = allc.unionByName(c)
    return (allc.groupBy("addr_id", "uprn")
            .agg(F.collect_set("method").alias("methods"),
                 F.max("method_conf").alias("method_conf"),
                 F.max("vec_sim").alias("vec_sim")))
