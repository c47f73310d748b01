"""The linkage_fuzzy oracle's SQL decision replica must stay in
lockstep with operators/decision.decide(): this test runs BOTH on one
crafted scored-pairs fixture that exercises every accept-ladder rung
and the null edge cases, and compares the accepted (addr_id, uprn)
sets. If decide() evolves without the SQL mirror (or vice versa), this
fails locally before the driver's correctness gate does.

The fixture is deliberately adversarial: exact-unique vs exact-twin
(postcode-disambiguated and not), margin exactly at/below the 0.05
gate, the method-confidence rung with NULL and TRUE house_conflict,
the medium+house rung at the 2x margin boundary, vague docs on both
high-score paths, and sub-minimum scores.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from ehdc_llpg_address_matching_spark.operators import decision as D

# one row per case: (addr_id, uprn, methods, score, validator_ok,
# d_vague, house_match, house_exact, house_conflict, pc_match,
# g_source_type, method_conf)
ROWS = [
    # a1: exact-unique hit -> auto_accept (rung 2) even with tiny margin
    ("a1", "U1", ["exact_canonical"], 0.99, True, False, True, True,
     False, True, "original", None),
    ("a1", "U2", ["trigram"], 0.98, True, False, True, False,
     False, False, "original", None),
    # a2: exact TWINS, neither postcode-confirmed -> no exact rung;
    # rank-1 still auto-accepts via rung 3 ONLY if margin >= 0.05
    # (here margin = 0.0 -> NOT accepted)
    ("a2", "U1", ["exact_canonical"], 0.99, True, False, True, True,
     False, False, "original", None),
    ("a2", "U2", ["exact_canonical"], 0.99, True, False, True, True,
     False, False, "original", None),
    # a3: exact twins, exactly ONE postcode-confirmed -> that one wins
    ("a3", "U1", ["exact_canonical"], 0.99, True, False, True, True,
     False, True, "original", None),
    ("a3", "U2", ["exact_canonical"], 0.99, True, False, True, True,
     False, False, "original", None),
    # a4: high score, margin exactly 0.05 -> accepted (>= gate)
    ("a4", "U1", ["trigram"], 0.90, True, False, False, False,
     False, False, "original", None),
    ("a4", "U2", ["trigram"], 0.85, True, False, False, False,
     False, False, "original", None),
    # a5: high score, margin 0.04 -> NOT accepted (review)
    ("a5", "U1", ["trigram"], 0.90, True, False, False, False,
     False, False, "original", None),
    ("a5", "U2", ["trigram"], 0.86, True, False, False, False,
     False, False, "original", None),
    # a6: high score but validator fails, no other rung -> review
    ("a6", "U1", ["trigram"], 0.95, False, False, False, False,
     False, False, "original", None),
    # a7: vague + high score + validator -> accept (capped-confidence
    # rung 4; still in the match set)
    ("a7", "U1", ["trigram"], 0.95, True, True, False, False,
     False, False, "original", None),
    # a8: method-confidence rung: conf 0.95 rule, house_conflict NULL
    # -> the NOT house_conflict condition is NULL -> rung NOT taken;
    # score 0.75 -> review only
    ("a8", "U1", ["rule_rewrite"], 0.75, False, False, False, False,
     None, False, "original", 0.95),
    # a9: method-confidence rung taken (house_conflict False)
    ("a9", "U1", ["rule_rewrite"], 0.75, False, False, False, False,
     False, False, "original", 0.95),
    # a10: method-confidence rung blocked by TRUE house_conflict
    ("a10", "U1", ["rule_rewrite"], 0.75, False, False, False, False,
     True, False, "original", 0.95),
    # a11: medium + house + margin exactly 0.10 -> accept (rung 6)
    ("a11", "U1", ["component"], 0.80, False, False, True, False,
     False, False, "original", None),
    ("a11", "U2", ["component"], 0.70, False, False, False, False,
     False, False, "original", None),
    # a12: medium + house but margin 0.08 < 0.10 -> review
    ("a12", "U1", ["component"], 0.80, False, False, True, False,
     False, False, "original", None),
    ("a12", "U2", ["component"], 0.72, False, False, False, False,
     False, False, "original", None),
    # a13: sub-minimum score with exact method -> rung 1 rejects first
    ("a13", "U1", ["exact_canonical"], 0.55, True, False, True, True,
     False, True, "original", None),
    # a14: score tie broken by pc_match desc -> the pc-confirmed row is
    # rank 1 and accepts via rung 3 (margin 0 after tie... lead gives
    # same score -> margin 0 -> NOT accepted). Guards the tie ORDER
    # itself: both sides must rank the pc-confirmed row first.
    ("a14", "U1", ["trigram"], 0.90, True, False, False, False,
     False, True, "original", None),
    ("a14", "U2", ["trigram"], 0.90, True, False, False, False,
     False, False, "original", None),
]

SCHEMA = ("addr_id string, uprn string, methods array<string>, "
          "score double, validator_ok boolean, d_vague boolean, "
          "house_match boolean, house_exact boolean, "
          "house_conflict boolean, pc_match boolean, "
          "g_source_type string, method_conf double")

# the pairs -> win slice of the linkage_fuzzy oracle SQL, verbatim
# semantics (__spark_entry__._oracle_sql_raw), parameterized only by
# the fixture path
WIN_SQL = """
WITH pairs AS (SELECT * FROM read_parquet('{path}/*.parquet')),
ranked AS (
  SELECT addr_id, uprn, score, pc_match, method_conf, house_conflict,
         house_match, house_exact, validator_ok, d_vague,
         list_contains(methods, 'exact_canonical') AS is_exact,
         row_number() OVER w AS rnk,
         score - coalesce(lead(score) OVER w, 0.0) AS margin,
         SUM(CASE WHEN list_contains(methods, 'exact_canonical')
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY addr_id) AS n_exact,
         SUM(CASE WHEN list_contains(methods, 'exact_canonical')
                   AND pc_match THEN 1 ELSE 0 END)
           OVER (PARTITION BY addr_id) AS n_exact_pc
  FROM pairs
  WINDOW w AS (PARTITION BY addr_id
               ORDER BY score DESC NULLS LAST,
                        pc_match DESC NULLS LAST, uprn ASC))
SELECT addr_id, uprn FROM ranked
WHERE rnk = 1 AND score >= 0.60 AND (
  (is_exact AND (n_exact = 1 OR (pc_match AND n_exact_pc = 1))
   AND validator_ok AND NOT d_vague)
  OR (score >= 0.85 AND margin >= 0.05 AND validator_ok)
  OR (coalesce(method_conf, 0.0) >= 0.85
      AND NOT house_conflict AND margin >= 0.05)
  OR (score >= 0.78 AND (house_match OR house_exact)
      AND margin >= 0.10 AND NOT d_vague))
"""

EXPECTED = {("a1", "U1"), ("a3", "U1"), ("a4", "U1"), ("a7", "U1"),
            ("a9", "U1"), ("a11", "U1")}


def _pairs_df(spark):
    rows = [(a, u, m, s, v, dv, hm, he, hc, pm, st, mc)
            for a, u, m, s, v, dv, hm, he, hc, pm, st, mc in ROWS]
    df = spark.createDataFrame(rows, SCHEMA)
    # decide() consumes the full DECISION_COLS surface
    return df.withColumn("d_core", F.lit("X")) \
             .withColumn("g_core", F.lit("Y"))


def test_decide_matches_sql_mirror(spark, tmp_path):
    path = os.path.join(str(tmp_path), "pairs.parquet")
    _pairs_df(spark).coalesce(1).write.mode("overwrite").parquet(path)

    engine = {(r["addr_id"], r["uprn"])
              for r in D.accepted(
                  D.decide(spark.read.parquet(path)))
              .select("addr_id", "uprn").collect()}
    oracle = {tuple(r) for r in duckdb.connect().execute(
        WIN_SQL.format(path=path)).fetchall()}
    assert engine == oracle, (
        f"engine-only={sorted(engine - oracle)} "
        f"oracle-only={sorted(oracle - engine)}")
    assert engine == EXPECTED, sorted(engine)


def test_entry_sql_contains_mirror():
    """The verbatim-semantics claim above is only safe if the entry's
    SQL still contains the same ladder — anchor on the rung literals
    so an edit to either side forces this file to be revisited. All
    FIVE end-to-end slice entries now compose the ladder from ONE
    fragment (__spark_entry__._sql_ladder), so each must carry the
    same rungs; checking them all keeps that composition honest."""
    import __spark_entry__ as e
    sqls = e.oracle_sql()
    for key in ["linkage_fuzzy", "linkage_vector", "linkage_full",
                "linkage_pipeline", "linkage_phased"]:
        sql = sqls[key]
        for frag in ["score >= 0.60", "n_exact = 1", "margin >= 0.05",
                     "coalesce(method_conf, 0.0) >= 0.85",
                     "margin >= 0.10", "NOT house_conflict",
                     "pc_match DESC NULLS LAST"]:
            assert frag in sql, (key, frag)
