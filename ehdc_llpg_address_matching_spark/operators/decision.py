"""Tiered decision with winner margin (SURVEY.md §2.5 D5-D8).

Pure window-function logic: per address, rank candidates by score,
compute the margin to the runner-up, and apply the reference's tiered
accept/review/reject rules (internal/match/scorer.go:142-198 tiers +
internal/engine/fuzzy.go:49-59 production thresholds). Keep-best
dedupe per (addr, uprn) happens first (D7), then top-k truncation for
the audit table (D6).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F


# the columns the decision windows actually need — everything else
# (canonical strings, token arrays, coordinates) should NOT ride through
# the two window shuffles; at 10^12-doc scale the shuffle payload is the
# cost, so project narrow first and join attributes back onto the
# (small) surviving top-k for audit
DECISION_COLS = [
    "addr_id", "uprn", "methods", "score", "validator_ok", "d_vague",
    "house_match", "house_exact", "house_conflict", "pc_match",
    "g_source_type", "method_conf",
    # d_core/g_core ride the decision shuffles so the audit table can
    # attach canonical strings WITHOUT re-executing the candidate
    # attach join (two narrow strings on <=top-k survivors vs a whole
    # repeated uaddr x gazp join at 10^11 pairs)
    "d_core", "g_core",
]


def narrow_for_decision(pairs: DataFrame) -> DataFrame:
    return pairs.select(*DECISION_COLS)


@dataclass(frozen=True)
class Thresholds:
    """Production fuzzy-engine tiers (internal/engine/fuzzy.go:49-59)."""
    high: float = 0.85
    medium: float = 0.78
    review: float = 0.70
    minimum: float = 0.60
    winner_margin: float = 0.05

    @classmethod
    def spec_tiers(cls) -> "Thresholds":
        """The spec-engine's recommended tiers (reference
        internal/match/types.go:49-57 DefaultTiers) — pair these with
        PipelineConfig(scorer='spec')."""
        return cls(high=0.92, medium=0.88, review=0.80, minimum=0.70,
                   winner_margin=0.03)


def keep_best_per_uprn(pairs: DataFrame) -> DataFrame:
    """D7: several gazetteer variants / methods can produce the same
    (addr, uprn) — keep the max-score row.

    Implemented as groupBy + max_by (NOT a window): partial aggregation
    combines map-side, so only one pre-reduced row per (addr, uprn)
    crosses the shuffle — at 10^12 pairs the window formulation would
    shuffle + sort every candidate row. Ordering key is made total
    (score, original-before-expanded, g_core) so ties break
    deterministically."""
    cols = [c for c in pairs.columns if c not in ("addr_id", "uprn")]
    order = F.struct(
        F.col("score"),
        (F.col("g_source_type") == "original").cast("int").alias("_orig"),
        F.coalesce(F.col("g_core") if "g_core" in pairs.columns
                   else F.lit(""), F.lit("")).alias("_tb"))
    return (pairs
            .groupBy("addr_id", "uprn")
            .agg(F.max_by(F.struct(*cols), order).alias("_s"))
            .select("addr_id", "uprn", "_s.*"))


def decide(pairs: DataFrame, t: Thresholds = Thresholds(),
           top_k: int = 10) -> DataFrame:
    """Adds rank / margin / decision; keeps top_k per address for audit.

    Decision ladder (D5 + D8 banding + N10 vague gate):
      auto_accept : rank 1, score>=high, margin>=winner_margin,
                    validator_ok, not vague
      accept      : rank 1, score>=medium, house_match, margin>=2*wm
      review      : rank 1, score>=review
      reject      : everything else
    """
    if "method_conf" not in pairs.columns:
        pairs = pairs.withColumn("method_conf",
                                 F.lit(None).cast("double"))
    # absence of house information is NOT a house conflict: backfill
    # False (not NULL) so the rule-confidence rung stays reachable for
    # callers whose pairs never computed house features — with a NULL
    # backfill, ~NULL is NULL and the rung silently never fires.
    # Rows that explicitly carry NULL in a PRESENT column keep it
    # (the SQL oracle mirror sees the same three-valued skip).
    if "house_conflict" not in pairs.columns:
        pairs = pairs.withColumn("house_conflict", F.lit(False))
    # pc_match breaks score ties so the postcode-confirmed twin ranks
    # first even when both clamp to the same score
    w = Window.partitionBy("addr_id").orderBy(
        F.desc("score"), F.desc("pc_match"), F.asc("uprn"))
    is_exact = F.array_contains("methods", "exact_canonical")
    pairs = (pairs
             .withColumn("rank", F.row_number().over(w))
             .withColumn("margin",
                         F.col("score") -
                         F.coalesce(F.lead("score", 1).over(w), F.lit(0.0)))
             .withColumn("_n_exact",
                         F.sum(is_exact.cast("int")).over(
                             Window.partitionBy("addr_id")))
             .withColumn("_n_exact_pc",
                         F.sum((is_exact & F.col("pc_match")).cast("int"))
                         .over(Window.partitionBy("addr_id")))
             .filter(F.col("rank") <= top_k))
    is_top = F.col("rank") == 1
    # unique exact hit, OR several exact hits of which exactly one also
    # matches the full postcode (postcode disambiguates twins)
    exact_unique = (is_exact & (F.col("_n_exact") == 1)) | \
        (is_exact & F.col("pc_match") & (F.col("_n_exact_pc") == 1))
    decision = (
        F.when(~is_top | (F.col("score") < t.minimum), "reject")
        # a UNIQUE exact-canonical hit auto-accepts regardless of the
        # fuzzy margin to near-twin addresses (reference:
        # internal/engine/deterministic.go:146-178 — 1 hit -> 0.99);
        # truly ambiguous exact hits fall through to review
        .when(is_top & exact_unique
              & F.col("validator_ok") & ~F.col("d_vague"), "auto_accept")
        .when((F.col("score") >= t.high) & (F.col("margin") >= t.winner_margin)
              & F.col("validator_ok") & ~F.col("d_vague"), "auto_accept")
        # vague/descriptor addresses can still be accepted on a very
        # strong rewritten match, at capped (halved) confidence — the
        # rule-matcher path (reference: internal/engine/rule_matcher.go:
        # 274-382, per-rule confidence 0.60-0.95)
        .when((F.col("score") >= t.high) & (F.col("margin") >= t.winner_margin)
              & F.col("validator_ok") & F.col("d_vague"), "accept")
        # rule / hierarchical confidence rung: a high-confidence rule
        # rewrite (>= 0.85 after sim adjustment) or a top cascade level
        # accepts on its own authority (reference rule_matcher.go:209-216,
        # hierarchical_matcher.go:158-165) — still gated on no house
        # conflict (D4) and a clear winner margin. Deliberately NOT
        # gated on validator_ok: the reference's rule matcher accepts
        # purely on rule confidence ("High confidence rule - auto
        # accept", rule_matcher.go:209-211) with no strict-validator
        # pass; our extra house-conflict + margin gates are already
        # stricter than the reference here.
        .when((F.coalesce(F.col("method_conf"), F.lit(0.0)) >= t.high)
              & ~F.col("house_conflict")
              & (F.col("margin") >= t.winner_margin), "accept")
        .when((F.col("score") >= t.medium)
              & (F.col("house_match") | F.col("house_exact"))
              & (F.col("margin") >= 2 * t.winner_margin)
              & ~F.col("d_vague"), "accept")
        .when(F.col("score") >= t.review, "review")
        .otherwise("reject"))
    # confidence: the method-carried base score (rule/cascade level)
    # floors the reported confidence; vague docs are halved UNLESS a
    # rule explicitly handled the descriptor (J7's whole purpose)
    base = F.greatest(F.col("score"),
                      F.coalesce(F.col("method_conf"), F.lit(0.0)))
    confidence = (
        F.when(F.col("d_vague") & F.col("method_conf").isNull(),
               F.col("score") * 0.5)
        .when(F.col("d_vague"),
              F.greatest(F.col("score") * 0.5, F.col("method_conf")))
        .otherwise(base))
    return (pairs
            .withColumn("decision", decision)
            .withColumn("confidence", confidence))


def accepted(decided: DataFrame) -> DataFrame:
    """(addr_id, uprn, score, confidence, methods) of accepted winners."""
    return (decided
            .filter(F.col("decision").isin("auto_accept", "accept"))
            .select("addr_id", "uprn", "score", "confidence", "methods",
                    "decision"))
