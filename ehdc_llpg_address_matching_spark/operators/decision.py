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


@dataclass(frozen=True)
class Thresholds:
    """Production fuzzy-engine tiers (internal/engine/fuzzy.go:49-59)."""
    high: float = 0.85
    medium: float = 0.78
    review: float = 0.70
    minimum: float = 0.60
    winner_margin: float = 0.05


def keep_best_per_uprn(pairs: DataFrame) -> DataFrame:
    """D7: several gazetteer variants / methods can produce the same
    (addr, uprn) — keep the max-score row, union the method sets."""
    w = Window.partitionBy("addr_id", "uprn").orderBy(
        F.desc("score"), F.asc("g_source_type"))
    return (pairs
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))


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
    w = Window.partitionBy("addr_id").orderBy(F.desc("score"), F.asc("uprn"))
    pairs = (pairs
             .withColumn("rank", F.row_number().over(w))
             .withColumn("margin",
                         F.col("score") -
                         F.coalesce(F.lead("score", 1).over(w), F.lit(0.0)))
             .filter(F.col("rank") <= top_k))
    is_top = F.col("rank") == 1
    decision = (
        F.when(~is_top | (F.col("score") < t.minimum), "reject")
        .when((F.col("score") >= t.high) & (F.col("margin") >= t.winner_margin)
              & F.col("validator_ok") & ~F.col("d_vague"), "auto_accept")
        # vague/descriptor addresses can still be accepted on a very
        # strong rewritten match, at capped (halved) confidence — the
        # rule-matcher path (reference: internal/engine/rule_matcher.go:
        # 274-382, per-rule confidence 0.60-0.95)
        .when((F.col("score") >= t.high) & (F.col("margin") >= t.winner_margin)
              & F.col("validator_ok") & F.col("d_vague"), "accept")
        .when((F.col("score") >= t.medium)
              & (F.col("house_match") | F.col("house_exact"))
              & (F.col("margin") >= 2 * t.winner_margin)
              & ~F.col("d_vague"), "accept")
        .when(F.col("score") >= t.review, "review")
        .otherwise("reject"))
    confidence = F.when(F.col("d_vague"), F.col("score") * 0.5) \
                  .otherwise(F.col("score"))
    return (pairs
            .withColumn("decision", decision)
            .withColumn("confidence", confidence))


def accepted(decided: DataFrame) -> DataFrame:
    """(addr_id, uprn, score, confidence, methods) of accepted winners."""
    return (decided
            .filter(F.col("decision").isin("auto_accept", "accept"))
            .select("addr_id", "uprn", "score", "confidence", "methods",
                    "decision"))
