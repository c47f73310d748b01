"""Full-quality evaluation at bench scale: overall, per-difficulty, and
per-blocking-key pairwise F1 (north rule: F1 >= 0.99 per blocking key),
with the deliberately-hot postcode sector called out (skew must not
cost correctness). Writes EVAL.md.

Run: PYTHONPATH=/root/repo python3 tools/eval_f1.py [n_docs n_gaz]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd

from ehdc_llpg_address_matching_spark.pipeline import run_pipeline
from ehdc_llpg_address_matching_spark.session import get_spark
from ehdc_llpg_address_matching_spark.synth import SynthConfig, synth_tables


def prf(df: pd.DataFrame) -> tuple[int, int, int, float, float, float]:
    tp = int(((df.uprn_pred.notna()) & (df.uprn == df.uprn_pred)).sum())
    fp = int(((df.uprn_pred.notna()) & (df.uprn != df.uprn_pred)
              & (df.uprn.notna())).sum()
             + ((df.uprn_pred.notna()) & (df.uprn.isna())).sum())
    fn = int(((df.uprn.notna()) & (df.uprn_pred.isna())).sum())
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    f1 = 2 * p * r / max(p + r, 1e-12)
    return tp, fp, fn, p, r, f1


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_gaz = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    spark = get_spark()
    gaz, docs, gold = synth_tables(SynthConfig(seed=42, n_gazetteer=n_gaz,
                                               n_docs=n_docs))
    t0 = time.time()
    out = run_pipeline(spark, spark.createDataFrame(docs),
                       spark.createDataFrame(gaz))
    m = out["matches"].select("doc_id", "uprn", "method").toPandas()
    wall = time.time() - t0
    j = gold.merge(m.rename(columns={"uprn": "uprn_pred"}),
                   on="doc_id", how="left")
    j["pc_sector"] = j["postcode"].str.extract(r"^(\w+ \d)")[0]

    lines = [
        "# EVAL — pairwise quality at bench scale",
        "",
        f"Corpus: seed 42, {n_gaz} gazetteer rows x {n_docs} documents "
        f"(synth.py), full pipeline on local[32], {wall:.0f}s wall.",
        "",
        "## Overall",
        "",
        "| tp | fp | fn | precision | recall | F1 |",
        "|---|---|---|---|---|---|",
    ]
    tp, fp, fn, p, r, f1 = prf(j)
    lines.append(f"| {tp} | {fp} | {fn} | {p:.4f} | {r:.4f} | {f1:.4f} |")

    lines += ["", "## Per corruption profile", "",
              "| difficulty | n | precision | recall | F1 |",
              "|---|---|---|---|---|"]
    for d, grp in j.groupby("difficulty"):
        tp, fp, fn, p, r, f1 = prf(grp)
        lines.append(f"| {d} | {len(grp)} | {p:.4f} | {r:.4f} | {f1:.4f} |")

    lines += ["", "## Per blocking key (postcode sector), worst 10 by F1",
              "",
              "The generator concentrates ~20% of the gazetteer in one "
              "hot sector (GU10 1) — skew handling must not cost "
              "correctness there.", "",
              "| pc_sector | n | precision | recall | F1 | hot |",
              "|---|---|---|---|---|---|"]
    rows = []
    for s, grp in j[j.pc_sector.notna()].groupby("pc_sector"):
        if len(grp) < 5:
            continue
        tp, fp, fn, p, r, f1 = prf(grp)
        rows.append((s, len(grp), p, r, f1, "yes" if s == "GU10 1" else ""))
    rows.sort(key=lambda x: x[4])
    n_below = sum(1 for x in rows if x[4] < 0.99)
    for s, n, p, r, f1, hot in rows[:10]:
        lines.append(f"| {s} | {n} | {p:.4f} | {r:.4f} | {f1:.4f} | {hot} |")
    lines += ["",
              f"Sectors with >=5 docs: {len(rows)}; sectors below F1 0.99: "
              f"{n_below}.",
              "",
              f"Hot-sector row: "
              + next((f"F1 {x[4]:.4f} over {x[1]} docs" for x in rows
                      if x[5] == "yes"), "n/a"),
              ]

    # Seed robustness: the gate must not be a seed-42 artifact. Five
    # unseen seeds at a smaller scale (each ~30 s after JVM warmup).
    lines += ["", "## Seed robustness (unseen seeds, 600 gaz x 1200 docs)",
              "",
              "| seed | n_gold | precision | recall | F1 |",
              "|---|---|---|---|---|"]
    worst = 1.0
    for seed in (1, 7, 99, 1234, 2026):
        sg, sd, sgold = synth_tables(SynthConfig(seed=seed,
                                                 n_gazetteer=600,
                                                 n_docs=1200))
        so = run_pipeline(spark, spark.createDataFrame(sd),
                          spark.createDataFrame(sg))
        sm = so["matches"].select("doc_id", "uprn").toPandas()
        sj = sgold.merge(sm.rename(columns={"uprn": "uprn_pred"}),
                         on="doc_id", how="left")
        tp, fp, fn, p, r, f1 = prf(sj)
        worst = min(worst, f1)
        lines.append(f"| {seed} | {int(sj.uprn.notna().sum())} | {p:.4f} "
                     f"| {r:.4f} | {f1:.4f} |")
    lines += ["", f"Worst seed F1: {worst:.4f} (gate: >= 0.99 on every "
                  "seed, no per-seed tuning anywhere in the pipeline)."]
    with open("/root/repo/EVAL.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[:12]))
    print(f"... wrote /root/repo/EVAL.md; sectors<0.99: {n_below}")
    if worst < 0.99:
        # the claimed gate must FAIL the run, not just print (round-5
        # advice: a regression would otherwise ship a passing-looking
        # report)
        raise SystemExit(
            f"seed-robustness gate FAILED: worst seed F1 {worst:.4f} < 0.99")


if __name__ == "__main__":
    main()
