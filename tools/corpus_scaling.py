"""Corpus-size scaling table runner (BASELINE.md section): one fresh
process per size, bench.py's run_linkage methodology (warm-up reported
separately, best-of-2 timed runs with inter-run cache release), load
recorded before each size. Usage:
    python tools/corpus_scaling.py <n_docs> <n_gaz> [n_runs]
prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")


def main():
    n_docs, n_gaz = int(sys.argv[1]), int(sys.argv[2])
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    import shutil
    import bench
    from ehdc_llpg_address_matching_spark.synth import (SynthConfig,
                                                        write_parquet)
    tmp = f"/tmp/bench_corpus_{n_docs}_{n_gaz}"
    if not os.path.exists(os.path.join(tmp, "_CORPUS_OK")):
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        write_parquet(tmp, SynthConfig(seed=42, n_gazetteer=n_gaz,
                                       n_docs=n_docs))
        open(os.path.join(tmp, "_CORPUS_OK"), "w").close()
    load = round(os.getloadavg()[0], 2)
    spark = bench._make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                              f"corpus-scaling-{n_docs}")
    r = bench.run_linkage(spark, os.path.join(tmp, "documents.parquet"),
                          os.path.join(tmp, "gazetteer.parquet"),
                          n_runs=n_runs)
    spark.stop()
    r["load_at_start"] = load
    r["n_docs"], r["n_gaz"] = n_docs, n_gaz
    print(json.dumps(r))


if __name__ == "__main__":
    main()
