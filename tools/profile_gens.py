"""Per-generator profile of the candidate-union phase on the bench
linkage corpus (round-6 optimization instrumentation)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from ehdc_llpg_address_matching_spark.session import get_spark
    from ehdc_llpg_address_matching_spark.functions.symspell import \
        build_dictionary_from_gazetteer
    from ehdc_llpg_address_matching_spark.operators import candidates as C
    from ehdc_llpg_address_matching_spark.operators import scoring as S
    from ehdc_llpg_address_matching_spark.operators.blocking import \
        with_blocking_keys
    from ehdc_llpg_address_matching_spark.pipeline import normalize_documents

    spark = get_spark(app_name="profile-gens", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    tmp = "/tmp/bench_corpus_20000_4000"
    docs = spark.read.parquet(os.path.join(tmp, "documents.parquet"))
    gaz = spark.read.parquet(os.path.join(tmp, "gazetteer.parquet"))
    gazp = C.prepare_gazetteer(gaz).cache()
    gazp.count()
    sym = build_dictionary_from_gazetteer(gazp, addr_col="addr_core")
    docs_n = normalize_documents(docs, sym).cache()
    docs_n.count()
    uaddr = with_blocking_keys(C.prepare_unique_addresses(docs_n)).cache()
    uaddr.count()
    print("gaz has embedding:", "embedding" in gaz.columns, flush=True)

    gens = {
        "exact": lambda: C.cand_exact_canonical(uaddr, gazp),
        "blocked": lambda: C.cand_blocked(uaddr, gazp),
        "rule_rewrite": lambda: C.cand_rule_rewrite(uaddr, gazp),
        "component": lambda: C.cand_component_joins(uaddr, gazp),
        "spatial": lambda: C.cand_spatial(uaddr, gazp),
        "hierarchical": lambda: C.cand_hierarchical(uaddr, gazp),
    }
    times = {}
    for name, fn in gens.items():
        spark.sparkContext.setJobDescription(f"gen:{name}")
        t0 = time.time()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 2)
        print(json.dumps({name: times[name]}), flush=True)
    # the union + groupBy itself
    spark.sparkContext.setJobDescription("union_candidates")
    t0 = time.time()
    cands = C.union_candidates(*[fn() for fn in gens.values()])
    cands.write.format("noop").mode("overwrite").save()
    times["union_all"] = round(time.time() - t0, 2)
    print(json.dumps({"union_all": times["union_all"]}), flush=True)
    # counts per generator for volume insight
    t0 = time.time()
    n = cands.count()
    print(json.dumps({"union_rows": n, "recount_sec":
                      round(time.time() - t0, 2)}), flush=True)
    # scoring-phase slices
    import pyspark.sql.functions as F
    from ehdc_llpg_address_matching_spark.operators import decision as D
    cands_cp = cands.localCheckpoint(eager=True)
    pairs0 = S.attach_pair_attrs(cands_cp, uaddr, gazp)
    pairs1 = S.with_column_features(pairs0)
    pairs2 = S.prefilter_pairs(pairs1)
    t0 = time.time()
    n2 = pairs2.count()
    print(json.dumps({"prefiltered_pairs": n2,
                      "attach_prefilter_sec": round(time.time() - t0, 2)}),
          flush=True)
    pairs3 = S.with_pair_features(pairs2)
    pairs4 = S.with_score(pairs3)
    t0 = time.time()
    best = D.keep_best_per_uprn(D.narrow_for_decision(pairs4))
    decided = D.decide(best)
    decided.write.format("noop").mode("overwrite").save()
    print(json.dumps({"score_decide_noop_sec": round(time.time() - t0, 2)}),
          flush=True)
    print(json.dumps(times))
    spark.stop()


if __name__ == "__main__":
    main()
