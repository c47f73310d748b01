"""Stage-metric profile (REST API) of the candidate-union and scoring
phases on the bench linkage corpus — distinguishes real task CPU from
scheduling/serialization overhead (round-6 instrumentation)."""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
os.environ["SPARK_GRAFT_UI"] = "1"  # need the REST API

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from ehdc_llpg_address_matching_spark.session import get_spark
    from ehdc_llpg_address_matching_spark.functions.symspell import \
        build_dictionary_from_gazetteer
    from ehdc_llpg_address_matching_spark.operators import candidates as C
    from ehdc_llpg_address_matching_spark.operators import scoring as S
    from ehdc_llpg_address_matching_spark.operators import decision as D
    from ehdc_llpg_address_matching_spark.operators.blocking import \
        with_blocking_keys
    from ehdc_llpg_address_matching_spark.pipeline import normalize_documents
    import pyspark.sql.functions as F

    spark = get_spark(app_name="profile-stages", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8),
                      extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    print("ui:", ui, flush=True)
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

    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    def stages_snapshot():
        data = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"))
        return {s["stageId"]: s for s in data}

    before = stages_snapshot()
    gens = [
        C.cand_exact_canonical(uaddr, gazp),
        C.cand_blocked(uaddr, gazp),
        C.cand_rule_rewrite(uaddr, gazp),
        C.cand_component_joins(uaddr, gazp),
        C.cand_spatial(uaddr, gazp),
        C.cand_hierarchical(uaddr, gazp),
    ]
    spark.sparkContext.setJobDescription("candidate-union")
    t0 = time.time()
    cands = C.union_candidates(*gens).localCheckpoint(eager=True)
    union_wall = time.time() - t0
    after = stages_snapshot()
    new = [s for sid, s in after.items() if sid not in before]
    new.sort(key=lambda s: -s.get("executorRunTime", 0))
    tot_run = sum(s.get("executorRunTime", 0) for s in new)
    tot_cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e6
    tot_sw = sum(s.get("shuffleWriteTime", 0) for s in new) / 1e6
    print(json.dumps({"union_wall": round(union_wall, 2),
                      "n_stages": len(new),
                      "task_time_ms": tot_run,
                      "cpu_ms": round(tot_cpu),
                      "shuffle_write_ms": round(tot_sw)}), flush=True)
    for s in new[:15]:
        print(json.dumps({
            "stage": s["stageId"], "name": s["name"][:60],
            "tasks": s["numCompleteTasks"],
            "run_ms": s.get("executorRunTime", 0),
            "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
            "sw_ms": round(s.get("shuffleWriteTime", 0) / 1e6),
            "in_rows": s.get("inputRecords", 0),
            "sh_read_rows": s.get("shuffleReadRecords", 0),
            "sh_write_rows": s.get("shuffleWriteRecords", 0),
        }), flush=True)

    # scoring phase
    before = stages_snapshot()
    pairs = S.attach_pair_attrs(cands, uaddr, gazp)
    pairs = S.with_column_features(pairs)
    pairs = S.prefilter_pairs(pairs)
    pairs = S.with_pair_features(pairs)
    pairs = S.with_score(pairs)
    spark.sparkContext.setJobDescription("score-decide")
    t0 = time.time()
    best = D.keep_best_per_uprn(D.narrow_for_decision(pairs))
    decided = D.decide(best)
    decided.write.format("noop").mode("overwrite").save()
    sd_wall = time.time() - t0
    after = stages_snapshot()
    new = [s for sid, s in after.items() if sid not in before]
    new.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(json.dumps({"score_decide_wall": round(sd_wall, 2),
                      "n_stages": len(new)}), flush=True)
    for s in new[:12]:
        print(json.dumps({
            "stage": s["stageId"], "name": s["name"][:60],
            "tasks": s["numCompleteTasks"],
            "run_ms": s.get("executorRunTime", 0),
            "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
            "sw_ms": round(s.get("shuffleWriteTime", 0) / 1e6),
            "sh_read_rows": s.get("shuffleReadRecords", 0),
            "sh_write_rows": s.get("shuffleWriteRecords", 0),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
