"""Deterministic hash embedder (the engine's service-free stand-in for
the reference's embedding HTTP service + Qdrant, SURVEY.md J9/F5;
fallback analog: internal/embeddings/simple.go:21-98, re-derived).

Every token seeds a PRNG unit-ish vector; a text's embedding is the
L2-normalized token-vector sum. Deterministic across processes, so the
gazetteer matrix written by synth.py and the query embeddings computed
inside mapInPandas agree exactly. Batch API memoizes per unique token —
vocabulary is tiny relative to batch size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_VEC_CACHE: dict[tuple[str, int], np.ndarray] = {}


def _token_vec(tok: str, dim: int) -> np.ndarray:
    key = (tok, dim)
    v = _VEC_CACHE.get(key)
    if v is None:
        seed = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        rs = np.random.RandomState(seed % (2**32))
        v = rs.standard_normal(dim)
        if len(_VEC_CACHE) < 500_000:
            _VEC_CACHE[key] = v
    return v


def hash_embed_batch(texts: pd.Series, dim: int) -> np.ndarray:
    """(batch, dim) float32, rows L2-normalized (zero stays zero)."""
    out = np.zeros((len(texts), dim), dtype=np.float64)
    vals = texts.fillna("").astype(str).str.upper().to_numpy()
    for i, t in enumerate(vals):
        for tok in t.split():
            out[i] += _token_vec(tok, dim)
    n = np.linalg.norm(out, axis=1, keepdims=True)
    return (out / np.maximum(n, 1e-12)).astype(np.float32)
