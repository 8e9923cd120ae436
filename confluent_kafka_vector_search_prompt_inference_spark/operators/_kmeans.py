"""Driver-side seeded k-means for index training (IVF coarse centroids).

Index training needs thousands of representative rows, not the corpus —
the train/add split every production vector store uses (FAISS trains on
a sample, then encodes/assigns the full set in one pass). Sampling to
the driver and running seeded k-means++ + Lloyd in NumPy is milliseconds;
a distributed KMeans pays a full corpus pass PER ITERATION to train on
data it only needed thousands of rows from.

Mirrors the per-subspace codebook trainer in ``operators/pq.py`` (kept
separate so that trainer's rng stream — and with it the PQ verdict
oracles — stays frozen).
"""

from __future__ import annotations

import numpy as np


def kmeans_fit(X: np.ndarray, k: int, *, seed: int = 42, max_iter: int = 10) -> np.ndarray:
    """k-means++ D² seeding + Lloyd's iterations; returns ``(k, d)``
    centroids. Deterministic per (X, k, seed) — callers feed an
    order-invariant sample so the whole index build is reproducible."""
    n = len(X)
    if n == 0:
        raise ValueError("kmeans_fit needs a non-empty sample")
    k = min(k, n)
    rng = np.random.RandomState(seed)
    cent = np.empty((k, X.shape[1]))
    cent[0] = X[rng.randint(n)]
    d2 = ((X - cent[0]) ** 2).sum(axis=1)
    for c in range(1, k):
        s = d2.sum()
        probs = d2 / s if s > 0 else None
        cent[c] = X[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((X - cent[c]) ** 2).sum(axis=1))
    for _ in range(max_iter):
        d2 = (
            (X**2).sum(axis=1)[:, None]
            - 2.0 * X @ cent.T
            + (cent**2).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
            else:  # re-seed empty clusters from a random point
                cent[c] = X[rng.randint(n)]
    return cent
