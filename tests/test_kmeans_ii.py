"""B4 — II-accelerated k-means (utils.rs:316-412): the vectorized
kmeans_blocks_ii must equal a plain-loop implementation of the same spec
(pruned centroid mini-index → candidate union → exact-dot argmax →
self-assign → dissolve/reassign).  No Spark needed."""

import numpy as np
import pytest

from seismic_spark.postings import IndexConfig, kmeans_blocks, kmeans_blocks_ii


def _slow_ii(d_terms, d_weights, cfg, term_id):
    """Reference loop implementation of the B4 spec (same Philox draw,
    same tie rules: dot ties → lowest centroid index, dot must be > 0)."""
    n = len(d_terms)
    k = max(1, int(cfg.centroid_fraction * n))
    if n <= 1 or k >= n:
        return np.zeros(n, dtype=np.int32)
    rng = np.random.Generator(
        np.random.Philox(key=[cfg.kmeans_seed, term_id & 0x7FFFFFFF])
    )
    centroid_idx = np.sort(rng.choice(n, size=k, replace=False))

    def vec(i):
        return dict(zip(d_terms[i].tolist(), d_weights[i].tolist()))

    cents = [vec(i) for i in centroid_idx]
    pls = max(5, int(n * cfg.kmeans_pruning_factor))
    # pruned mini-index: per component, top-pls centroids by (value desc, idx)
    comps = sorted({t for c in cents for t in c})
    pruned = {}
    for t in comps:
        lst = [(c.get(t, 0.0), j) for j, c in enumerate(cents) if c.get(t, 0.0) > 0]
        lst.sort(key=lambda x: (-x[0], x[1]))
        pruned[t] = [j for _, j in lst[:pls]]

    def exact_dot(i, j):
        # f32 arithmetic like the engine (contributions then f32 sum)
        d, c = vec(i), cents[j]
        s = np.float32(0.0)
        for t in d_terms[i].tolist():
            if t in c:
                s += np.float32(d[t]) * np.float32(c[t])
        return s

    def top_components(i):
        pairs = list(zip(d_terms[i].tolist(), d_weights[i].tolist()))
        pairs.sort(key=lambda x: (-x[1],))
        return [t for t, _ in pairs[: cfg.kmeans_doc_cut]]

    def assign(i, allowed):
        cand = sorted(
            {j for t in top_components(i) for j in pruned.get(t, []) if allowed[j]}
        )
        best, best_dot = int(np.flatnonzero(allowed)[0]), np.float32(0.0)
        for j in cand:
            dt = exact_dot(i, j)
            if dt > best_dot:
                best, best_dot = j, dt
        return best

    allowed = np.ones(k, dtype=bool)
    a = np.array([assign(i, allowed) for i in range(n)], dtype=np.int32)
    for j, i in enumerate(centroid_idx):
        a[i] = j
    counts = np.bincount(a, minlength=k)
    surviving = counts > cfg.min_cluster_size
    if surviving.any() and not surviving.all():
        surv = np.flatnonzero(surviving)
        for i in range(n):
            if not surviving[a[i]]:
                a[i] = assign(i, surviving)
        remap = -np.ones(k, dtype=np.int32)
        remap[surv] = np.arange(surv.size, dtype=np.int32)
        a = remap[a]
    return a


def _rand_list(rng, n, dim=60, max_nnz=12):
    d_terms, d_weights = [], []
    for _ in range(n):
        nnz = int(rng.integers(1, max_nnz))
        t = np.sort(rng.choice(dim, size=nnz, replace=False)).astype(np.int64)
        w = rng.uniform(0.1, 5.0, size=nnz)
        d_terms.append(t)
        d_weights.append(np.round(w, 3))
    return d_terms, d_weights


@pytest.mark.parametrize("seed,n,pf,dc", [
    (1, 40, 0.2, 4),
    (2, 80, 0.05, 15),
    (3, 60, 0.5, 2),     # wide pruned lists
    (4, 25, 0.005, 10),  # pls floor (=5) active
])
def test_ii_matches_loop_spec(seed, n, pf, dc):
    rng = np.random.default_rng(seed)
    d_terms, d_weights = _rand_list(rng, n)
    cfg = IndexConfig(
        blocking="kmeans", kmeans_mode="ii", centroid_fraction=0.2,
        min_cluster_size=2, kmeans_doc_cut=dc, kmeans_pruning_factor=pf,
    )
    fast = kmeans_blocks_ii(d_terms, d_weights, cfg, term_id=seed * 7)
    slow = _slow_ii(d_terms, d_weights, cfg, term_id=seed * 7)
    assert np.array_equal(fast, slow)
    # dispatch through the public entry point too
    assert np.array_equal(kmeans_blocks(d_terms, d_weights, cfg, seed * 7), fast)


def test_ii_degenerate_cases():
    cfg = IndexConfig(blocking="kmeans", kmeans_mode="ii", centroid_fraction=0.2)
    one = kmeans_blocks_ii([np.array([1])], [np.array([1.0])], cfg, 0)
    assert list(one) == [0]
    # k >= n → single block
    few = kmeans_blocks_ii(
        [np.array([1]), np.array([2])], [np.array([1.0]), np.array([2.0])],
        IndexConfig(blocking="kmeans", kmeans_mode="ii", centroid_fraction=0.9), 0,
    )
    assert list(few) == [0, 0]
