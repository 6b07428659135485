"""The r8 two-stage cosine kernels (BLAS prefilter over normalized
vectors + exact left-to-right fold rescore on survivors) promise
BIT-IDENTICAL output to the naive exact-fold-everything form — the
1e-9 superset margin must dominate the float64 GEMM error for every
input, including pairs engineered to straddle the pre-threshold by
1e-10. These tests pin that promise against a pure-python reference
that replays the oracle's fold order (dim-at-a-time float64), on both
the cell kernel (pairs_from_cell_rows), the blocked exact path
(neardup_pairs), and the incremental index's cross-batch kernel."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from pyspark.sql import functions as F

THRESHOLD = 0.5


def _fold_cos(a, b):
    """The zip_with/aggregate left-to-right float64 fold both engines
    state: dot and the two norms each accumulate dimension-at-a-time."""
    d = na = nb = 0.0
    for x, y in zip(a, b):
        d += x * y
        na += x * x
        nb += y * y
    import math

    return d / (math.sqrt(na) * math.sqrt(nb))


def _round6(x: float) -> float:
    # Spark's F.round = BigDecimal.valueOf(double) (shortest repr,
    # like python's repr) rounded HALF_UP
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _reference_pairs(ids, vecs, threshold=THRESHOLD):
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            c = _round6(_fold_cos(vecs[i], vecs[j]))
            if c >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = c
    return out


def _fixture(n=48, dim=16, seed=7):
    """Random unit vectors plus engineered pairs whose exact-fold
    cosine lands within ~1e-10 of the prefilter boundary
    (threshold − 1e-6): the margin band the BLAS prefilter must not
    misjudge."""
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n, dim))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    vecs = [V[i] for i in range(n)]
    ids = list(range(n))
    nid = n
    for k in range(-5, 6):
        target = THRESHOLD - 1e-6 + k * 1e-10
        v = V[(k + 5) % n]
        u = rng.standard_normal(dim)
        u -= (u @ v) * v
        u /= np.linalg.norm(u)
        w = target * v + np.sqrt(max(0.0, 1 - target * target)) * u
        vecs.append(w)
        ids.append(nid)
        nid += 1
        vecs.append(v.copy())
        ids.append(nid)
        nid += 1
    return ids, [list(map(float, v)) for v in vecs]


def test_cell_kernel_matches_exact_fold_reference(spark):
    from real_time_event_streaming_pipeline_spark.operators.similarity import (
        pairs_from_cell_rows,
    )

    ids, vecs = _fixture()
    tagged = spark.createDataFrame(
        [(0, i, v) for i, v in zip(ids, vecs)], "cell int, _id long, _vec array<double>"
    )
    got = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in pairs_from_cell_rows(tagged, THRESHOLD).collect()
    }
    assert got == _reference_pairs(ids, vecs)


def test_blocked_exact_path_matches_exact_fold_reference(spark):
    from real_time_event_streaming_pipeline_spark.operators.similarity import (
        neardup_pairs,
    )

    ids, vecs = _fixture(seed=11)
    emb = spark.createDataFrame(
        [(i, v) for i, v in zip(ids, vecs)], "vec_id long, embedding array<double>"
    )
    got = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in neardup_pairs(emb, threshold=THRESHOLD, n_blocks=4).collect()
    }
    assert got == _reference_pairs(ids, vecs)


def test_cross_batch_kernel_matches_exact_fold_reference(spark):
    """The incremental index's old-vs-new kernel: dropped new ids must
    be exactly those with a smaller-id reference match over threshold.
    r12: the kernel is the SHARED asym pair kernel with
    cross_sides_only=True over role-tagged rows; with every vector
    carrying both its 'h' and 'p' row in the one cell (n_probe=1 —
    probes = {home}), the OR-rule reduces to the symmetric
    share-a-cell rule this reference states."""
    from real_time_event_streaming_pipeline_spark.streaming.semdedup_index import (
        _cross_dropped,
    )

    ids, vecs = _fixture(seed=23)
    half = len(ids) // 2

    def tagged(lo, hi):
        return spark.createDataFrame(
            [
                (0, ids[i], vecs[i], role)
                for i in range(lo, hi)
                for role in ("h", "p")
            ],
            "cell int, _id long, _vec array<double>, role string",
        )

    old = tagged(0, half)
    new = tagged(half, len(ids))
    got = {r["b_id"] for r in _cross_dropped(new, old, THRESHOLD).collect()}
    ref = _reference_pairs(ids, vecs)
    old_ids = set(ids[:half])
    # every old id is smaller than every new id in this split, so the
    # smaller-id-wins drop rule reduces to: b dropped iff it pairs
    # with any old id over threshold
    want = {b for (a, b) in ref if a in old_ids and b not in old_ids}
    assert got == want


def _reference_topk(q_ids, Q, c_ids, C, k):
    """Full-fold reference for _topk_kernel: exact left-to-right fold
    over EVERY (q, c), self excluded, (cos desc, n_id asc) top-k."""
    out = {}
    for i, qi in enumerate(q_ids):
        scored = [
            (_fold_cos(Q[i], C[j]), cj)
            for j, cj in enumerate(c_ids)
            if cj != qi
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        out[qi] = [(cj, c) for c, cj in scored[:k]]
    return out


def _run_topk_kernel(q_ids, Q, c_ids, C, k):
    import pandas as pd

    from real_time_event_streaming_pipeline_spark.operators.similarity import (
        _topk_kernel,
    )

    pdf = pd.DataFrame(
        {
            "role": ["q"] * len(q_ids) + ["c"] * len(c_ids),
            "_id": list(q_ids) + list(c_ids),
            "_vec": [list(map(float, v)) for v in Q] + [list(map(float, v)) for v in C],
        }
    )
    res = _topk_kernel(k)(pdf)
    got = {}
    for _, r in res.iterrows():
        got.setdefault(int(r["q_id"]), []).append((int(r["n_id"]), float(r["cos_raw"])))
    return got


def test_topk_kernel_matches_full_fold_reference():
    """r11: the two-stage f32-gated _topk_kernel must emit the same
    (neighbor, exact double) list as the old full-fold form — bitwise,
    including exact-tie id ordering — across self-overlapping and
    disjoint query/corpus sets."""
    import numpy as np

    rng = np.random.default_rng(5)
    n, dim, k = 60, 24, 7
    C = rng.standard_normal((n, dim))
    # plant exact ties: duplicate vectors under distinct ids tie on the
    # exact double and must order by id
    C[10] = C[3]
    C[11] = C[3]
    c_ids = list(range(n))
    # queries overlap the corpus (self-exclusion) and extend past it
    Q = np.vstack([C[:8], rng.standard_normal((5, dim))])
    q_ids = list(range(8)) + list(range(1000, 1005))
    got = _run_topk_kernel(q_ids, Q, c_ids, C, k)
    assert got == _reference_topk(q_ids, Q, c_ids, C, k)


def test_topk_kernel_matches_reference_at_high_dim():
    """The dim-scaled gate (r10 ADVICE #1): at dim 2048 the worst-case
    f32 sgemm error (~6e-8·dim ≈ 1.2e-4) exceeds the old fixed 1e-4
    margin, so this pin fails if the margin stops scaling with dim."""
    import numpy as np

    from real_time_event_streaming_pipeline_spark.operators.similarity import (
        f32_gate_margin,
    )

    dim = 2048
    assert f32_gate_margin(dim) >= 2 * (dim + 2) * 2.0**-24  # ≥ the 2e bound
    assert f32_gate_margin(64) == 1e-4  # small dims keep the old floor
    rng = np.random.default_rng(17)
    n, k = 40, 5
    # near-duplicate cluster: tiny perturbations make the fast scores
    # crowd within the f32 error band, where an under-sized margin
    # drops true top-k columns
    base = rng.standard_normal(dim)
    C = base + 1e-5 * rng.standard_normal((n, dim))
    c_ids = list(range(n))
    Q = C[:6]
    q_ids = list(range(6))
    got = _run_topk_kernel(q_ids, Q, c_ids, C, k)
    assert got == _reference_topk(q_ids, Q, c_ids, C, k)


def test_topk_kernel_small_group_full_gather():
    """Groups smaller than k take the m >= n_c branch (full gather):
    every non-self column must be emitted, exactly ordered."""
    import numpy as np

    rng = np.random.default_rng(29)
    C = rng.standard_normal((4, 8))
    got = _run_topk_kernel([0, 99], C[:2], [0, 1, 2, 3], C, 10)
    assert got == _reference_topk([0, 99], C[:2], [0, 1, 2, 3], C, 10)
