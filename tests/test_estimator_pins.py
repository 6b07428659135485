"""Distribution-level pins for every seeded/derived constant family
(r9 verdict #4): the MinHash permutation dependence survived eight
rounds of bitwise oracles because the DuckDB twins replay the same
constants — a degenerate family reproduces identically on both
engines while silently wrecking the estimator it powers. Bitwise
checks CANNOT catch this class; these pins check the STATISTIC each
family exists to deliver against its closed-form expectation, and
each proves its own teeth by showing that a deliberately degenerate
family trips the same bound.

Families covered here:
- SimHash bit planes (operators/dedup.py::simhash — bits of _h60)
- cosine-LSH hyperplanes (operators/similarity.py::_hyperplanes)
- the hash-ordered seeded sample behind IVF/PQ training
  (operators/similarity.py::_hash_ordered, both md5h60 and xxhash64
  orders; the Lloyd/codebook steps consume this sample, so its
  uniformity is the constant-family part of their quality)
- the split/sample/shard bucket family
  (plans/relational.py::split_bucket) — whose r10 sweep FOUND a real
  degeneracy: the old multiplicative family collapsed structured id
  strides (multiples of 100 → always bucket 0).
- (r11, closing the r10 verdict #6 remainder) the PQ codebook Lloyd
  training (operators/similarity.py::_pq_lloyd — distortion vs the
  Zador closed form, with a collapsed-sample negative control), the
  null-calibration constants (calibrate_null_threshold — threshold vs
  the σ·√(2·ln·pairs) closed form, with a first-n-biased-sample
  negative control), and the MinHash banding parameterization
  (bands × rows S-curve at both shoulders, with an
  all-bands-read-the-same-rows negative control).

The MinHash permutation pin itself lives in
tests/test_operators.py::test_minhash_estimator_unbiased.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest


def _h60_py(s: str) -> int:
    """Pure-python twin of operators.dedup._h60 (md5 first 15 hex)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# SimHash bit planes
# ---------------------------------------------------------------------------


def _simhash_py(tokens, bit_of) -> int:
    """Pure-python replica of operators.dedup.simhash's arithmetic:
    per-bit ±1 votes from bit_of(h60(token), i), sign-assembled."""
    hs = [_h60_py(t) for t in dict.fromkeys(tokens)]
    sig = 0
    for i in range(32):
        vote = sum(1 if bit_of(h, i) else -1 for h in hs)
        if vote > 0:
            sig |= 1 << i
    return sig


def _hamming_stats(bit_of, n_pairs=300, n_tok=31):
    """Mean/variance of hamming(simhash) over unrelated random docs —
    for independent fair bit planes: Binomial(32, 1/2), mean 16,
    variance 8. n_tok is odd so per-bit vote sums can never tie (a
    tie would bias P(bit=1) to ~0.43 and shift the closed form)."""
    hams = []
    for g in range(n_pairs):
        a = _simhash_py([f"pa{g}_{j}" for j in range(n_tok)], bit_of)
        b = _simhash_py([f"pb{g}_{j}" for j in range(n_tok)], bit_of)
        hams.append(bin(a ^ b).count("1"))
    arr = np.array(hams, dtype=np.float64)
    return float(arr.mean()), float(arr.var(ddof=1))


def test_simhash_bitplane_family_independent():
    good = lambda h, i: (h >> i) & 1
    mean, var = _hamming_stats(good)
    assert 15.0 <= mean <= 17.0, mean
    assert 5.5 <= var <= 11.0, var
    # teeth: a family where every plane reads the SAME bit (the
    # simhash analogue of the r9 minhash LCG bug) keeps the mean but
    # explodes the variance — hamming degenerates to {0, 32}
    degenerate = lambda h, i: h & 1
    _, var_deg = _hamming_stats(degenerate, n_pairs=120)
    assert var_deg > 50.0, var_deg


# ---------------------------------------------------------------------------
# Cosine-LSH hyperplanes
# ---------------------------------------------------------------------------


def _match_fractions(planes: np.ndarray, cos_target=0.5, n_pairs=400, seed=7):
    """Per-pair sign-bit match fraction for unit-vector pairs at a
    fixed angle θ = arccos(cos_target). Closed form per plane:
    P(match) = 1 − θ/π (Goemans–Williamson); for independent planes
    the per-pair fraction has std sqrt(p(1−p)/n_planes)."""
    rng = np.random.default_rng(seed)
    dim = planes.shape[1]
    sin_t = float(np.sqrt(1.0 - cos_target**2))
    fracs = []
    for _ in range(n_pairs):
        u = rng.standard_normal(dim)
        u /= np.linalg.norm(u)
        w = rng.standard_normal(dim)
        w -= w.dot(u) * u
        w /= np.linalg.norm(w)
        v = cos_target * u + sin_t * w
        su = planes @ u > 0
        sv = planes @ v > 0
        fracs.append(float((su == sv).mean()))
    return np.array(fracs)


def test_lsh_hyperplane_family_isotropic():
    from real_time_event_streaming_pipeline_spark.operators.similarity import (
        _hyperplanes,
    )

    planes = _hyperplanes(dim=64, n_planes=16)
    # geometry: pairwise |cos| of gaussian planes concentrates near
    # sqrt(2/(π·dim)) ≈ 0.10 at dim 64 — a correlated family can't
    norm = planes / np.linalg.norm(planes, axis=1, keepdims=True)
    gram = np.abs(norm @ norm.T)
    off = gram[~np.eye(len(planes), dtype=bool)]
    assert off.mean() < 0.2, off.mean()
    assert off.max() < 0.5, off.max()
    # estimator: match fraction at cos 0.5 → p = 1 − (π/3)/π = 2/3,
    # and per-pair std ≈ sqrt(p(1−p)/16) ≈ 0.118 for INDEPENDENT
    # planes (the mean alone cannot catch correlation — a fully
    # duplicated family keeps E[fraction] = p)
    fr = _match_fractions(planes)
    assert abs(fr.mean() - 2 / 3) < 0.04, fr.mean()
    assert fr.std(ddof=1) < 0.18, fr.std(ddof=1)
    # teeth: 16 copies of one plane keep the mean but the fraction
    # collapses to {0, 1} draws — std ≈ sqrt(p(1−p)) ≈ 0.47
    deg = np.tile(planes[0], (16, 1))
    fr_deg = _match_fractions(deg, n_pairs=200)
    assert abs(fr_deg.mean() - 2 / 3) < 0.12  # mean alone stays blind
    assert fr_deg.std(ddof=1) > 0.3, fr_deg.std(ddof=1)


# ---------------------------------------------------------------------------
# Hash-ordered seeded sample (IVF / PQ training input)
# ---------------------------------------------------------------------------

_N_IDS = 20_000
_SAMPLE = 512


def _uniformity(sample_ids):
    """(mean, decile counts) of a top-_SAMPLE sample over ids
    0.._N_IDS-1. Uniform closed form: mean ≈ N/2 (se = N/sqrt(12·S)
    ≈ 255), each decile ≈ S/10 = 51.2 (sd ≈ 6.8)."""
    arr = np.array(sorted(sample_ids), dtype=np.float64)
    deciles = np.histogram(arr, bins=10, range=(0, _N_IDS))[0]
    return float(arr.mean()), deciles


def test_hash_ordered_sample_uniform_md5():
    key = lambda i: (_h60_py(str(i)), i)
    sample = sorted(range(_N_IDS), key=key)[:_SAMPLE]
    mean, deciles = _uniformity(sample)
    assert abs(mean - _N_IDS / 2) < 1000, mean
    assert deciles.min() >= 20 and deciles.max() <= 85, deciles.tolist()
    # teeth: an identity "hash" (first-n bias — the exact failure
    # TakeOrdered-by-hash exists to prevent) lands the whole sample
    # in the first decile
    degenerate = sorted(range(_N_IDS))[:_SAMPLE]
    mean_deg, dec_deg = _uniformity(degenerate)
    assert abs(mean_deg - _N_IDS / 2) > 1000
    assert dec_deg.max() > 85


def test_hash_ordered_sample_uniform_xxhash64(spark):
    from pyspark.sql import functions as F

    from real_time_event_streaming_pipeline_spark.operators.similarity import (
        _hash_ordered,
    )

    df = spark.range(_N_IDS).select(F.col("id").alias("vec_id"))
    sample = [
        r.vec_id for r in _hash_ordered(df, "vec_id", seed=76923).limit(_SAMPLE).collect()
    ]
    assert len(sample) == _SAMPLE
    mean, deciles = _uniformity(sample)
    assert abs(mean - _N_IDS / 2) < 1000, mean
    assert deciles.min() >= 20 and deciles.max() <= 85, deciles.tolist()


# ---------------------------------------------------------------------------
# split_bucket family (splits, sampling, capping, shards)
# ---------------------------------------------------------------------------


def _bucket_md5(i: int, mod: int) -> int:
    """Pure-python twin of plans.relational.split_bucket (r10 family)."""
    return _h60_py(str(i)) % mod


def _bucket_old(i: int, mod: int) -> int:
    """The RETIRED multiplicative family — kept as negative control."""
    from real_time_event_streaming_pipeline_spark.plans.relational import (
        _SPLIT_MULT,
        _SPLIT_RED,
    )

    return ((i % _SPLIT_RED) * _SPLIT_MULT) % mod


_STRIDES = {"sequential": 1, "even": 2, "x7": 7, "x100": 100, "x1000": 1000}


@pytest.mark.parametrize("stride_name", sorted(_STRIDES))
def test_split_bucket_uniform_on_structured_ids(stride_name):
    """The r10 correctness find, pinned: an 80/10/10 split must hold
    on ANY id stride — snowflake-style ids with constant low digits
    are exactly strides of 10^k. Closed form per 2000 ids: binomial
    sd of the train fraction ≈ 0.009, so ±0.05 is a ≥5σ gate."""
    stride = _STRIDES[stride_name]
    ids = [k * stride for k in range(2000)]
    buckets = [_bucket_md5(i, 100) for i in ids]
    train = sum(1 for b in buckets if b < 80) / len(ids)
    val = sum(1 for b in buckets if 80 <= b < 90) / len(ids)
    test = sum(1 for b in buckets if b >= 90) / len(ids)
    assert abs(train - 0.8) < 0.05, (stride_name, train)
    assert abs(val - 0.1) < 0.04, (stride_name, val)
    assert abs(test - 0.1) < 0.04, (stride_name, test)
    assert len(set(buckets)) >= 90, (stride_name, len(set(buckets)))


def test_split_bucket_old_family_was_degenerate():
    """Teeth + regression record: the retired multiplicative family
    fails the exact bound above — every multiple of 100 landed in
    bucket 0 (100% train / always-sampled / cap-exempt), and even ids
    could only reach even buckets."""
    mult100 = [_bucket_old(100 * k, 100) for k in range(2000)]
    assert set(mult100) == {0}  # all train — the degeneracy
    evens = {_bucket_old(2 * k, 100) for k in range(2000)}
    assert all(b % 2 == 0 for b in evens)


def test_split_bucket_spark_matches_python_twin(spark):
    """The Spark expression and the pure-python closed-form twin used
    by these pins are the same function (so the pins actually pin the
    production family)."""
    from pyspark.sql import functions as F

    from real_time_event_streaming_pipeline_spark.plans.relational import split_bucket

    ids = [0, 1, 99, 100, 101, 12345, 10**9, 10**12]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.b
        for r in df.select("doc_id", split_bucket(F.col("doc_id"), 100).alias("b")).collect()
    }
    assert got == {i: _bucket_md5(i, 100) for i in ids}


# ---------------------------------------------------------------------------
# PQ codebook Lloyd training (r10 verdict #6 — the remaining families)
# ---------------------------------------------------------------------------


def _pq_distortion(X, books):
    """Mean squared quantization error of X under per-subspace nearest
    codes — the statistic PQ codebooks exist to minimize (ADC error is
    bounded by it)."""
    m, n_codes, sub = books.shape
    err = 0.0
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
        err += float(d2.min(1).mean())
    return err


def test_pq_lloyd_codebooks_reduce_distortion():
    """Closed form: 16 centroids k-means-fit to a 4-d standard
    gaussian reach distortion ≈ dim_sub·k^(−2/dim_sub) ≈ 1.0 per
    subspace (Zador) — far below the no-quantizer variance dim_sub =
    4.0. Pins: (a) trained books beat a generous 2.2/subspace bound;
    (b) Lloyd improves on its own init (the iterations do work);
    (c) teeth — books trained from a COLLAPSED sample (the degenerate
    family: every sampled row identical, which is what a broken
    seeded sample would feed Lloyd) quantize at ~the raw variance,
    tripping the same bound."""
    from real_time_event_streaming_pipeline_spark.operators.similarity import (
        _pq_lloyd,
    )

    rng = np.random.default_rng(11)
    m, n_codes = 4, 16
    X = rng.standard_normal((2048, 16))
    books = _pq_lloyd(X, m, n_codes, iters=5)
    dist = _pq_distortion(X, books)
    assert dist < 2.2 * m, dist
    init_books = _pq_lloyd(X, m, n_codes, iters=0)
    assert dist < _pq_distortion(X, init_books), "Lloyd must improve on init"
    degenerate_sample = np.tile(X[0], (n_codes, 1))
    deg_books = _pq_lloyd(degenerate_sample, m, n_codes, iters=5)
    deg_dist = _pq_distortion(X, deg_books)
    assert deg_dist > 3.0 * m, deg_dist  # ~raw variance: bound has teeth


# ---------------------------------------------------------------------------
# Null-calibration constants (calibrate_null_threshold)
# ---------------------------------------------------------------------------


def _md5_ordered_sample(ids, vecs, sample_size=512):
    """Pure-python twin of the calibration's (md5(id) hex, id) order."""
    order = sorted(range(len(ids)), key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]))
    return [vecs[i] for i in order[:sample_size]]


def test_null_calibration_tracks_closed_form_and_sample_family_matters():
    """The calibrated threshold exists to keep the expected count of
    null pairs over threshold O(1) as n grows. Closed form on
    isotropic unit vectors (dim d): null cos ≈ N(0, 1/d), so thr ≈
    √(1/d)·√(2·ln(n(n−1)/2)). Pins: (a) the derived threshold lands
    within ±15% of the closed form; (b) zero of 2000 fresh null pairs
    cross it; (c) teeth — a FIRST-N sample (the bias the md5 ordering
    exists to prevent) on a corpus whose low ids are a planted
    near-dup cluster contaminates the "null" estimate and pushes the
    threshold above the real signal level, which the hash-ordered
    family keeps cleanly separated."""
    import math

    from real_time_event_streaming_pipeline_spark.operators.similarity import (
        _null_threshold_from_sample,
    )

    rng = np.random.default_rng(3)
    d, n_corpus = 64, 10_000
    n_real = 2000  # materialized rows (statistic targets n_corpus pairs)
    V = rng.standard_normal((n_real, d))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    ids = list(range(n_real))
    sample = _md5_ordered_sample(ids, [list(map(float, v)) for v in V])
    thr = _null_threshold_from_sample(sample, n_corpus, floor=0.0)
    closed = math.sqrt(1.0 / d) * math.sqrt(
        2.0 * math.log(n_corpus * (n_corpus - 1) / 2.0)
    )
    assert abs(thr - closed) / closed < 0.15, (thr, closed)
    # (b) the delivered statistic: fresh null pairs stay under it
    A = rng.standard_normal((2000, d))
    B = rng.standard_normal((2000, d))
    cos = (A * B).sum(1) / (np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1))
    assert (cos >= thr).sum() == 0, (cos.max(), thr)
    # (c) teeth: a SMALL planted near-dup cluster (512 of 20k ids,
    # sitting exactly in the first-n window) at the soak fixture's
    # realistic cos≈0.93 operating point. FIRST-N sampling (the bias
    # the md5 ordering exists to prevent) reads ONLY the cluster, so
    # the "null" estimate absorbs the signal and the threshold lands
    # above it — the hash-ordered family dilutes the cluster to its
    # true ~2.6% prevalence and keeps the threshold cleanly below.
    n_big = 20_000
    Vb = rng.standard_normal((n_big, d))
    Vb /= np.linalg.norm(Vb, axis=1, keepdims=True)
    base = rng.standard_normal(d)
    planted = base + 0.4 * rng.standard_normal((512, d))
    planted /= np.linalg.norm(planted, axis=1, keepdims=True)
    Vb[:512] = planted
    sig_cos = (planted[:100] @ planted[100:200].T).mean()  # ≈ 1/1.16 ≈ 0.86
    first_n = [list(map(float, v)) for v in Vb[:512]]
    thr_biased = _null_threshold_from_sample(first_n, n_corpus, floor=0.0)
    assert thr_biased > sig_cos, (thr_biased, sig_cos)
    hashed = _md5_ordered_sample(
        list(range(n_big)), [list(map(float, v)) for v in Vb]
    )
    thr_hashed = _null_threshold_from_sample(hashed, n_corpus, floor=0.0)
    assert thr_hashed < sig_cos, (thr_hashed, sig_cos)


# ---------------------------------------------------------------------------
# MinHash banding (bands × rows) parameterization
# ---------------------------------------------------------------------------


def _minhash_sig(shingle_set, num_hashes=32):
    from real_time_event_streaming_pipeline_spark.operators.dedup import (
        _MERSENNE,
        _perm,
    )

    hs = [_h60_py(s) % _MERSENNE for s in shingle_set]
    sig = []
    for i in range(num_hashes):
        a, b = _perm(i)
        sig.append(min((a * h + b) % _MERSENNE for h in hs))
    return sig


def _band_collides(sa, sb, band_rows):
    """True iff any band's full row-slice matches."""
    return any(
        sa[lo : lo + len(rows_idx)] == sb[lo : lo + len(rows_idx)]
        for lo, rows_idx in band_rows
    )


def _candidate_rate(jaccard, band_rows, n_pairs=200, shingle_sets=100):
    """Empirical P(LSH candidate) for pairs at a fixed true Jaccard:
    both docs share c of K shingles with J = c/(2K−c)."""
    K = 90
    c = round(2 * K * jaccard / (1 + jaccard))
    hits = 0
    for g in range(n_pairs):
        common = [f"c{g}_{j}" for j in range(c)]
        a = common + [f"a{g}_{j}" for j in range(K - c)]
        b = common + [f"b{g}_{j}" for j in range(K - c)]
        sa, sb = _minhash_sig(a), _minhash_sig(b)
        if _band_collides(sa, sb, band_rows):
            hits += 1
    return hits / n_pairs


def test_banding_parameterization_s_curve():
    """bands=8 × rows=4 puts the S-curve threshold at (1/8)^(1/4) ≈
    0.59: closed form P(cand) = 1−(1−s^4)^8 ≈ 0.985 at s=0.8 and
    ≈ 0.063 at s=0.3. Pins both sides of the curve, then teeth: a
    degenerate parameterization where every band reads the SAME four
    rows collapses to P = s^4 (≈ 0.41 at s=0.8) — high-similarity
    recall dies while the bitwise oracle (which replays the same
    degenerate bands) would stay green."""
    good = [(j * 4, list(range(4))) for j in range(8)]
    degenerate = [(0, list(range(4)))] * 8
    high = _candidate_rate(0.8, good)
    assert high >= 0.9, high
    low = _candidate_rate(0.3, good)
    assert low <= 0.2, low
    deg_high = _candidate_rate(0.8, degenerate)
    assert deg_high <= 0.65, deg_high
