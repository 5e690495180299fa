"""PCA power iteration (operators/pca.py), tested three ways:

1. DIFFERENTIAL: the distributed computation must match a numpy power
   iteration running the IDENTICAL steps (same start, same count) to
   ~quantization error — proving the Spark dataflow computes exactly
   the algorithm it claims.
2. PLANTED SIGNAL: on data with a real dominant direction (clear
   spectral gap) 4 iterations must recover the true top eigenvector —
   proving the algorithm finds real structure.
3. INVARIANTS on the shipped corpus query (unit loading, scalar
   broadcast columns, evr bounds, monotone improvement with more
   iterations).

The synthetic embeddings corpus is near-isotropic (λ2/λ1 ≈ 0.987
measured), where NO fixed-budget power method isolates the exact top
eigenvector — the operator docstring documents that the convergence
rate is (λ2/λ1)^t like any power iteration; these tests pin what the
fixed-budget output actually guarantees.
"""

from __future__ import annotations

import numpy as np

from convoy_spark.operators.pca import pca_top_component

SF_DIR = "/root/testdata/sf0.01"


def _np_power_iteration(X: np.ndarray, t: int):
    Y = X - X.mean(axis=0)
    S = Y.T @ Y
    v = np.ones(X.shape[1])
    nrm = None
    for _ in range(t):
        w = S @ v
        nrm = np.linalg.norm(w)
        v = w / nrm
    return v, nrm, np.trace(S)


def _load_embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_pca_differential_vs_numpy_same_steps(spark):
    emb = _load_embeddings(spark)
    X = np.array(
        [
            r.embedding
            for r in emb.select("embedding").orderBy("vec_id").collect()
        ],
        dtype=np.float64,
    )
    v_np, nrm_np, tr_np = _np_power_iteration(X, 4)
    rows = pca_top_component(emb).orderBy("d").collect()
    v_sp = np.array([r.loading for r in rows])
    # identical algorithm, so agreement to ~1e-9 (the 2^-40 per-term
    # quantization compounds over 4 normalized iterations)
    assert np.max(np.abs(v_sp - v_np)) < 1e-8, np.max(np.abs(v_sp - v_np))
    assert abs(rows[0].eigenvalue - nrm_np) / nrm_np < 1e-9
    assert abs(rows[0].explained_variance_ratio - nrm_np / tr_np) < 1e-9


def test_pca_recovers_planted_direction(spark):
    # 300 samples in 16 dims: isotropic noise + one strong direction
    # (clear spectral gap) — 4 iterations must recover it
    rng = np.random.RandomState(7)
    dim, n = 16, 300
    u = rng.randn(dim)
    u /= np.linalg.norm(u)
    X = rng.randn(n, dim) + np.outer(rng.randn(n) * 6.0, u)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    Y = X - X.mean(axis=0)
    evals, evecs = np.linalg.eigh(Y.T @ Y)
    assert evals[-2] / evals[-1] < 0.25  # the gap is real
    rows = pca_top_component(emb).orderBy("d").collect()
    v = np.array([r.loading for r in rows])
    cos = abs(float(v @ evecs[:, -1]))
    assert cos > 0.999, cos
    assert abs(rows[0].eigenvalue - evals[-1]) / evals[-1] < 1e-3
    evr = rows[0].explained_variance_ratio
    assert abs(evr - evals[-1] / evals.sum()) < 1e-3


def test_pca_output_invariants(spark):
    rows = pca_top_component(_load_embeddings(spark)).collect()
    v = np.array([r.loading for r in rows])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9  # unit loading
    eigs = {r.eigenvalue for r in rows}
    evrs = {r.explained_variance_ratio for r in rows}
    assert len(eigs) == 1 and len(evrs) == 1  # scalars broadcast
    assert 0 < evrs.pop() <= 1.0
    assert {r.d for r in rows} == set(range(len(rows)))


def test_pca_more_iterations_improves_rayleigh(spark):
    # ||S v_t|| is non-decreasing in t for power iteration — more
    # budget must never give a worse eigenvalue estimate
    emb = _load_embeddings(spark)
    e4 = pca_top_component(emb, 4).collect()[0].eigenvalue
    e6 = pca_top_component(emb, 6).collect()[0].eigenvalue
    assert e6 >= e4 - 1e-9


def test_pca_topk_matches_numpy_deflation(spark):
    """pca_topk_components == numpy running the identical fixed-step
    power loops with Hotelling deflation between components; on the
    planted-two-direction corpus the deflated iterates recover the
    true top-2 eigenvectors."""
    from convoy_spark.operators.pca import pca_topk_components

    rng = np.random.RandomState(11)
    dim, n = 12, 250
    u1 = rng.randn(dim); u1 /= np.linalg.norm(u1)
    u2 = rng.randn(dim); u2 -= (u2 @ u1) * u1; u2 /= np.linalg.norm(u2)
    X = (
        rng.randn(n, dim) * 0.3
        + np.outer(rng.randn(n) * 8.0, u1)
        + np.outer(rng.randn(n) * 4.0, u2)
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    k, t = 3, 4
    got = pca_topk_components(emb, k=k, n_iterations=t).collect()
    by_comp = {
        c: np.array(
            [r.loading for r in sorted(got, key=lambda r: r.d)
             if r.component == c]
        )
        for c in range(k)
    }
    eig = {r.component: r.eigenvalue for r in got}

    # numpy twin: same steps, double precision (quantization ~1e-12)
    Y = X - X.mean(axis=0)
    tr = np.trace(Y.T @ Y)
    for c in range(k):
        S = Y.T @ Y
        v = np.ones(dim)
        nrm = None
        for _ in range(t):
            w = S @ v
            nrm = np.linalg.norm(w)
            v = w / nrm
        assert np.max(np.abs(by_comp[c] - v)) < 1e-6, c
        assert abs(eig[c] - nrm) / nrm < 1e-6, c
        Y = Y - np.outer(Y @ v, v)  # deflate for the next component

    # structure: deflated iterates find the true top-2 directions
    evals, evecs = np.linalg.eigh((X - X.mean(0)).T @ (X - X.mean(0)))
    assert abs(float(by_comp[0] @ evecs[:, -1])) > 0.999
    assert abs(float(by_comp[1] @ evecs[:, -2])) > 0.99
    # eigenvalue estimates decrease and evr sums below 1
    assert eig[0] > eig[1] > eig[2] > 0
    evr = {r.component: r.explained_variance_ratio for r in got}
    assert sum(evr.values()) <= 1.0 + 1e-9
    assert abs(evr[0] - eig[0] / tr) < 1e-9


def test_pca_project_topk_component0_equals_pca_project(spark):
    """k=1 multi-component projection is exactly pca_project (same
    iterate, same exact-sum chain); and at k=2 the two components'
    scores decorrelate on planted-two-direction data (deflation basis
    is Gram-Schmidt-orthogonal up to iterate convergence)."""
    from convoy_spark.operators.pca import pca_project, pca_project_topk

    rng = np.random.RandomState(3)
    X = rng.randn(60, 8) + np.outer(rng.randn(60) * 5.0, rng.randn(8))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    single = {
        r.vec_id: (r.score, r.whitened) for r in pca_project(emb, 2).collect()
    }
    multi = pca_project_topk(emb, k=2, n_iterations=2).collect()
    comp0 = {
        r.vec_id: (r.score, r.whitened) for r in multi if r.component == 0
    }
    assert comp0 == single
    s0 = np.array([r.score for r in sorted(
        (r for r in multi if r.component == 0), key=lambda r: r.vec_id)])
    s1 = np.array([r.score for r in sorted(
        (r for r in multi if r.component == 1), key=lambda r: r.vec_id)])
    denom = np.linalg.norm(s0) * np.linalg.norm(s1)
    assert abs(float(s0 @ s1)) / denom < 0.05  # near-orthogonal scores


def test_pca_project_matches_numpy(spark):
    """pca_project == numpy running the identical scaled-long steps,
    and the whitened column is score/sqrt(lambda-hat)."""
    import numpy as np

    from convoy_spark.operators.pca import PSCALE, pca_project

    rng = np.random.RandomState(7)
    base = rng.normal(0, 0.05, (40, 8))
    base[:, 2] += rng.normal(0, 1.0, 40)  # dominant direction
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: (r.score, r.whitened) for r in pca_project(df, 2).collect()}

    def xsum(vals):
        return float(np.sum(np.floor(np.asarray(vals) * PSCALE))) / PSCALE

    y32 = base.astype(np.float32).astype(np.float64)
    mu = np.array([xsum(y32[:, d]) / len(y32) for d in range(8)])
    y = y32 - mu
    v = np.ones(8)
    for _ in range(2):
        s = np.array([xsum(y[i] * v) for i in range(len(y))])
        w = np.array([xsum(y[:, d] * s) for d in range(8)])
        m = np.abs(w).max()
        nrm = m * np.sqrt(xsum((w / m) * (w / m)))
        v = w / nrm
    for i in range(len(y)):
        sc = xsum(y[i] * v)
        assert abs(got[i][0] - sc) < 1e-9, (i, got[i][0], sc)
        assert abs(got[i][1] - sc / np.sqrt(nrm)) < 1e-9
