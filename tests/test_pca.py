"""Distributed PCA tests (similarity.pca_fit / pca_project).

Query-level pin is the sf0.001 golden (no SQL eigendecomposition);
these verify the fit against a single-process brute-force
implementation of the SAME quantized-moment arithmetic, plus the
split-invariance and sign-pin contracts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray.functions.similarity import (
    _PCA_SCALE,
    pca_fit,
    pca_project,
)

SF = "/root/testdata/sf0.001"


def brute_force_fit(x: np.ndarray):
    """Single-process reference: identical quantized-moment arithmetic."""
    xq = np.rint(x * _PCA_SCALE).astype(object)  # exact bigint sums
    n, d = x.shape
    sx = xq.sum(axis=0)
    sxx = xq.T @ xq
    s2 = _PCA_SCALE * _PCA_SCALE
    cov = np.empty((d, d))
    for i in range(d):
        for j in range(d):
            cov[i, j] = float(n * sxx[i, j] - sx[i] * sx[j]) / (
                n * (n - 1) * s2
            )
    mean = np.array([float(v) for v in sx]) / (n * _PCA_SCALE)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval, kind="stable")[::-1]
    comps = eigvec[:, order].T.copy()
    for i in range(d):
        jmax = int(np.argmax(np.abs(comps[i])))
        if comps[i, jmax] < 0:
            comps[i] = -comps[i]
    return mean, comps, eigval[order]


def small_ds(x: np.ndarray) -> rd.Dataset:
    t = pa.table(
        {
            "vec_id": pa.array(range(len(x)), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in x], pa.list_(pa.float32())
            ),
        }
    )
    return rd.from_arrow(t)


@pytest.fixture(scope="module")
def emb_matrix(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    arr = t.column("embedding").combine_chunks()
    return arr.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64
    ).reshape(len(arr), -1)


class TestPCAFit:
    def test_matches_brute_force_exactly(self, ray_session, emb_matrix):
        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        mean, comps, eigval = pca_fit(ds)
        bmean, bcomps, beigval = brute_force_fit(emb_matrix)
        # moments are EXACT integers -> identical cov -> identical eigh
        np.testing.assert_array_equal(mean, bmean)
        np.testing.assert_array_equal(comps, bcomps)
        np.testing.assert_array_equal(eigval, beigval)

    def test_split_invariant(self, ray_session, emb_matrix):
        ds1 = small_ds(emb_matrix[:200])
        ds2 = small_ds(emb_matrix[:200]).repartition(13)
        m1, c1, e1 = pca_fit(ds1)
        m2, c2, e2 = pca_fit(ds2)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(e1, e2)

    def test_eigenvalues_descending_and_nonneg(self, ray_session, emb_matrix):
        _, _, eigval = pca_fit(small_ds(emb_matrix[:300]))
        assert (np.diff(eigval) <= 1e-12).all()
        assert (eigval > -1e-9).all()

    def test_components_orthonormal_sign_pinned(self, ray_session, emb_matrix):
        _, comps, _ = pca_fit(small_ds(emb_matrix[:300]))
        np.testing.assert_allclose(
            comps @ comps.T, np.eye(len(comps)), atol=1e-10
        )
        for row in comps:
            assert row[int(np.argmax(np.abs(row)))] > 0

    def test_known_2d_direction(self, ray_session):
        # points along y = 2x: first component is (1, 2)/sqrt(5)
        t = np.linspace(-1, 1, 50)
        x = np.stack([t, 2 * t], axis=1)
        _, comps, eigval = pca_fit(small_ds(x))
        np.testing.assert_allclose(
            comps[0], np.array([1.0, 2.0]) / np.sqrt(5), atol=1e-5
        )
        assert eigval[1] < 1e-9  # rank-1 data

    def test_empty_and_tiny_raise(self, ray_session):
        with pytest.raises(ValueError):
            pca_fit(small_ds(np.zeros((1, 4))))


class TestPCAProject:
    def test_projection_variance_matches_eigvals(self, ray_session, emb_matrix):
        ds = small_ds(emb_matrix[:300])
        _, _, eigval = pca_fit(ds)
        out = pca_project(ds, k=2).to_pandas()
        assert set(out.columns) == {"vec_id", "pc1", "pc2"}
        assert len(out) == 300
        # per-component sample variance == eigenvalue (rounded output)
        np.testing.assert_allclose(out["pc1"].var(ddof=1), eigval[0], rtol=1e-3)
        np.testing.assert_allclose(out["pc2"].var(ddof=1), eigval[1], rtol=1e-3)
        # components decorrelated
        assert abs(np.corrcoef(out["pc1"], out["pc2"])[0, 1]) < 1e-2

    def test_k_too_large_raises(self, ray_session, emb_matrix):
        with pytest.raises(ValueError, match="k="):
            pca_project(small_ds(emb_matrix[:50]), k=65)
