"""Distributed logistic regression tests (functions/ml.py).

Query-level pin is the sf0.001 golden (iterative, no SQL oracle); these
verify the distributed fit against a single-process reference running
the SAME quantized-gradient arithmetic, plus split-invariance and
learning-behavior checks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray.functions.ml import (
    _Q,
    label_target,
    logreg_fit,
    logreg_grad_partial,
)

SF = "/root/testdata/sf0.001"


def brute_force_fit(x, y, lr=1.0, n_iter=8):
    """Single-process reference: whole-corpus batch per iteration,
    identical per-row quantization — must equal the Ray fit exactly."""
    w = np.zeros(x.shape[1] + 1)
    losses = []
    for _ in range(n_iter):
        gq, lq, n = logreg_grad_partial(x, y, w)
        losses.append(lq / (_Q * n))
        w = w - lr * np.array([float(v) for v in gq]) / (_Q * n)
    return w, losses


def make_ds(x, labels):
    t = pa.table(
        {
            "vec_id": pa.array(range(len(x)), pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in x], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    return rd.from_arrow(t)


@pytest.fixture(scope="module")
def emb(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    arr = t.column("embedding").combine_chunks()
    x = arr.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64
    ).reshape(len(arr), -1)
    labels = t.column("label").to_numpy()
    return x, labels


target0 = label_target(0)


class TestLogreg:
    def test_matches_brute_force_exactly(self, ray_session, emb):
        x, labels = emb
        fit = logreg_fit(
            rd.read_parquet(f"{SF}/embeddings.parquet"), target0
        )
        bw, blosses = brute_force_fit(x, (labels == 0).astype(np.float64))
        # per-row int quantization -> partials merge exactly -> identical w
        np.testing.assert_array_equal(fit["w"], bw)
        np.testing.assert_array_equal(fit["losses"], blosses)

    def test_split_invariant(self, ray_session, emb):
        x, labels = emb
        f1 = logreg_fit(make_ds(x[:200], labels[:200]), target0, n_iter=4)
        f2 = logreg_fit(
            make_ds(x[:200], labels[:200]).repartition(11), target0, n_iter=4
        )
        np.testing.assert_array_equal(f1["w"], f2["w"])
        assert f1["losses"] == f2["losses"]
        assert f1["accuracy"] == f2["accuracy"]

    def test_loss_decreases_and_learns(self, ray_session, emb):
        x, labels = emb
        fit = logreg_fit(make_ds(x, labels), target0)
        assert fit["losses"][-1] < fit["losses"][0]
        base = max((labels == 0).mean(), 1 - (labels == 0).mean())
        assert fit["accuracy"] >= base - 1e-9  # at least majority class

    def test_separable_toy_problem(self, ray_session):
        # y = 1 iff first coordinate > 0 — trivially separable
        rng = np.random.RandomState(3)
        x = rng.randn(400, 4)
        labels = np.where(x[:, 0] > 0, 0, 1).astype(np.int32)
        fit = logreg_fit(make_ds(x, labels), target0, lr=2.0, n_iter=20)
        assert fit["accuracy"] > 0.97
        assert fit["w"][0] > 0  # weight on the separating coordinate

    def test_empty_raises(self, ray_session):
        ds = make_ds(np.zeros((0, 4)), np.array([], dtype=np.int32))
        with pytest.raises(ValueError, match="empty"):
            logreg_fit(ds, target0, n_iter=1)
