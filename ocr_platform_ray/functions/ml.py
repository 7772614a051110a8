"""Distributed model training: full-batch logistic regression by
gradient descent over an embedding column.

The iterative-training operator class (next to k-means in
similarity.py): a quality/domain classifier trained ON the corpus is a
standard curation tool (e.g. a fastText/logreg "quality" model scored
over every document — the CCNet / LLaMA-style wiki-vs-crawl filter).

Scale shape: one streamed gradient pass per iteration — the dataset is
scanned, never collected or shuffled; each batch contributes ONE
(d+2)-vector partial. Per-ROW gradient contributions are quantized to
int64 fixed-point BEFORE the in-batch sum, so partials merge as exact
integers (Python bigints at the driver — no overflow at any row count)
and the fitted weights are BIT-IDENTICAL regardless of how Ray splits
blocks — the pca_fit split-invariance contract extended to an
iterative optimizer (a float partial sum would make the trained model
depend on block boundaries). n_iter scans is the k-means trade:
iteration count is small and fixed, corpus size is what scales.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .similarity import _emb_matrix

_Q = 1 << 28  # per-row gradient quantum: ~4e-9, far below lr-step scale


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logreg_grad_partial(
    x: np.ndarray, y: np.ndarray, w: np.ndarray
) -> tuple[list[int], int, int]:
    """One batch's exact-integer gradient partial under weights ``w``
    (w[:-1] features + w[-1] intercept). Returns (quantized gradient
    sums incl. intercept, quantized log-loss sum, n). Shared by the Ray
    pass and the single-process reference in tests."""
    z = x @ w[:-1] + w[-1]
    p = _sigmoid(z)
    r = p - y
    g = np.concatenate([r[:, None] * x, r[:, None]], axis=1)
    gq = np.rint(g * _Q).astype(np.int64).sum(axis=0)
    # row-local loss, same quantization (reporting only)
    loss = -(y * np.log(np.maximum(p, 1e-300))
             + (1 - y) * np.log(np.maximum(1 - p, 1e-300)))
    lq = int(np.rint(loss * _Q).astype(np.int64).sum())
    return [int(v) for v in gq], lq, len(x)


def label_target(target_label: int, col: str = "label"):
    """Serializable one-vs-rest target: y = 1 iff ``col`` == value.
    (A closure pickles by value, so callers outside the package — tests,
    notebooks — don't need their module importable on workers.)"""

    def target(batch: pa.Table) -> np.ndarray:
        return (
            batch.column(col).to_numpy() == target_label
        ).astype(np.float64)

    return target


def logreg_fit(
    ds: rd.Dataset,
    target_fn,
    col: str = "embedding",
    extra_cols: tuple[str, ...] = ("label",),
    lr: float = 1.0,
    n_iter: int = 8,
) -> dict:
    """Fit binary logistic regression; ``target_fn(batch) -> float {0,1}
    ndarray`` derives the label per batch (row-local). Returns
    {"w": ndarray d+1 (intercept last), "losses": per-iteration mean
    log-loss, "n": row count, "accuracy": final 0/1 accuracy}."""
    import ray

    from . import resolve_broadcast

    cols = [col, *extra_cols]
    # each iteration re-streams the PRUNED projection from source (the
    # decontaminate trade): at bench scale the n_iter+1 executions are
    # pure launch overhead (~0.7 s each — materializing the working set
    # was measured SLOWER, 8.9 vs 6.8 s, since it adds an execution),
    # and at 100 TB pinning the corpus in the object store would spill
    # it all anyway — re-scan cost is what amortizes
    base = ds.select_columns(cols)
    w = None
    losses = []
    n_total = 0
    for _ in range(n_iter):
        w_ref = ray.put(w)

        def gpass(batch: pa.Table) -> pa.Table:
            x = _emb_matrix(batch, col)
            if x.size == 0:
                return pa.Table.from_pydict(
                    {"g": pa.array([], pa.list_(pa.int64())),
                     "loss_q": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())}
                )
            wv = resolve_broadcast(w_ref)
            if wv is None:
                wv = np.zeros(x.shape[1] + 1)
            y = target_fn(batch).astype(np.float64)
            gq, lq, n = logreg_grad_partial(x, y, wv)
            return pa.Table.from_pydict(
                {"g": pa.array([gq], pa.list_(pa.int64())),
                 "loss_q": pa.array([lq], pa.int64()),
                 "n": pa.array([n], pa.int64())}
            )

        rows = base.map_batches(gpass, batch_format="pyarrow").take_all()
        g_sum = None
        loss_sum = 0
        n_total = 0
        for r in rows:
            bg = [int(v) for v in r["g"]]
            g_sum = bg if g_sum is None else [a + b for a, b in zip(g_sum, bg)]
            loss_sum += int(r["loss_q"])
            n_total += int(r["n"])
        if n_total == 0:
            raise ValueError("logreg_fit: empty dataset")
        if w is None:
            w = np.zeros(len(g_sum))
        grad = np.array([float(v) for v in g_sum]) / (_Q * n_total)
        losses.append(loss_sum / (_Q * n_total))
        w = w - lr * grad

    # final exact-integer accuracy pass
    import ray as _ray

    w_ref = _ray.put(w)

    def acc(batch: pa.Table) -> pa.Table:
        x = _emb_matrix(batch, col)
        if x.size == 0:
            return pa.Table.from_pydict({"c": pa.array([], pa.int64()),
                                         "n": pa.array([], pa.int64())})
        wv = resolve_broadcast(w_ref)
        y = target_fn(batch).astype(np.float64)
        pred = (x @ wv[:-1] + wv[-1]) >= 0.0
        return pa.Table.from_pydict(
            {"c": pa.array([int((pred == (y == 1.0)).sum())], pa.int64()),
             "n": pa.array([len(x)], pa.int64())}
        )

    arows = base.map_batches(acc, batch_format="pyarrow").take_all()
    correct = sum(int(r["c"]) for r in arows)
    return {
        "w": w,
        "losses": losses,
        "n": n_total,
        "accuracy": correct / n_total,
    }


def logreg_label_query(
    ds: rd.Dataset, target_label: int = 0, lr: float = 1.0, n_iter: int = 8
) -> rd.Dataset:
    """Driver-registry shape for logreg_fit: one-vs-rest on the
    embeddings table's ``label`` column, emitted as a tidy (term, value)
    table — w000..w0NN, intercept, then log_loss/accuracy/n summary
    rows — rounded half-away at 6 dp (golden-pinnable: the fit is
    bit-identical across block splits, see module docstring)."""
    from . import round_half_away

    fit = logreg_fit(ds, label_target(target_label), lr=lr, n_iter=n_iter)
    terms = [f"w{i:03d}" for i in range(len(fit["w"]) - 1)] + [
        "intercept",
        "log_loss",
        "accuracy",
        "n",
    ]
    values = [round_half_away(float(v), 6) for v in fit["w"]] + [
        round_half_away(fit["losses"][-1], 6),
        round_half_away(fit["accuracy"], 6),
        float(fit["n"]),
    ]
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"term": pa.array(terms, pa.string()),
             "value": pa.array(values, pa.float64())}
        )
    )
