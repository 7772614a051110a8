"""PageRank kernel + edge aggregation tests (functions/graphs.py).

The query-level gate is the unrolled-CTE DuckDB oracle
(q_nation_pagerank, checked at sf0.01 AND sf0.1); these pin the kernel
arithmetic independently against a pure-Python reference implementation
and hand-computed values.
"""

from __future__ import annotations

import numpy as np
import pytest

from ocr_platform_ray.functions.graphs import edge_counts, pagerank_kernel


def reference_pagerank(edges, nodes, d=0.85, n_iter=5):
    """Dict-based reference: same formulation, independent code path."""
    nodes = sorted(set(nodes))
    n = len(nodes)
    out_w = {v: 0.0 for v in nodes}
    for s, _, w in edges:
        out_w[s] += w
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += r[s] * w / out_w[s]
        dm = sum(r[v] for v in nodes if out_w[v] == 0.0)
        r = {
            v: (1 - d) / n + d * (contrib[v] + dm / n) for v in nodes
        }
    return np.array([r[v] for v in nodes])


def run_kernel(edges, nodes, **kw):
    if edges:
        src, dst, w = (np.array(x) for x in zip(*edges))
    else:
        src = dst = w = np.array([], dtype=np.int64)
    return pagerank_kernel(src, dst, w, np.array(nodes), **kw)


class TestPageRankKernel:
    def test_two_node_cycle_is_uniform(self):
        nodes, r = run_kernel([(0, 1, 1), (1, 0, 1)], [0, 1])
        np.testing.assert_allclose(r, [0.5, 0.5])

    def test_ranks_sum_to_one_every_config(self):
        edges = [(0, 1, 3), (1, 2, 1), (2, 0, 2), (3, 1, 5)]
        for n_iter in (1, 2, 7):
            _, r = run_kernel(edges, [0, 1, 2, 3, 4], n_iter=n_iter)
            assert abs(r.sum() - 1.0) < 1e-12

    def test_matches_reference_implementation(self):
        rng = np.random.RandomState(7)
        nodes = list(range(12))
        edges = [
            (int(rng.randint(12)), int(rng.randint(12)), int(rng.randint(1, 9)))
            for _ in range(60)
        ]
        _, r = run_kernel(edges, nodes, n_iter=6)
        ref = reference_pagerank(edges, nodes, n_iter=6)
        np.testing.assert_allclose(r, ref, rtol=0, atol=1e-14)

    def test_dangling_star_hand_value(self):
        # 1->0, 2->0; node 0 dangling. One iteration from uniform:
        # r(0) = 0.15/3 + 0.85*(2/3 + (1/3)/3)
        _, r = run_kernel([(1, 0, 1), (2, 0, 1)], [0, 1, 2], n_iter=1)
        expect0 = 0.15 / 3 + 0.85 * (2 / 3 + (1 / 3) / 3)
        expect12 = 0.15 / 3 + 0.85 * (0 + (1 / 3) / 3)
        np.testing.assert_allclose(r, [expect0, expect12, expect12])

    def test_weights_shift_mass(self):
        # 0 sends 3x more weight to 1 than to 2
        _, r = run_kernel([(0, 1, 3), (0, 2, 1)], [0, 1, 2], n_iter=3)
        assert r[1] > r[2]

    def test_isolated_node_keeps_floor_mass(self):
        nodes, r = run_kernel([(0, 1, 1), (1, 0, 1)], [0, 1, 9])
        assert r[2] > 0  # dangling/isolated node gets (1-d)/n + d*dm/n
        assert abs(r.sum() - 1.0) < 1e-12

    def test_edge_outside_universe_raises(self):
        with pytest.raises(ValueError, match="outside"):
            run_kernel([(0, 7, 1)], [0, 1])

    def test_empty_graph(self):
        nodes, r = run_kernel([], [])
        assert len(nodes) == 0 and len(r) == 0


class TestEdgeCounts:
    def test_aggregates_and_guards(self, ray_session):
        import pyarrow as pa

        import ray.data as rd

        t = pa.table(
            {
                "s": pa.array([1, 1, 2, 1], pa.int64()),
                "d": pa.array([2, 2, 3, 3], pa.int64()),
            }
        )
        ds = rd.from_arrow(t)
        src, dst, w = edge_counts(ds, "s", "d")
        got = {(int(a), int(b)): int(c) for a, b, c in zip(src, dst, w)}
        assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
        with pytest.raises(ValueError, match="edge partials"):
            edge_counts(ds, "s", "d", max_edges=1)
