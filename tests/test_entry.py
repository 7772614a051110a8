"""Driver-contract smoke: entry() runs on a pre-initialised Ray session and
yields rows with the stable output schema; queries()/oracle_sql() are
consistent; the job CLI runs end-to-end via subprocess (ray job submit
shape)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest


def test_entry_smoke():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    out = m.entry()
    df = out.to_pandas()
    assert len(df) >= 1
    assert list(df.columns) == [
        "doc_id", "spans_out", "n_spans_out", "n_blocks", "min_conf", "mean_conf",
    ]


def test_registry_consistency():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) >= 19
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


@pytest.mark.slow
def test_job_cli_runs_and_resumes(tmp_path):
    corpus_path = tmp_path / "docs.parquet"
    from ocr_platform_ray.corpus import generate_corpus_table

    pq.write_table(generate_corpus_table(24, seed=5), corpus_path)
    out_dir = tmp_path / "out"
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    cmd = [
        sys.executable, "-m", "ocr_platform_ray.job",
        "--input", str(corpus_path), "--output", str(out_dir), "--shards", "2",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        cwd="/root/repo", timeout=420)
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["shards_ran"] == [0, 1] and s1["n_docs"] == 24
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        cwd="/root/repo", timeout=420)
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["shards_ran"] == [] and s2["shards_skipped"] == [0, 1]
