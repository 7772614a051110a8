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
        "doc_id", "spans_out", "n_spans_out", "n_blocks", "min_conf",
        "mean_conf", "n_span_errors", "tenant_id",
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


@pytest.mark.slow
def test_output_invariant_across_num_cpus(tmp_path):
    """SURVEY §7.5.1: extraction output must be identical under different
    parallelism levels — two fresh sessions (num_cpus 2 and 4) over the
    same corpus via the job CLI."""
    corpus_path = tmp_path / "docs.parquet"
    from ocr_platform_ray.corpus import generate_corpus_table

    pq.write_table(generate_corpus_table(20, seed=31), corpus_path)

    def run(ncpu, out):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        r = subprocess.run(
            [sys.executable, "-m", "ocr_platform_ray.job",
             "--input", str(corpus_path), "--output", out, "--shards", "2"],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=420,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        rows = {}
        for part in sorted(os.listdir(out)):
            if not part.startswith("part-"):
                continue
            for f in sorted(os.listdir(os.path.join(out, part))):
                for row in pq.read_table(os.path.join(out, part, f)).to_pylist():
                    rows[row["doc_id"]] = [
                        (s["kind"], s["text"], s["media_ref"], s["offset"])
                        for s in row["spans_out"]
                    ]
        return rows

    a = run(2, str(tmp_path / "out2"))
    b = run(4, str(tmp_path / "out4"))
    assert a == b and len(a) == 20
