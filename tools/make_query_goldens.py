"""(Re)generate golden parquet snapshots for the rows-only queries
(tests/goldens/q_*.sf0.001.parquet). Run deliberately when a semantics
change is intentional; the diff then shows exactly what drifted:

    python tools/make_query_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "goldens")

# rows-only queries: no DuckDB oracle, so cross-round regressions are only
# visible through these pinned snapshots (VERDICT r1 item 9)
GOLDEN_QUERIES = [
    "q_fingerprint",
    "q_winnow_fingerprints",
    "q_minhash_pairs",
    "q_simhash_pairs",
    "q_media_features",
    "q_detect_boxes",
    "q_ann_topk_lsh",
    "q_ann_topk_ivf",
    "q_embedding_dups",
    # q_price_quantiles_sketch is deliberately NOT pinned: the equi-depth
    # summary is rank-accurate but its exact sample points depend on block
    # boundaries (which vary with num_cpus), so a byte-exact golden would
    # flake; its accuracy bound is pinned by TestQuantileSketch instead.
    "q_minhash_dedup_docs",
    "q_approx_distinct_users",
    "q_extract_summary",
    "q_jaccard_dups",
    "q_pack_sequences",
    "q_kmeans_summary",
    "q_semantic_dedup",
    "q_ann_topk_int8",
    "q_audio_features",
    "q_media_features_jpeg",
    "q_video_frame_features",
    "q_bpe_merges",
    "q_bpe_encode",
    "q_image_dups",
    "q_cms_token_counts",
    "q_compression_stats",
    "q_minhash_edit_verified",
    "q_video_frame_features_mjpeg",
    "q_embedding_pca",
    "q_logreg_label",
    "q_ann_topk_pq",
    "q_leakage_split_neardup",
]


def normalized(res):
    """Deterministic frame: stable column order, rows sorted by all
    sortable columns."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        df = res.to_pandas()
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res
    df = df[sorted(df.columns)]
    sort_cols = [
        c for c in df.columns
        if df[c].map(
            lambda v: not isinstance(v, (list, dict, np.ndarray))
        ).all()
    ]
    if sort_cols:
        df = df.sort_values(sort_cols, kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_platform_ray import queries as q

    reg = q.queries()
    only = set(sys.argv[1:])
    for name in GOLDEN_QUERIES:
        if only and name not in only:
            continue
        df = normalized(reg[name](SF_DIR))
        path = os.path.join(OUT_DIR, f"{name}.sf0.001.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
        print(f"{name}: {len(df)} rows -> {path}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
