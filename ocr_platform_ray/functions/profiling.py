"""Column profiling: the data-quality report a pipeline runs before
training on a new corpus — per-column row/null counts and min/max, as
mergeable per-batch partials (one tiny row per column per batch through
the shuffle, never values).

Generalizes the reference's per-job progress counters
(/root/reference/apps/api/app/api/v1/routes_jobs.py job listing counts)
to column-level corpus statistics.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_PARTIAL_SCHEMA = pa.schema(
    [
        pa.field("column", pa.string()),
        pa.field("n_rows", pa.int64()),
        pa.field("n_nulls", pa.int64()),
        pa.field("num_min", pa.float64()),
        pa.field("num_max", pa.float64()),
        pa.field("str_min", pa.string()),
        pa.field("str_max", pa.string()),
    ]
)


def profile_columns(ds: rd.Dataset, columns: list[str]) -> rd.Dataset:
    """Per-column profile: (column, n_rows, n_nulls, num_min, num_max,
    str_min, str_max) — numeric extremes in the float channel (exact:
    int64/double min/max involve no arithmetic), everything else cast to
    string and compared lexicographically (SQL min/max semantics under
    binary collation). Each batch emits one row per column; the merge is
    sum / min-of-mins / max-of-maxes per column."""

    def partial(batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in _PARTIAL_SCHEMA.names}
        for col in columns:
            arr = batch.column(col)
            rows["column"].append(col)
            rows["n_rows"].append(batch.num_rows)
            rows["n_nulls"].append(int(pc.count(arr, mode="only_null").as_py()))
            valid = int(pc.count(arr, mode="only_valid").as_py())
            is_num = pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type)
            num_min = num_max = str_min = str_max = None
            if valid and is_num:
                mm = pc.min_max(arr).as_py()
                num_min, num_max = float(mm["min"]), float(mm["max"])
            elif valid:
                s = arr if pa.types.is_string(arr.type) else pc.cast(arr, pa.string())
                mm = pc.min_max(s).as_py()
                str_min, str_max = mm["min"], mm["max"]
            rows["num_min"].append(num_min)
            rows["num_max"].append(num_max)
            rows["str_min"].append(str_min)
            rows["str_max"].append(str_max)
        return pa.Table.from_pydict(rows, schema=_PARTIAL_SCHEMA)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        num_min, num_max = g["num_min"].dropna(), g["num_max"].dropna()
        str_min, str_max = g["str_min"].dropna(), g["str_max"].dropna()
        return pd.DataFrame(
            {
                "column": [g["column"].iloc[0]],
                "n_rows": [int(g["n_rows"].sum())],
                "n_nulls": [int(g["n_nulls"].sum())],
                "num_min": [float(num_min.min()) if len(num_min) else None],
                "num_max": [float(num_max.max()) if len(num_max) else None],
                "str_min": [str(str_min.min()) if len(str_min) else None],
                "str_max": [str(str_max.max()) if len(str_max) else None],
            }
        )

    return (
        ds.select_columns(columns)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("column")
        .map_groups(final, batch_format="pandas")
        .sort("column")
    )
