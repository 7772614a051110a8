"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the library calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (interleaved-span extraction) on sf0.001."""
    from ocr_platform_ray.pipeline import (
        PipelineOptions,
        build_extract_pipeline,
        corpus_from_documents,
    )

    ds = corpus_from_documents("/root/testdata/sf0.001")
    return build_extract_pipeline(ds, opts=PipelineOptions())


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_platform_ray.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from ocr_platform_ray.queries import oracle_sql as _o

    return _o()
