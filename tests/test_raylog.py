"""The mixed-schema log filter must drop ONLY the empty-bundle false
positive, not genuine non-empty schema divergences (a real bug signal)."""

import logging

from ocr_platform_ray.raylog import (
    _LOGGER,
    _DropMixedSchemaWarning,
    suppress_empty_sort_schema_warning,
)


def _rec(msg: str) -> logging.LogRecord:
    return logging.LogRecord(_LOGGER, logging.WARNING, __file__, 1, msg, (), None)


def test_filter_drops_empty_bundle_shape_only():
    f = _DropMixedSchemaWarning()
    base = ("Operator produced a RefBundle with a different schema "
            "than the previous one. Previous schema: a: int64, ")
    # empty bundle (schema-less): dropped
    assert not f.filter(_rec(base + "new schema: None. This may lead to "
                                    "unexpected behavior."))
    # zero-field schema: dropped
    assert not f.filter(_rec(base + "new schema: . This may lead to "
                                    "unexpected behavior."))
    # empty PANDAS block (sort range partition with no rows): dropped
    assert not f.filter(_rec(base + "new schema: PandasBlockSchema("
                                    "names=[], types=[]). This may lead "
                                    "to unexpected behavior."))
    # GENUINE divergence between two non-empty schemas: kept
    assert f.filter(_rec(base + "new schema: b: string. This may lead to "
                                "unexpected behavior."))
    # non-empty pandas schema divergence: kept
    assert f.filter(_rec(base + "new schema: PandasBlockSchema("
                                "names=['z'], types=[dtype('O')]). This "
                                "may lead to unexpected behavior."))
    # unrelated warnings: kept
    assert f.filter(_rec("spilling objects to disk"))


def test_install_is_idempotent():
    suppress_empty_sort_schema_warning()
    suppress_empty_sort_schema_warning()
    lg = logging.getLogger(_LOGGER)
    n = sum(isinstance(x, _DropMixedSchemaWarning) for x in lg.filters)
    assert n == 1
