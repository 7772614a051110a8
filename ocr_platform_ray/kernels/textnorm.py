"""Native-text-span normalization (scalar spec).

Generalizes the reference's postprocess hook (/root/reference/libs/
ocr_core/ocr_core/pipeline/postprocess.py:4-6 — ``strip`` only, with a TODO
for normalization hooks) into the main-content-extraction normalize stage
required by the target contract: boilerplate blocks are removed, whitespace
runs collapse to a single space, result is stripped.

This module is the *scalar* spec used by the oracle; the vectorized
pyarrow implementation lives in ``stages/normalize.py`` and is held to this
spec by the conformance suite. Patterns are ASCII-anchored so Python ``re``
and Arrow's RE2 agree.
"""

from __future__ import annotations

import re

# Corpus boilerplate markers, e.g. "[[AD]] buy now [[/AD]]".
BOILERPLATE_RE = r"\[\[AD\]\].*?\[\[/AD\]\]"
WS_RE = r"[ \t\n\r\f\v]+"

_boiler = re.compile(BOILERPLATE_RE, re.DOTALL)
_ws = re.compile(WS_RE)


def normalize_text(s: str) -> str:
    """Boilerplate-strip + whitespace-collapse + strip."""
    s = _boiler.sub(" ", s)
    s = _ws.sub(" ", s)
    return s.strip()
