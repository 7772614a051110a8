"""Reading-order sort of detected boxes.

The reference never sorts boxes — block order is CRAFT's emission order, or
the human-edited array order (SURVEY §2.6; /root/reference/libs/ocr_core/
ocr_core/pipeline/orchestrator.py:140 preserves array order). The target
contract makes ordering explicit: top-to-bottom rows (clustered by vertical
overlap), left-to-right within a row, stable tie-break by original index.
Override boxes (the human-edit analogue) are NOT re-sorted — array order is
their contract.
"""

from __future__ import annotations

Box = tuple[int, int, int, int]


def reading_order(boxes: list[Box]) -> list[int]:
    """Indices of ``boxes`` in reading order.

    Two boxes share a row iff their vertical overlap is >= 50% of the
    smaller box height. Rows ordered by their top edge; within a row by
    (x1, original index). Deterministic for any input.
    """
    rows: list[dict] = []  # {y1, y2, members: [(x1, idx)]}
    order_in = sorted(range(len(boxes)), key=lambda i: (boxes[i][1], boxes[i][0], i))
    for i in order_in:
        x1, y1, x2, y2 = boxes[i]
        h = max(1, y2 - y1)
        placed = False
        for row in rows:
            ov = min(y2, row["y2"]) - max(y1, row["y1"])
            if ov >= 0.5 * min(h, max(1, row["y2"] - row["y1"])):
                row["members"].append((x1, i))
                row["y1"] = min(row["y1"], y1)
                row["y2"] = max(row["y2"], y2)
                placed = True
                break
        if not placed:
            rows.append({"y1": y1, "y2": y2, "members": [(x1, i)]})
    rows.sort(key=lambda r: (r["y1"], r["y2"]))
    out: list[int] = []
    for row in rows:
        out.extend(i for _x, i in sorted(row["members"]))
    return out
