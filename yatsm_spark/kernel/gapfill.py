"""Pure-numpy gap-fill reference kernel.

The Spark engine gap-fills with ``sequence() + explode + left join``
(operators/rollup.py, SURVEY.md §2.5 W8 — pure Spark, no Python). This numpy
twin exists so tests can diff the distributed result against an obviously
correct single-core implementation (FIXTURES.md §3.5), mirroring how the
reference pins behavior with golden arrays.
"""

from __future__ import annotations

import numpy as np


def gapfill_slots(
    slot_epochs: np.ndarray,
    values: dict[str, np.ndarray],
    step: int,
    start: int | None = None,
    stop: int | None = None,
) -> dict[str, np.ndarray]:
    """Reindex sparse (slot_epoch -> measures) onto a dense slot grid.

    slot_epochs: int64 seconds (window starts), strictly increasing.
    values: named measure arrays aligned with slot_epochs. Arrays of float
    dtype are filled with NaN on gap slots; integer/count arrays with 0.
    Returns dict with 'slot_epoch', 'gap_filled', and each measure.
    """
    slot_epochs = np.asarray(slot_epochs, dtype=np.int64)
    if start is None:
        start = int(slot_epochs.min())
    if stop is None:
        stop = int(slot_epochs.max())
    grid = np.arange(start, stop + step, step, dtype=np.int64)
    pos = np.searchsorted(grid, slot_epochs)
    present = np.zeros(len(grid), dtype=bool)
    present[pos] = True
    out: dict[str, np.ndarray] = {
        "slot_epoch": grid,
        "gap_filled": ~present,
    }
    for name, arr in values.items():
        arr = np.asarray(arr)
        if np.issubdtype(arr.dtype, np.integer):
            dense = np.zeros(len(grid), dtype=arr.dtype)
        else:
            dense = np.full(len(grid), np.nan, dtype=np.float64)
        dense[pos] = arr
        out[name] = dense
    return out
