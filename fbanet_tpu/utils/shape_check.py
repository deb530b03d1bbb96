"""Trace-time shape assertions.

The reference enforces shapes with a small runtime helper used ~40x through
the model forward (reference: fba_net/assert_shape.py:6-13). Inside jit these
checks run at trace time, so they are free after compilation. We keep the
same contract: `None` entries are wildcards.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any


def assert_shape(expected: Sequence[int | None], array: Any) -> None:
    """Assert `array.shape` matches `expected`, with None as a wildcard."""
    shape = tuple(array.shape)
    ok = len(shape) == len(expected) and all(
        e is None or e == s for e, s in zip(expected, shape)
    )
    if not ok:
        raise AssertionError(f"shape mismatch: expected {tuple(expected)}, got {shape}")
