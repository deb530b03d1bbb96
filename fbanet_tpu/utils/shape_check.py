"""Trace-time shape assertions + the jaxtyping runtime harness.

The reference enforces shapes two ways (SURVEY.md §4): a small runtime
helper used ~40x through the model forward (fba_net/assert_shape.py:6-13)
and jaxtyping annotations enforced by `beartype_this_package()`
(fba_net/registration/optical_flow/__init__.py:1-3, pyproject.toml:49-74).
Inside jit both run at trace time, so they are free after compilation.

Here: `assert_shape` keeps the helper contract (`None` = wildcard), and
`typed` is the jaxtyping enforcement decorator (typeguard-backed — beartype
is not in this image) applied to the public ops surfaces. If jaxtyping or
typeguard is unavailable, `typed` degrades to a no-op so the library never
hard-depends on the checker.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

try:
    from jaxtyping import jaxtyped as _jaxtyped
    from typeguard import typechecked as _typechecked

    def typed(fn):
        """Enforce the function's jaxtyping annotations at trace time."""
        return _jaxtyped(typechecker=_typechecked)(fn)
except ImportError:  # pragma: no cover
    def typed(fn):
        return fn


def assert_shape(expected: Sequence[int | None], array: Any) -> None:
    """Assert `array.shape` matches `expected`, with None as a wildcard."""
    shape = tuple(array.shape)
    ok = len(shape) == len(expected) and all(
        e is None or e == s for e, s in zip(expected, shape)
    )
    if not ok:
        raise AssertionError(f"shape mismatch: expected {tuple(expected)}, got {shape}")
