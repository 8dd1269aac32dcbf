"""Trace-time argument validation.

Library guards (halo bounds, shard alignment, kernel shape constraints)
must survive ``python -O``: a stripped ``assert`` would silently re-enable
the exact corruption modes the guards exist to stop (fabricated halo
history, mis-aligned resampler phase).  ``check`` raises ``ValueError``
unconditionally.  All call sites evaluate at trace time (static shapes /
config), so the cost is zero per device step.
"""

from __future__ import annotations


def check(cond: bool, msg: str) -> None:
    """Raise ``ValueError(msg)`` unless ``cond``.

    Unlike ``assert`` this fires under ``python -O`` and raises an
    exception type callers can reasonably catch.
    """
    if not cond:
        raise ValueError(msg)
