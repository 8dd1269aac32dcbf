"""CPU golden references: float64 numpy oracle + optional C oracle.

``oracle`` pins the framework's numerical conventions (see its module
docstring).  ``native`` (when built) exposes the literal C implementation
with identical conventions for bit-level structural parity checks.
"""

from audiosignalprocess_tpu.cpu_ref import oracle  # noqa: F401
