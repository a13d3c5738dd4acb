"""Physical-strategy decision log.

Operators with size-gated strategy guards (broadcast kernel vs blocked
matrix join, broadcast band join vs shuffled hash join) record which
path they chose here. The log exists for OBSERVABILITY only — tests and
the scale demo (scripts/scale_demo.py) assert that the guards actually
flip to their fallback paths on real over-threshold inputs, instead of
inferring the choice from plan strings that AQE may rewrite.

One entry per operator name, overwritten per call — the consumer reads
it immediately after invoking the operator (same driver thread; Spark
operators decide strategy at plan-build time, driver-side).
"""

from __future__ import annotations

LAST: dict[str, dict] = {}


def record(op: str, **info) -> None:
    LAST[op] = info
