"""Device-path telemetry: which accelerator engines engaged, why the
others declined, and how many device dispatches each issued.

The headline bench (bench.py) embeds a snapshot in its JSON line so every
recorded run states explicitly whether the chip did work and, if not,
which measured gate (tpu/linkcal.py) ruled it out — the dispatch-decision
analogue of the reference's rayon on/off guard telemetry
(common/src/parallel.rs:6-46)."""

from __future__ import annotations

_COUNTS: dict[str, int] = {}
_DECISIONS: dict[str, str] = {}


def count(engine: str, n: int = 1) -> None:
    """Record n device dispatches issued by an engine."""
    _COUNTS[engine] = _COUNTS.get(engine, 0) + n


def decide(engine: str, decision: str) -> None:
    """Record the most recent engage/decline decision for an engine."""
    _DECISIONS[engine] = decision


def snapshot() -> dict:
    """{"dispatches": {engine: n}, "decisions": {engine: reason}}."""
    return {"dispatches": dict(_COUNTS), "decisions": dict(_DECISIONS)}


def reset() -> None:
    _COUNTS.clear()
    _DECISIONS.clear()
