"""FinOps analytics parity inventory (CUR-shaped semantics on testdata).

Populated incrementally; see analytics/ for the implementations.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
