"""LLM-pipeline operator inventory (dedup, similarity, text, multimodal).

Populated incrementally; see operators/ for the implementations.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
