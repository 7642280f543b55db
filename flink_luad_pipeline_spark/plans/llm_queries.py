"""LLM-data-pipeline queries (dedup/similarity/text/multimodal) — M5."""

from __future__ import annotations
