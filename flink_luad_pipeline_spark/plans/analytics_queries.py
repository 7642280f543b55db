"""Composite analytics queries (SURVEY §2.6-2.7) — filled in M3."""

from __future__ import annotations
