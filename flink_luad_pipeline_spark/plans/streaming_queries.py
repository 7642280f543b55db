"""Structured Streaming queries over the events table — M5."""

from __future__ import annotations
