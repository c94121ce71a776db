"""Tracker registry (reference: src/track/registry.py:10-14).

Table-driven like the preprocess registry, so additional association
backends (e.g. a Hungarian variant) plug in as new entries.
"""
from __future__ import annotations

from typing import Any, Dict, Type

from .base import Tracker
from .sort_tracker import SortTracker

BACKENDS: Dict[str, Type[Tracker]] = {
    "sort": SortTracker,
}


def build_tracker(cfg: Dict[str, Any]) -> Tracker:
    name = str(cfg.get("backend") or "sort").lower()
    try:
        cls = BACKENDS[name]
    except KeyError:
        raise ValueError(f"unknown tracking backend: {name}") from None
    return cls(cfg)
