"""Per-operator query registrations (filled in as operators land)."""

from __future__ import annotations
