"""Streaming surface queries (bounded-input checks) — populated incrementally."""
