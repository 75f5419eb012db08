"""Structured Streaming extensions (SURVEY §2.9 — the reference has no
streaming; its aspirational Celery/Redis pipeline is re-expressed as file
sources + watermarked windows + foreachBatch idempotent merges)."""
