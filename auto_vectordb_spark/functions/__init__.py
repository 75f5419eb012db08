"""Scalar/vector column functions (reference §2.8 F1–F12, V-family support)."""
