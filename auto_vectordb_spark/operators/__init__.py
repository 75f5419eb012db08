"""Engine operators: relational surface, retrieval (BM25/kNN/hybrid), dedup,
text analytics, multimodal plumbing."""
