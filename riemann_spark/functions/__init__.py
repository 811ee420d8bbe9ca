"""Training-data-pipeline functions: text analysis, dedup, similarity,
multimodal plumbing (BASELINE.json north-star extras)."""
