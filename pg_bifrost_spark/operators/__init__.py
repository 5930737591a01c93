"""Analytics operators a large-scale training-data pipeline needs:
deduplication, similarity search, text analysis, multimodal plumbing.
All partition-parallel; no driver-side collects."""
