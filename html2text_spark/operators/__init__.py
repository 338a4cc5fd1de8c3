"""Corpus-scale operators for training-data pipelines: deduplication,
similarity search, text analysis, multimodal plumbing."""
