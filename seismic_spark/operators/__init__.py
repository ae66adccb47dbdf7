"""Training-data pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing — first-class alongside the index engine."""
