"""Engine operators beyond plain DataFrame verbs: ordered aggregation,
dedup families, similarity search, text analysis, multimodal plumbing."""
