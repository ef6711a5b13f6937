"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) — first-class components alongside the SURVEY.md §2
relational inventory."""
