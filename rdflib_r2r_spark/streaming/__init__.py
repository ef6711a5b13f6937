"""Structured Streaming surface. The reference is purely request/response
(no streaming of any kind — SURVEY.md §2.C); these operators extend the
engine to continuous KG construction: streaming page ingest -> triple
emission, and watermarked windowed aggregation over event streams."""
