"""Reusable operator implementations (dedup, similarity, text stats,
sessionization, multimodal plumbing) — the north-star LLM-data-pipeline
surface (SURVEY.md §2.3) plus pipeline operators."""
