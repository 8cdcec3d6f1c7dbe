"""Training-data pipeline extension queries (SURVEY.md §2.12 X1-X5):
dedup, similarity search, text analysis, multimodal plumbing, log mining.

Filled in incrementally; see dedup.py / similarity.py / multimodal.py for
the operator implementations.
"""
