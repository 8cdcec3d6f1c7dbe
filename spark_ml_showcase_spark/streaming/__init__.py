"""Structured Streaming surface (SURVEY.md §2.10 / build-plan M5 tail):
streaming event-time aggregation with watermarks and custom stateful
processing. See ``events.py``."""
