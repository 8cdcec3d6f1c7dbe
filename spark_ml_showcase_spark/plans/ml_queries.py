"""MLlib-surface queries (SURVEY.md §2.11) — rows-only checks (seeded fits;
not SQL-expressible). Filled in incrementally; see ml/ for implementations.
"""
