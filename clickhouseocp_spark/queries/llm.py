"""LLM-data-pipeline operators (dedup, similarity, text analysis) — populated
incrementally; see operators/ and functions/ for implementations."""
