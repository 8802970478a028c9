"""ClickHouse-flavored composite operators (SURVEY.md §2 'composite' rows) —
populated incrementally; see operators/ for the reusable implementations."""
