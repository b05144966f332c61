"""Distributed operators: extraction UDFs, dedup family, similarity
search, and text analytics (SURVEY.md §2 + training-data ops)."""
