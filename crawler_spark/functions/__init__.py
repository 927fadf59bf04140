"""Vectorized per-row compute: the four UDF families of SURVEY.md §2.10."""
