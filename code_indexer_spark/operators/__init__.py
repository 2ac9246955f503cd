"""Spark DataFrame / Arrow-UDF operator implementations (SURVEY.md §2)."""
