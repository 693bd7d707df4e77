"""Operator library — each module maps a family from SURVEY.md §2."""
