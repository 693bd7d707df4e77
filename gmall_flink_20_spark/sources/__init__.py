"""Source connectors and generators (SURVEY.md §2.1, S1-S4)."""
