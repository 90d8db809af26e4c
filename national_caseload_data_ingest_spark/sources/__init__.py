"""Ingest-surface sources: NCD zip archives, fixed-width text, stacked
global/lookup tables, and the DOJ listing scraper (SURVEY.md §2.1)."""
