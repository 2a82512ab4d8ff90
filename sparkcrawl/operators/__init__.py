"""Relational operators of the crawl engine (SURVEY §2)."""
