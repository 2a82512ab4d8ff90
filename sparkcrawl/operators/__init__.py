"""Relational operators of the crawl engine (SURVEY §2)."""

from sparkcrawl.operators._caching import release_caches, tracked_persist

__all__ = ["release_caches", "tracked_persist"]
