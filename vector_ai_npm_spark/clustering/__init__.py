"""Embedding-space clustering + semantic dedup (SemDeDup-style)."""
