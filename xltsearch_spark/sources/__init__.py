"""Corpus sources: deterministic fixture generator + table loaders."""
