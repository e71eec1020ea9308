"""Pure-Python brute-force oracle — the executable spec of Lucene-4.6 scoring."""
