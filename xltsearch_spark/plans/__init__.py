"""Query parsing and logical planning (classic Lucene QueryParser grammar)."""
