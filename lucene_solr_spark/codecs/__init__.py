"""Posting-list codecs (numpy re-expressions of the Lucene90 block formats)."""
