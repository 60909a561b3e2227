"""Structured-Streaming layer: near-real-time segment appends."""
