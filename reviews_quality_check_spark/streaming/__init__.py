"""Structured Streaming variants of the batch checks."""
