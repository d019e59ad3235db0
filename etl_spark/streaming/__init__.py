"""Structured Streaming variants of the event queries."""
