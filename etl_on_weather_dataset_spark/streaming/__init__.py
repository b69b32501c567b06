"""Structured Streaming analogues of the batch operators."""
