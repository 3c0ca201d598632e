"""Structured Streaming surface (batch reference is streaming-free)."""
