"""Structured Streaming surface: stateful incremental RSI updates."""
