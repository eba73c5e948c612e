"""Structured-streaming layer: decode pipeline, windowed aggregation,
stateful current-value, sinks, and per-interval query orchestration.
"""
