"""Composite relational operators: similarity search, multimodal
feature extraction, dedup helpers. Each is a DataFrame → DataFrame
transformation usable in batch or inside foreachBatch.
"""
