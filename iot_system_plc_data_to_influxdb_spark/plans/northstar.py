"""North-star extensions — SURVEY.md §2 B19–B22: dedup, similarity
search, text analysis, multimodal columns. Filled in incrementally.
"""

from __future__ import annotations
