"""Column-function libraries: S7 address parsing, S7 type decode,
text analysis, and vector math. All JVM-side Catalyst expressions
unless a pandas-UDF variant is explicitly requested (B30 cross-check).
"""
