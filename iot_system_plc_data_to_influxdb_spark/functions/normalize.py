"""Unicode NFC text normalization (B21u / B30 pandas-UDF surface).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pyspark resolves pandas_udf type hints from the live annotation
objects, and the future import would turn them into unresolvable
strings (the reason this UDF does not live in functions/text.py).
"""

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F

_CTL = re.compile("[\x01-\x08\x0b\x0c\x0e-\x1f\x7f]")
# EXPLICIT ASCII whitespace class: Python's \s is Unicode-aware while
# RE2's (the DuckDB oracle) is not — the cross-engine trap this pins
_WS = re.compile("[ \t\n\f\r]+")


@F.pandas_udf("string")
def nfc_clean(s: pd.Series) -> pd.Series:
    """NFC-normalize, strip C0 controls + DEL, collapse ASCII
    whitespace runs, trim. Arrow-batched; stateless per row."""
    return s.map(
        lambda x: None if x is None else _WS.sub(
            " ", _CTL.sub("", unicodedata.normalize("NFC", x))
        ).strip()
    )
