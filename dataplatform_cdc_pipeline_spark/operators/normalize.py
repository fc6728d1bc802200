"""Unicode text normalization — the first step of every text-curation
pipeline (CCNet/C4-style preprocessing), kept engine-exact.

Three layers, each independently usable:

- ``nfc_normalize_udf``: NFC canonical composition via the stdlib
  ``unicodedata`` in an Arrow-batched pandas UDF (no external deps; NFC
  rather than NFKC because the DuckDB oracle side has ``nfc_normalize``
  — the two engines must compute the SAME function or nothing is
  verifiable. NFKC's compatibility folding is a superset a production
  pipeline can layer on top; documented absence, not an oversight).
- ``collapse_whitespace_expr`` / ``strip_controls_expr``: pure-Column
  regexes (JVM-side, scan speed) for the ASCII-hygiene half.
- ``normalize_text``: the composed column — controls stripped, NFC
  composed, whitespace collapsed, trimmed.

Why a UDF at all (the repo's UDF bar is high): Spark has NO built-in
Unicode normalization expression — this is the documented genuine gap
where Python is unavoidable, and it is Arrow-batched, not per-row.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def nfc_normalize_udf(s: pd.Series) -> pd.Series:
    return s.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


def strip_controls_expr(c: Column) -> Column:
    """Remove C0/C1 control characters except tab/newline (kept —
    they're whitespace, handled next)."""
    return F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]", "")


def collapse_whitespace_expr(c: Column) -> Column:
    """Any whitespace run → one space; leading/trailing trimmed."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalize_text(c: Column) -> Column:
    """controls → NFC → whitespace: the canonical cleaning order (NFC
    before whitespace collapse so composed characters never straddle a
    collapsed boundary)."""
    return collapse_whitespace_expr(nfc_normalize_udf(strip_controls_expr(c)))
