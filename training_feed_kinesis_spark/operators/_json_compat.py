"""Cross-engine JSON payload extraction, spelled ONCE.

Three empirically-verified divergence classes force every props-style
extraction through the same gated spelling on both engines
(tests/test_null_injection.py replays all three):

1. Invalid JSON: DuckDB's json_* functions raise a hard error while
   Spark's get_json_object returns NULL — the oracle must guard with
   json_valid().
2. Non-integral numerals: DuckDB TRY_CAST('3.9' AS INT) ROUNDS to 4 and
   TRY_CAST('1e3' AS INT) = 1000, while Spark try_cast yields NULL for
   both — so the cast may only run on strings that match an integer
   regex; everything else is NULL on both engines by construction.
3. Plain CAST of garbage errors on both engines (differently) under
   ANSI — hence try_cast/TRY_CAST inside the gate (also catches
   overflow: both engines NULL a 10⁺-digit INT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# strict integer text — the only strings allowed to reach the cast
INT_RE = "^-?[0-9]+$"


def duck_json_int(col: str, path: str, typ: str = "INT") -> str:
    """DuckDB spelling: json_valid-guarded extraction, integer-regex
    gated, TRY_CAST to ``typ``."""
    x = (
        f"CASE WHEN json_valid({col}) THEN"
        f" json_extract_string({col}, '{path}') END"
    )
    return (
        f"CASE WHEN regexp_matches({x}, '{INT_RE}')"
        f" THEN TRY_CAST({x} AS {typ}) END"
    )


def spark_json_int(col: str, path: str, typ: str = "int") -> Column:
    """Spark spelling of the same semantics (get_json_object is already
    NULL on invalid JSON; the regex gate rejects non-integral numerals
    that DuckDB's TRY_CAST would round)."""
    s = F.get_json_object(col, path)
    return F.when(s.rlike(INT_RE), s.try_cast(typ))
