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


# strict finite decimal — the only strings allowed to reach a DOUBLE cast.
# Excludes (probe-verified divergences, round 6):
#   '1_000'  — DuckDB TRY_CAST accepts underscore separators, Spark NULLs
#   'NaN'/'Infinity'/'inf' — both engines cast these to non-finite doubles,
#     which then diverge downstream (NaN group keys, ROUND(NaN), hashing)
#   '+5', ' 5 ', '5.', '.5' — accepted by both casts but kept out so the
#     gate itself, not engine trim/sign lenience, defines the domain
# Strings that pass are parsed identically (correctly-rounded decimal →
# binary in both engines). DuckDB's JSON number re-rendering
# ('1e3'→'1000.0', big ints → '...0.0') also passes and casts to the
# same double Spark gets from the raw token.
DOUBLE_RE = "^-?[0-9]+(\\.[0-9]+)?([eE][-+]?[0-9]+)?$"


def duck_json_double(col: str, path: str) -> str:
    """DuckDB spelling: json_valid-guarded extraction, finite-decimal
    regex gated, TRY_CAST AS DOUBLE. Unquoted NaN/Infinity (valid JSON to
    DuckDB, extraction-NULL on Spark) fail the regex → NULL both sides."""
    x = (
        f"CASE WHEN json_valid({col}) THEN"
        f" json_extract_string({col}, '{path}') END"
    )
    return (
        f"CASE WHEN regexp_matches({x}, '{DOUBLE_RE}')"
        f" THEN TRY_CAST({x} AS DOUBLE) END"
    )


def spark_json_double(col: str, path: str) -> Column:
    """Spark spelling of the same semantics."""
    s = F.get_json_object(col, path)
    return F.when(s.rlike(DOUBLE_RE), s.try_cast("double"))


# A scalar is passed through as TEXT only when it is unambiguously
# stringy. The engines disagree on the extracted text of non-string
# scalars (probe-verified: unquoted NaN → 'NaN' on DuckDB, NULL on
# Spark; {"k": 100000000000000000000} → '...000.0' on DuckDB, raw
# '...000' on Spark), and a string-typed gate cannot be spelled on the
# Spark side (get_json_object unquotes, erasing the type). So the gate
# runs on the extracted TEXT, identically on both engines: anything that
# could be a number/bool/object/array render is NULL. Quoted numerals
# ('{"k": "3.9"}') are deliberately swallowed — consumers wanting them
# use the int/double spellings, which treat quoted and bare numerals
# alike by the same token-level construction.
NONSTRINGY_RE = "(^[-+.0-9{\\[])|(^(true|false|NaN|Infinity)$)"


def duck_json_string(col: str, path: str) -> str:
    """DuckDB spelling: json_valid-guarded extraction of unambiguously
    string-looking scalars; NULL for anything number/bool/struct-ish."""
    x = (
        f"CASE WHEN json_valid({col}) THEN"
        f" json_extract_string({col}, '{path}') END"
    )
    return (
        f"CASE WHEN NOT regexp_matches({x}, '{NONSTRINGY_RE}')"
        f" THEN {x} END"
    )


def spark_json_string(col: str, path: str) -> Column:
    """Spark spelling of the same semantics (NOT rlike is NULL-safe here:
    a NULL extraction fails the WHEN either way)."""
    s = F.get_json_object(col, path)
    return F.when(~s.rlike(NONSTRINGY_RE), s)
