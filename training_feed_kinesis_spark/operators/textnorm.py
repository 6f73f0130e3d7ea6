"""Engine-portable text normalization (round-11 Unicode campaign).

The r11 encoding/Unicode corruption sweep (SURVEY §5.3.10) planted
NFC/NFD splits, zero-width/BOM characters, Unicode whitespace, and
case-folding trigger characters (İ U+0130, ß, final sigma, the fi
ligature, fullwidth letters) in documents/events text columns and found
34 diverging keys + 1 hard error, all reducible to two primitive seams,
verified by direct probe:

  * CASE FOLDING: Spark (Java/ICU full mapping) lowercases İ → i +
    combining dot, uppercases ß → SS and ﬁ → FI, and lowercases final
    sigma context-sensitively (Σ → ς at word end); DuckDB (utf8proc
    1:1 simple mapping) maps İ → i, ß → ẞ, leaves ﬁ, and always emits
    σ. Same bytes in, different bytes out — every md5/token/group key
    built on lower()/upper() of corpus text diverges.
  * TRIM: Spark trim() strips ASCII space only; DuckDB trim() strips
    Unicode whitespace (NBSP, thin space, …).

One semantics, both engines: normalization for hashing/tokenizing is
ASCII CASE FOLD (translate over the 26 ASCII letters — per-codepoint,
locale-independent, byte-identical in both engines, non-ASCII letters
pass through untouched) and ASCII-SPACE TRIM (Spark trim(x) ≡ DuckDB
trim(x, ' ')). This is also the production-sane contract at 100 TB:
full Unicode case folding is locale- and library-version-dependent
(the exact portability failure the sweep reproduced), so cross-engine
dedup keys must not depend on it. Consumers needing linguistic folding
own that choice explicitly (and rows-only checks).

On the pure-ASCII clean fixtures (verified at every sf) the fold is
byte-identical to lower(), so adopting it changed no clean-dir hash.
"""

from __future__ import annotations

_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LO = "abcdefghijklmnopqrstuvwxyz"


def fold(expr: str) -> str:
    """ASCII case fold of a string expression — identical text in Spark
    SQL and DuckDB SQL (both have per-codepoint translate)."""
    return f"translate({expr}, '{_UP}', '{_LO}')"


FOLD_TEXT = fold("text")

# ASCII-space-only trim: Spark trim(x) already is; DuckDB needs the
# explicit character set (its default trim strips Unicode whitespace).
TRIM_TEXT_SPARK = "trim(text)"
TRIM_TEXT_DUCK = "trim(text, ' ')"
