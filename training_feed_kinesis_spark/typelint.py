"""DuckDB-vs-Spark *pandas-effective* type classification (SURVEY §5.3 rule 8).

The driver's correctness hash compares serialized cell representations after
both engines' results pass through pandas. Numerically-identical values can
therefore hash-differ when their pandas dtypes differ — the recurring
artifact class (agg_boolean r1; fn_math, llm_lang_profile r2) is DuckDB
widening integer aggregates to HUGEINT (or FLOOR/CEIL returning
DOUBLE/DECIMAL), all of which ``fetchdf()`` renders as float64, while Spark
returns BIGINT → int64 → ``4`` vs ``4.0``.

This module classifies both engines' column types into the classes pandas
actually produces, so a lint can bind every registered oracle
(``duckdb.sql(...).types`` — no execution) against every Spark plan's schema
(lazy — no execution) and flag representation mismatches before the driver's
sampled hash check ever sees them.

Classes: int, float, bool, str, ts, date(spark-only), binary, decimal
(spark-only: toPandas yields object Decimal; duckdb DECIMAL fetchdf()s to
float64 and is classed float), array<elem>, map, struct.
"""

from __future__ import annotations

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
# HUGEINT and DECIMAL fetchdf() to float64 — the exact artifact class.
_DUCK_FLOAT = {"FLOAT", "REAL", "DOUBLE", "HUGEINT", "UHUGEINT"}


def duck_class(t: str) -> object:
    """Pandas-effective class of a DuckDB type string (from ``rel.types``)."""
    s = str(t).strip()
    u = s.upper()
    if u.endswith("[]"):
        return ("array", duck_class(s[:-2]))
    if u.startswith("DECIMAL"):
        return "float"  # duckdb DECIMAL -> pandas float64
    if u.startswith("STRUCT"):
        return "struct"
    if u.startswith("MAP"):
        return "map"
    if u in _DUCK_INT:
        return "int"
    if u in _DUCK_FLOAT:
        return "float"
    if u == "BOOLEAN":
        return "bool"
    if u in {"VARCHAR", "UUID"}:
        return "str"
    if u == "DATE":
        # duckdb DATE fetchdf()s to pandas datetime64 — same representation
        # as a midnight TIMESTAMP (fn_date passed the driver with
        # spark=timestamp vs duck=DATE), so it is ts-class.
        return "ts"
    if u.startswith("TIMESTAMP"):
        return "ts"
    if u in {"BLOB", "BYTEA"}:
        return "binary"
    if u.startswith("INTERVAL"):
        return "interval"
    return ("other", u)


def spark_class(dt) -> object:
    """Pandas-effective class of a Spark ``DataType``."""
    return _spark_class_str(dt.simpleString())


def _spark_class_str(s: str) -> object:
    if s.startswith("array<"):
        return ("array", _spark_class_str(s[6:-1]))
    if s.startswith("decimal"):
        # spark toPandas -> object Decimal, which serializes unlike duckdb's
        # float64 — NEVER pair a spark decimal output with a duckdb oracle.
        return "decimal"
    if s.startswith("struct"):
        return "struct"
    if s.startswith("map"):
        return "map"
    if s in {"tinyint", "smallint", "int", "bigint", "byte", "short", "long",
             "integer"}:
        return "int"
    if s in {"float", "double"}:
        return "float"
    if s == "boolean":
        return "bool"
    if s in {"string", "varchar"}:
        return "str"
    if s == "date":
        # spark DATE toPandas()s to object datetime.date ("2024-01-01"),
        # unlike duckdb DATE (datetime64 midnight) — distinct class, flagged.
        return "date"
    if s.startswith("timestamp"):
        return "ts"
    if s == "binary":
        return "binary"
    return ("other", s)


def classes_compatible(spark_cls, duck_cls) -> bool:
    """Struct/map compared loosely (their serialized forms normalize through
    dict/tuple canonicalization); everything else must match exactly."""
    if (isinstance(spark_cls, tuple) and spark_cls[0] == "array"
            and isinstance(duck_cls, tuple) and duck_cls[0] == "array"):
        return classes_compatible(spark_cls[1], duck_cls[1])
    return spark_cls == duck_cls


def lint_registry(spark, con, registry, sf_dir, keys=None, frames=None):
    """Lint every oracled key; returns (n_checked, mismatches, errors).

    Binds oracles (no execution) and builds Spark plans — lazy for almost
    every key, but NOT all: a handful of operators execute work inside
    ``spec.fn`` itself (``stream_quarantine_split`` drains a full
    availableNow streaming job and writes its parquet sinks;
    ``graph_bfs_distance`` triggers per-round ``localCheckpoint`` jobs;
    other streaming keys replay micro-batches to materialize a batch
    result). A registry-wide lint therefore does real Spark work and
    leaves scratch artifacts for those keys — still linted on purpose,
    since their output types are exactly as mismatch-prone as the lazy
    ones. A mismatch line names the key and column with both classes.
    """
    bad: list[str] = []
    errs: list[str] = []
    n_checked = 0
    for key, spec in registry.items():
        if spec.oracle is None or (keys and key not in keys):
            continue
        try:
            rel = con.sql(spec.oracle)
            duck_cols = dict(zip(rel.columns, [duck_class(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            errs.append(f"{key}: oracle bind failed: {e}")
            continue
        try:
            # `frames` (r13): pre-built, already-analyzed plans shared
            # across the registry-wide test sweeps — the fn() call per
            # key (a full replay drain for streaming keys) was the 200 s
            # bulk of this lint, paid again by every other sweep.
            if frames is not None and key in frames:
                df, f_err = frames[key]
                if f_err is not None:
                    raise f_err
            else:
                df = spec.fn(spark, sf_dir)
            sp_cols = {f.name: spark_class(f.dataType) for f in df.schema.fields}
        except Exception as e:  # noqa: BLE001
            errs.append(f"{key}: spark plan build failed: {e}")
            continue
        n_checked += 1
        if set(sp_cols) != set(duck_cols):
            bad.append(
                f"{key}: column sets differ: "
                f"spark-only={sorted(set(sp_cols) - set(duck_cols))} "
                f"duck-only={sorted(set(duck_cols) - set(sp_cols))}"
            )
            continue
        for c in sorted(sp_cols):
            if not classes_compatible(sp_cols[c], duck_cols[c]):
                bad.append(f"{key}.{c}: spark={sp_cols[c]} duck={duck_cols[c]}")
    return n_checked, bad, errs
