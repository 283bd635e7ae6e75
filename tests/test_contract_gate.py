"""The local contract checker must be at least as strict as the driver's
type-sensitive hash gate.

Round-2 postmortem: DuckDB's ``sum(int) OVER (...)`` returns HUGEINT
(int128) while Spark emits BIGINT; the driver hashes the typed
representation so the row hash differed on type alone, but the local
checker stringified cells and could not see it — the sessionize bug
shipped twice.  These tests pin the canonical-type comparison so that
class of bug fails locally before it ever reaches the driver.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb

_SPEC = importlib.util.spec_from_file_location(
    "check_contract",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "check_contract.py"),
)
check_contract = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(check_contract)

canon_duck = check_contract.canon_duck
canon_spark = check_contract.canon_spark
type_mismatches = check_contract.type_mismatches


def test_duckdb_windowed_int_sum_is_hugeint_and_fails_gate():
    """The exact pre-fix sessionize shape: sum(int) OVER -> HUGEINT != BIGINT."""
    con = duckdb.connect()
    rel = con.sql(
        "SELECT sum(x) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS session_id "
        "FROM (VALUES (1), (0), (1)) t(x)"
    )
    otypes = [str(t) for t in rel.types]
    assert otypes[0].upper() == "HUGEINT"
    mism = type_mismatches(["session_id"], ["bigint"], rel.columns, otypes)
    assert mism, "HUGEINT vs BIGINT must be flagged by the local gate"
    assert "i128" in mism[0] and "i64" in mism[0]


def test_bigint_cast_passes_gate():
    """The post-fix shape: an explicit ::BIGINT cast matches Spark's long."""
    con = duckdb.connect()
    rel = con.sql(
        "SELECT (sum(x) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id "
        "FROM (VALUES (1), (0), (1)) t(x)"
    )
    otypes = [str(t) for t in rel.types]
    assert not type_mismatches(["session_id"], ["bigint"], rel.columns, otypes)


def test_canonical_families():
    # int64-safe widths collapse; hugeint does not.
    assert canon_duck("INTEGER") == canon_duck("BIGINT") == canon_spark("int") == canon_spark("bigint") == "i64"
    assert canon_duck("HUGEINT") == "i128"
    assert canon_duck("HUGEINT") != canon_spark("bigint")
    # float widths do NOT collapse (f32 vs f64 value bytes differ).
    assert canon_duck("FLOAT") != canon_duck("DOUBLE")
    assert canon_spark("float") == canon_duck("REAL")
    # decimal compares on scale, not precision (values are equal across precisions).
    assert canon_duck("DECIMAL(30,2)") == canon_spark("decimal(38,2)")
    assert canon_duck("DECIMAL(30,2)") != canon_spark("decimal(38,3)")
    # nested arrays recurse.
    assert canon_duck("BIGINT[]") == canon_spark("array<bigint>")
    assert canon_duck("HUGEINT[]") != canon_spark("array<bigint>")
    # strings / bools / temporal / binary.
    assert canon_duck("VARCHAR") == canon_spark("string")
    assert canon_duck("BOOLEAN") == canon_spark("boolean")
    assert canon_duck("TIMESTAMP") == canon_spark("timestamp")
    assert canon_duck("TIMESTAMP WITH TIME ZONE") == canon_spark("timestamp_ntz")  # both -> ts family
    assert canon_duck("BLOB") == canon_spark("binary")


def test_mismatch_only_on_shared_columns():
    # Unmatched names are the cols_match check's job, not the type gate's.
    assert type_mismatches(["a"], ["bigint"], ["b"], ["HUGEINT"]) == []
    assert type_mismatches(["a", "b"], ["bigint", "double"], ["B", "a"], ["DOUBLE", "BIGINT"]) == []
