"""Guard the driver's type-sensitive value hash without spinning up Spark.

Round-2 lesson: the driver hashed q12/q13/q33 red although values were
byte-identical, because DuckDB's sum() over integers widens to HUGEINT
(int128) while Spark emits BIGINT.  This test runs every oracle_sql()
through DuckDB alone (sf0.001, sub-second) and asserts no result column
maps to a type family Spark cannot emit (int128 / unsigned) — the local
tripwire for the exact failure the driver gate caught twice.
"""

import duckdb
import pytest

from tests.oracle_harness import TABLES, _duck_type_family, _spark_type_family

SF_DIR = "/root/testdata/sf0.001"

# type families Spark never produces — any oracle column landing here will
# hash-mismatch against the Spark result even when values are identical
NON_SPARK_FAMILIES = {"int128", "uint64", "uint32"}


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_duck_type_family_flags_hugeint():
    assert _duck_type_family("HUGEINT") == "int128"
    assert _duck_type_family("BIGINT") == "int64"
    assert _duck_type_family("HUGEINT") != _duck_type_family("BIGINT")


def test_duck_type_family_mappings():
    assert _duck_type_family("DOUBLE[]") == "list<float64>"
    assert _duck_type_family("DECIMAL(18,2)") == "decimal"
    assert _duck_type_family("TIMESTAMP WITH TIME ZONE") == "timestamp"
    assert _duck_type_family("VARCHAR") == "string"


def test_spark_type_family_mappings():
    from pyspark.sql import types as T

    assert _spark_type_family(T.LongType()) == "int64"
    assert _spark_type_family(T.ArrayType(T.DoubleType())) == "list<float64>"
    assert _spark_type_family(T.TimestampNTZType()) == "timestamp"


def test_bare_integer_sum_is_flagged():
    """The pre-fix q12 shape — sum() over BIGINT without a cast — must map
    to a non-Spark family, proving strict mode would have gone red."""
    con = duckdb.connect()
    rel = con.sql("SELECT sum(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)")
    fam = _duck_type_family(str(rel.types[0]))
    assert fam in NON_SPARK_FAMILIES


def test_no_oracle_emits_non_spark_integer_types():
    import __spark_entry__ as entrymod

    con = _con()
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            rel = con.sql(sql)
        except Exception as e:  # pragma: no cover - surfaced as failure below
            bad[name] = f"duckdb error: {e}"
            continue
        fams = {c: _duck_type_family(str(t)) for c, t in zip(rel.columns, rel.types)}
        hits = {c: f for c, f in fams.items() if f in NON_SPARK_FAMILIES}
        if hits:
            bad[name] = hits
    assert not bad, f"oracle columns with Spark-inexpressible types: {bad}"


def test_duck_struct_family_expands_fields():
    got = _duck_type_family("STRUCT(a BIGINT, b VARCHAR)")
    assert got == "struct<a:int64,b:string>"
    nested = _duck_type_family('STRUCT(x STRUCT(y DOUBLE), z BIGINT[])')
    assert nested == "struct<x:struct<y:float64>,z:list<int64>>"


def test_struct_families_symmetric_across_engines():
    from pyspark.sql import types as T

    spark_side = _spark_type_family(T.StructType([
        T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]))
    duck_side = _duck_type_family("STRUCT(a BIGINT, b VARCHAR)")
    assert spark_side == duck_side
