"""Scalar/array function library — cross-engine deterministic primitives.

Everything here is built from `pyspark.sql.functions` only (JVM-side,
whole-stage-codegen'd); no Python UDFs. Each primitive has an exact
ANSI-SQL twin runnable by DuckDB so results are oracle-checkable
bit-for-bit (see __spark_entry__.oracle_sql)."""

from . import hashing, text, vectors  # noqa: F401
