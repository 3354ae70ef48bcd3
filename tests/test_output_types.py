"""Driver-facing output-type guards.

The driver's value hash round-trips results through pandas/Arrow, where
some logical types canonicalize differently per engine even when values
are identical. Raw DECIMAL is the proven-fatal one (r2 q20: Spark keeps
Decimal objects, DuckDB's .df() lowers to float64 — rows+schema matched,
hash didn't). Rule (CLAUDE.md): no raw DECIMAL in any driver-facing
output — cast through STRING/VARCHAR on both sides.

Schema-only check: builds each query's DataFrame (analysis, no
execution for the relational surface) and walks the output types.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dask_snowflake_spark.queries import registry


def _contains_decimal(dtype: T.DataType) -> bool:
    if isinstance(dtype, T.DecimalType):
        return True
    if isinstance(dtype, T.ArrayType):
        return _contains_decimal(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return _contains_decimal(dtype.keyType) or _contains_decimal(dtype.valueType)
    if isinstance(dtype, T.StructType):
        return any(_contains_decimal(f.dataType) for f in dtype.fields)
    return False


# Streaming / connector / iterative queries execute work at build time;
# the relational ones analyze lazily. Run the full registry anyway at
# the smallest SF — the whole sweep is schema-driven and cheap.
@pytest.mark.parametrize("name", sorted(registry()))
def test_no_raw_decimal_output(spark, sf_smoke, name) -> None:
    qd = registry()[name]
    df = qd.spark_fn(spark, sf_smoke)
    offenders = [f.name for f in df.schema.fields if _contains_decimal(f.dataType)]
    assert not offenders, (
        f"{name} exposes raw DECIMAL column(s) {offenders} to the driver hash — "
        "cast through string on both engine and oracle sides (CLAUDE.md rule)"
    )
