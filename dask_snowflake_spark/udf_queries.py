"""UDF-surface queries (SURVEY.md §2.B "UDF surface" row): scalar
Pandas UDF, grouped-agg Pandas UDF, applyInPandas, mapInArrow, and a
Python UDTF — each oracle-checked.

UDFs are the engine's slow path (Arrow-batched, but Python-side); these
queries exist to prove the full surface works and stays deterministic.
Numeric determinism notes:
- grouped reductions use math.fsum on sorted values (correctly-rounded,
  order-independent) so shuffle order can't change the result;
- per-group scaling uses min/max (exact under reordering);
- everything else is integer or single-value arithmetic.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query


@query(
    "udf_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           round(greatest(l_extendedprice * (1 + l_tax), 1000.0), 6) AS taxed_floor
    FROM lineitem
    WHERE l_orderkey < 2000
    ORDER BY l_orderkey, l_linenumber
    """,
    "vectorized scalar Pandas UDF (Arrow-batched): taxed price with a floor",
    ("udf",),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)

    @F.pandas_udf("double")
    def taxed_floor(price: pd.Series, tax: pd.Series) -> pd.Series:
        return (price * (1 + tax)).clip(lower=1000.0)

    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 2000)
        .select(
            "l_orderkey",
            "l_linenumber",
            # round(6) is beyond the values' true 4-decimal precision, so
            # no decimal-halfway cases where engines' rounding diverges
            F.round(taxed_floor("l_extendedprice", "l_tax"), 6).alias("taxed_floor"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "udf_grouped_agg",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity ORDER BY l_extendedprice * l_quantity)
                 / sum(l_quantity ORDER BY l_quantity), 4) AS weighted_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "grouped-aggregate Pandas UDF: order-independent weighted mean via sorted fsum",
    ("udf",),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)

    @F.pandas_udf("double")
    def weighted_price(price: pd.Series, qty: pd.Series) -> float:
        # sorted sequential accumulation — bit-identical to the oracle's
        # sum(x ORDER BY x) regardless of shuffle order
        num = 0.0
        for v in sorted(price * qty):
            num += v
        den = 0.0
        for v in sorted(qty):
            den += v
        return num / den

    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.round(weighted_price("l_extendedprice", "l_quantity"), 4).alias("weighted_price"))
        .orderBy("l_returnflag")
    )


@query(
    "udf_apply_in_pandas",
    """
    SELECT c_custkey, c_nationkey,
           round(CASE WHEN max(c_acctbal) OVER w = min(c_acctbal) OVER w THEN 0.5
                 ELSE (c_acctbal - min(c_acctbal) OVER w)
                      / (max(c_acctbal) OVER w - min(c_acctbal) OVER w) END, 6) AS acctbal_scaled
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey)
    ORDER BY c_custkey
    """,
    "applyInPandas grouped-map: per-nation min-max scaling (exact under reordering)",
    ("udf",),
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
        if hi == lo:
            scaled = pd.Series(0.5, index=pdf.index)
        else:
            scaled = (pdf["c_acctbal"] - lo) / (hi - lo)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "acctbal_scaled": scaled.round(6),
            }
        )

    return (
        t["customer"]
        .groupBy("c_nationkey")
        .applyInPandas(scale, "c_custkey long, c_nationkey int, acctbal_scaled double")
        .orderBy("c_custkey")
    )


@query(
    "udf_map_in_arrow",
    """
    SELECT doc_id, length(text)::BIGINT AS n_chars_py, (doc_id % 16)::BIGINT AS shard
    FROM documents
    ORDER BY doc_id
    """,
    "mapInArrow: per-partition Arrow RecordBatch transform (zero-copy batch access)",
    ("udf",),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)

    def shard(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for rb in batches:
            doc_id = rb.column(rb.schema.get_field_index("doc_id"))
            text = rb.column(rb.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_id,
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.subtract(doc_id, pc.multiply(pc.cast(pc.floor(pc.divide(doc_id, 16)), pa.int64()), 16)),
                ],
                names=["doc_id", "n_chars_py", "shard"],
            )

    return (
        t["documents"]
        .select("doc_id", "text")
        .mapInArrow(shard, "doc_id long, n_chars_py long, shard long")
        .orderBy("doc_id")
    )


@query(
    "udf_table_function",
    """
    WITH n AS (SELECT o_orderkey, floor(o_totalprice / 50000)::BIGINT AS n_chunks FROM orders
               WHERE o_orderkey < 500),
    ex AS (SELECT o_orderkey, n_chunks, unnest(range(n_chunks + 1)) AS chunk FROM n)
    SELECT o_orderkey, chunk::BIGINT AS chunk, (chunk * 50000)::BIGINT AS chunk_floor
    FROM ex
    ORDER BY o_orderkey, chunk
    """,
    "Python UDTF: one row per 50k price chunk of each order (lateral table function)",
    ("udf",),
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)

    @F.udtf(returnType="o_orderkey bigint, chunk bigint, chunk_floor bigint")
    class PriceChunks:
        def eval(self, orderkey: int, totalprice: float):
            for c in range(int(totalprice / 50000) + 1):
                yield orderkey, c, c * 50000

    spark.udtf.register("price_chunks", PriceChunks)
    t["orders"].filter(F.col("o_orderkey") < 500).createOrReplaceTempView("orders_small")
    return spark.sql(
        """
        SELECT pc.o_orderkey, pc.chunk, pc.chunk_floor
        FROM orders_small, LATERAL price_chunks(o_orderkey, o_totalprice) pc
        ORDER BY pc.o_orderkey, pc.chunk
        """
    )
