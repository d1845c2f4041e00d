"""Category J — UDF / UDAF / UDTF surface (SURVEY.md §2.J).

Idioms follow the public pandas-UDF patterns (SNIPPETS.md): Arrow-batched
Series→Series scalar UDFs, grouped-agg pandas UDFs, applyInPandas grouped
maps, mapInPandas partition transforms, and a Spark-4 Python UDTF. Each has
a pure-SQL oracle computing the same math.

Scale posture: every Python crossing is Arrow-vectorized (no row-at-a-time
py4j except the deliberately-row-wise `udf_python_scalar`, which exists to
demonstrate the slow path the engine otherwise avoids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf, udtf

from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load


@register(
    "udf_python_scalar",
    "J",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE
                   WHEN l_discount = 0 THEN 'none'
                   WHEN l_discount < 0.05 THEN 'low'
                   ELSE 'high'
               END AS discount_band
        FROM lineitem
    """,
    doc="Row-at-a-time Python UDF (the deliberately-slow path).",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    def band(d: float) -> str:
        if d == 0:
            return "none"
        return "low" if d < 0.05 else "high"

    band_udf = F.udf(band, T.StringType())
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", band_udf("l_discount").alias("discount_band")
    )


@register(
    "udf_pandas_scalar",
    "J",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 + l_tax) AS gross_price
        FROM lineitem
    """,
    doc="Vectorized (Arrow) scalar pandas UDF — Series in, Series out.",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf(T.DoubleType())
    def gross(price: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 + tax)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        gross("l_extendedprice", "l_tax").alias("gross_price"),
    )


@register(
    "udf_pandas_grouped_agg",
    "J",
    oracle="""
        SELECT event_type, ROUND(AVG(value), 4) AS mean_value
        FROM events
        GROUP BY event_type
    """,
    doc="Grouped-agg pandas UDF (UDAF): per-group mean, rounded 4.",
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf(T.DoubleType())
    def mean_udaf(v: pd.Series) -> float:
        return float(v.mean())

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(mean_udaf("value"), 4).alias("mean_value")
    )


@register(
    "udf_grouped_map",
    "J",
    oracle="""
        SELECT event_id, event_type,
               ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                     / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 4) AS zscore
        FROM events
    """,
    doc="applyInPandas grouped map: z-score normalize per event_type.",
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = ((v - v.mean()) / v.std(ddof=1)).round(4)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "zscore": z}
        )

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").applyInPandas(zscore, out_schema)


@register(
    "udtf_python",
    "J",
    oracle="""
        SELECT p_partkey,
               UNNEST(list_transform(
                   generate_series(1, length(p_name) - 2),
                   i -> substr(p_name, i, 3))) AS gram
        FROM part
        WHERE length(p_name) >= 3
    """,
    doc="Python UDTF (Spark 4): explode character 3-grams of part names.",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    @udtf(returnType="p_partkey: long, gram: string")
    class CharTrigrams:
        def eval(self, partkey: int, name: str):
            if name is None:
                return
            for i in range(len(name) - 2):
                yield partkey, name[i : i + 3]

    spark.udtf.register("char_trigrams", CharTrigrams)
    p = load(spark, sf_dir, "part").filter(F.length("p_name") >= 3)
    p.createOrReplaceTempView("part_names_v")
    return spark.sql(
        """
        SELECT g.p_partkey, g.gram
        FROM part_names_v,
             LATERAL char_trigrams(p_partkey, p_name) AS g
        """
    )


@register(
    "udf_arrow_map",
    "J",
    oracle="""
        SELECT event_id, user_id, value * 2 AS doubled
        FROM events
        WHERE event_type = 'purchase'
    """,
    doc="mapInPandas whole-partition transform (filter + project in Python).",
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("doubled", T.DoubleType()),
        ]
    )

    def transform(batches):
        for pdf in batches:
            sel = pdf[pdf["event_type"] == "purchase"]
            yield pd.DataFrame(
                {
                    "event_id": sel["event_id"],
                    "user_id": sel["user_id"],
                    "doubled": sel["value"] * 2,
                }
            )

    ev = load(spark, sf_dir, "events")
    return ev.mapInPandas(transform, out_schema)


@register(
    "udf_arrow_iter",
    "J",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE)
                   AS net_price
        FROM lineitem
        WHERE l_quantity >= 30
    """,
    doc=(
        "mapInArrow whole-partition transform: pyarrow RecordBatch in / "
        "RecordBatch out — zero pandas materialization, the cheapest "
        "Python hop Spark offers. Filter + compute via pyarrow.compute "
        "kernels (vectorized C++), per-batch not per-row."
    ),
)
def udf_arrow_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    out_schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("net_price", T.DoubleType()),
        ]
    )

    def transform(batches):
        for batch in batches:
            mask = pc.greater_equal(batch.column("l_quantity"), 30)
            sel = batch.filter(mask)
            raw = pc.multiply(
                sel.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), sel.column("l_discount")),
            )
            # Fixed-point discipline (plans/determinism.py): the product of
            # 2-decimal price and 2-decimal discount is an exact 4-decimal
            # value, so floor(x*1e4+0.5)/1e4 == the DECIMAL(18,4) cast
            # bit-for-bit (2-decimal rounding would sit ON .005 boundaries).
            net = pc.divide(
                pc.floor(pc.add(pc.multiply(raw, pa.scalar(1e4)), pa.scalar(0.5))),
                pa.scalar(1e4),
            )
            yield pa.RecordBatch.from_arrays(
                [sel.column("l_orderkey"), sel.column("l_linenumber"), net],
                names=["l_orderkey", "l_linenumber", "net_price"],
            )

    li = load(spark, sf_dir, "lineitem")
    return li.mapInArrow(transform, out_schema)


@register(
    "udf_pandas_iter",
    "J",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS price_cents
        FROM orders
    """,
    doc=(
        "Iterator-of-Series pandas UDF (SCALAR_ITER eval type): one "
        "generator per Python worker, so per-task setup (model load, "
        "dictionary build) runs ONCE per partition instead of per batch — "
        "the pattern for amortizing expensive init at 100 TB. Math is the "
        "exact cents discipline, matching the DECIMAL oracle."
    ),
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    def _to_cents(batches):
        # Per-task init would run here, once, before the batch loop.
        scale = 100.0
        for s in batches:
            yield np.floor(s * scale + 0.5).astype("int64")

    # `from __future__ import annotations` stringifies inline hints, which
    # defeats pandas_udf's eval-type inference — attach real type objects.
    _to_cents.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    to_cents = pandas_udf(T.LongType())(_to_cents)

    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", to_cents(F.col("o_totalprice")).alias("price_cents")
    )


@register(
    "udtf_analyze",
    "J",
    oracle="""
        SELECT p_partkey,
               substr(p_name, 1, 4) AS c0,
               substr(p_name, 5, 4) AS c1,
               substr(p_name, 9, 4) AS c2
        FROM part
    """,
    doc=(
        "Polymorphic Python UDTF (Spark 4): the output schema is computed "
        "at plan time by a static analyze() from the literal n_cols "
        "argument — call it with 3 and the UDTF emits columns c0..c2, "
        "with 5 it would emit c0..c4, no code change. The oracle "
        "replicates the 3-column fixed-width slicing with substr."
    ),
)
def udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SliceName:
        @staticmethod
        def analyze(name: AnalyzeArgument, n_cols: AnalyzeArgument) -> AnalyzeResult:
            n = n_cols.value
            return AnalyzeResult(
                schema=T.StructType(
                    [T.StructField(f"c{i}", T.StringType()) for i in range(n)]
                )
            )

        def eval(self, name: str, n_cols: int):
            if name is None:
                yield tuple("" for _ in range(n_cols))
                return
            yield tuple(name[4 * i : 4 * i + 4] for i in range(n_cols))

    spark.udtf.register("slice_name", SliceName)
    p = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    p.createOrReplaceTempView("part_slice_v")
    return spark.sql(
        """
        SELECT v.p_partkey, s.c0, s.c1, s.c2
        FROM part_slice_v v, LATERAL slice_name(p_name, 3) AS s
        """
    )


@register(
    "udf_pandas_window",
    "J",
    oracle="""
        WITH c AS (
            SELECT user_id, ts, event_id,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
            FROM events
        ),
        w AS (
            SELECT user_id, event_id,
                   COUNT(*) OVER win AS n,
                   SUM(vc) OVER win AS s,
                   MAX(vc) OVER win AS mx,
                   MIN(vc) OVER win AS mn
            FROM c
            WINDOW win AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, event_id,
               ROUND(CASE WHEN n >= 3
                          THEN CAST(s - mx - mn AS DOUBLE) / (100.0 * (n - 2))
                          ELSE CAST(s AS DOUBLE) / (100.0 * n) END, 6)
                   AS trimmed_mean
        FROM w
    """,
    doc=(
        "Pandas UDF as a BOUNDED-WINDOW aggregate (the fourth pandas-UDF "
        "execution mode besides scalar/grouped-agg/grouped-map): a "
        "trailing-5-row trimmed mean per user — drop the frame's min and "
        "max, average the rest (the robust rolling smoother dashboards "
        "use for spiky metrics). Spark ships each bounded frame to the "
        "UDF as an Arrow-batched Series slice; parallelism = users, one "
        "shuffle. Determinism: the UDF re-derives exact integer cents "
        "from the doubles (np.floor(v*100+0.5), all < 2^53 so the "
        "float ops are exact) and performs ONE division — the oracle "
        "computes the identical arithmetic from integer window "
        "accumulators, so the hash matches despite the Python boundary. "
        "Frames shorter than 3 fall back to the plain mean."
    ),
)
def udf_pandas_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    @pandas_udf(T.DoubleType())
    def trimmed(v: pd.Series) -> float:
        c = np.floor(v.to_numpy() * 100.0 + 0.5)
        n = len(c)
        if n >= 3:
            return round(float((c.sum() - c.max() - c.min()) / (100.0 * (n - 2))), 6)
        return round(float(c.sum() / (100.0 * n)), 6)

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id", trimmed("value").over(w).alias("trimmed_mean")
    )


@register(
    "udtf_table_arg",
    "J",
    oracle="""
        WITH f AS (
            SELECT user_id, event_type AS first_type FROM events
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts, event_id) = 1
        ),
        l AS (
            SELECT user_id, event_type AS last_type FROM events
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        ),
        a AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(FLOOR(epoch(MAX(ts)) - epoch(MIN(ts))) AS BIGINT)
                       AS span_s
            FROM events GROUP BY user_id
        )
        SELECT a.user_id, a.n_events, f.first_type, l.last_type, a.span_s
        FROM a JOIN f USING (user_id) JOIN l USING (user_id)
    """,
    doc=(
        "Python UDTF with a TABLE argument (Spark 4: polymorphic "
        "table-valued function over `TABLE(v) PARTITION BY ... ORDER "
        "BY ...`): one partition of rows streams through eval() in the "
        "declared order and terminate() emits a per-user journey summary "
        "(count, first/last event type, time span). This is the "
        "MATCH_RECOGNIZE-shaped API surface — arbitrary per-entity "
        "sequence logic with engine-managed partitioning — and the "
        "engine guarantees the ORDER BY, so first/last are total-order "
        "deterministic (event_id tiebreak). Parallelism = users; the "
        "oracle re-derives the same summary relationally. The state per "
        "partition is O(1) — the streaming shape that scales to any "
        "partition length."
    ),
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf as _udtf

    @_udtf(
        returnType=(
            "user_id bigint, n_events bigint, first_type string, "
            "last_type string, span_s bigint"
        )
    )
    class JourneySummary:
        def __init__(self):
            self.n = 0
            self.uid = None
            self.first = None
            self.last = None
            self.t0 = None
            self.t1 = None

        def eval(self, row):
            self.n += 1
            self.uid = row["user_id"]
            if self.first is None:
                self.first = row["event_type"]
                self.t0 = row["ts"]
            self.last = row["event_type"]
            self.t1 = row["ts"]

        def terminate(self):
            if self.uid is not None:
                # Integer floor of the span WITHOUT float seconds: a
                # normalized positive timedelta keeps days/seconds/micros
                # non-negative, so days*86400+seconds IS the floor.
                delta = self.t1 - self.t0
                yield (
                    self.uid,
                    self.n,
                    self.first,
                    self.last,
                    delta.days * 86400 + delta.seconds,
                )

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    ev.createOrReplaceTempView("_udtf_events_v")
    spark.udtf.register("journey_summary", JourneySummary)
    return spark.sql(
        "SELECT * FROM journey_summary("
        "TABLE(_udtf_events_v) PARTITION BY user_id ORDER BY (ts, event_id))"
    )


@register(
    "udtf_arrow",
    "J",
    oracle="""
        SELECT p_partkey, w.pos - 1 AS pos, w.word
        FROM part, LATERAL (
            SELECT UNNEST(string_split(p_name, ' ')) AS word,
                   UNNEST(generate_series(1, len(string_split(p_name, ' '))))
                       AS pos
        ) w
    """,
    doc=(
        "ARROW-OPTIMIZED Python UDTF (Spark 4 useArrow=True): the same "
        "LATERAL table-function surface as udtf_python, but rows cross "
        "the Python boundary as Arrow record batches instead of pickled "
        "rows — the exact row-at-a-time → vectorized upgrade the scalar "
        "UDF family shows with udf_pandas_scalar. The function splits "
        "part names into (pos, word) rows; the oracle is the engine-"
        "native UNNEST, so the hash match proves the Arrow path changes "
        "serialization only, never semantics (nulls, empty strings, "
        "ordering all identical)."
    ),
)
def udtf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    @udtf(returnType="p_partkey: long, pos: int, word: string", useArrow=True)
    class NameWords:
        def eval(self, partkey: int, name: str):
            if name is None:
                return
            for i, w in enumerate(name.split(" ")):
                yield partkey, i, w

    spark.udtf.register("name_words_arrow", NameWords)
    p = load(spark, sf_dir, "part")
    p.createOrReplaceTempView("part_words_v")
    return spark.sql(
        """
        SELECT g.p_partkey, g.pos, g.word
        FROM part_words_v, LATERAL name_words_arrow(p_partkey, p_name) AS g
        """
    )
