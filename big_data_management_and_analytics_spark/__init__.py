"""PySpark-native analytics engine with the capability surface mandated for
``FabianFer08/Big-Data-Management-and-Analytics``.

The reference repo (`/root/reference/README.md:1-2`, `.gitignore:1-49`) is an
empty course stub, so the authoritative capability surface is the declared
operator inventory in ``SURVEY.md §2`` (the registry holds those plus extras
— ``len(all_queries())`` is the live count) spanning scans,
the relational algebra, window/analytic SQL, scalar function families, UDFs,
streaming semantics, and LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Design: declarative-first. Every operator is expressed with the DataFrame /
Spark SQL API so Catalyst owns optimization (pushdown, pruning, join
selection, AQE); Python touches the data path only through Arrow-vectorized
pandas UDFs. See ``SURVEY.md §4`` for the 100 TB-scale posture.
"""

from big_data_management_and_analytics_spark.plans.registry import all_queries, get_query

__all__ = ["all_queries", "get_query", "load_all"]


def load_all() -> None:
    """Import every query module so the registry is fully populated."""
    # Imports are side-effectful: each module registers its queries.
    from big_data_management_and_analytics_spark.sources import pysource, scans  # noqa: F401
    from big_data_management_and_analytics_spark.operators import (  # noqa: F401
        projections,
        joins,
        aggregations,
        windows,
        sorts,
        setops,
        composite,
        composite_full,
        graph,
        timeseries,
        mining,
        ml_features,
    )
    from big_data_management_and_analytics_spark.functions import (  # noqa: F401
        strings,
        dates,
        math_funcs,
        arrays,
        json_funcs,
        udfs,
    )
    from big_data_management_and_analytics_spark.streaming import batch_twins, live  # noqa: F401
    from big_data_management_and_analytics_spark.functions import (  # noqa: F401
        llm_corpus,
        llm_dedup,
        llm_sim,
        llm_text,
        multimodal,
    )
