"""Query catalog: every operator from SURVEY.md §2 (plus the
north-star extensions) exposed as a named ``(spark, sf_dir) ->
DataFrame`` callable with, where SQL-expressible, a DuckDB oracle SQL
string over the same parquet tables.

``__spark_entry__.py`` re-exports this registry to the driver.
"""

from convoy_spark.queries.catalog import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)

# Importing the modules populates the registry.
from convoy_spark.queries import (  # noqa: F401,E402
    aggregates,
    dedup,
    eventwin,
    extjoins,
    graph,
    joins,
    multimodal,
    projections,
    relational,
    similarity,
    textops,
    treestats,
    setops,
    windows,
)
