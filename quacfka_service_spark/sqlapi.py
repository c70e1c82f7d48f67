"""SQL-text surface with template substitution — the reference's
actual user interface.

Users of the reference never call an API: they ship DuckDB SQL strings
(with ``{{year}}``/``{{month}}``/``{{day}}``/``{{hour}}`` placeholders)
that quacfka-runner substitutes and executes per rotated DB file
(/root/reference/main.go:92-125; templating at main.go:101-125 — F12
``template_substitution`` in SURVEY.md §2.8).  This module gives the
Spark engine the same UX, Catalyst underneath:

- ``register_catalog(spark, sf_dir)`` publishes the raw nested
  ``bidreq`` table, the flat ``bidreq_norm`` view, and the ten
  testdata tables as temp views;
- ``render_template(sql, **params)`` is the ``{{param}}``
  substitution, fail-loud on unbound placeholders (the runner passes
  partition values as strings, so do we);
- the reference's three embedded queries ship as Spark-SQL text
  constants — near-verbatim translations (Spark SQL has ``GROUP BY
  ALL`` and ``ORDER BY`` ordinals just like DuckDB; only the epoch
  helpers differ: ``timestamp_millis`` for ``epoch_ms``) — pinned
  equal to the DataFrame builders in tests/test_sqlapi.py.

Because views are lazy and ``spark.sql`` plans through the same
Catalyst optimizer, SQL text gets identical physical plans to the
DataFrame API: predicate pushdown, partial aggregation, and nested-
column pruning all apply — there is no performance tax for the SQL
surface at any scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .fixtures import build_bidreq
from .operators.normalize import normalize_bidreq
from .session import tables

_PLACEHOLDER = re.compile(r"\{\{(\w+)\}\}")


def render_template(sql: str, **params) -> str:
    """F12: substitute ``{{name}}`` placeholders; every placeholder
    must be bound (a silently-unbound partition value would export the
    wrong hour — fail loud instead)."""

    def _sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise KeyError(f"unbound template parameter {{{{{name}}}}}")
        return str(params[name])

    return _PLACEHOLDER.sub(_sub, sql)


def register_catalog(spark: SparkSession, sf_dir: str) -> None:
    """Publish the engine's tables as temp views: ``bidreq`` (nested,
    the reference's raw table), ``bidreq_norm`` (flat per-deal grain),
    and the ten testdata tables under their own names."""
    for name, df in tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    bid = build_bidreq(spark, sf_dir)
    bid.createOrReplaceTempView("bidreq")
    normalize_bidreq(bid).createOrReplaceTempView("bidreq_norm")


def sql(spark: SparkSession, query: str, **params) -> DataFrame:
    """Render + run reference-style SQL text through Catalyst."""
    return spark.sql(render_template(query, **params))


# --- the reference's three embedded queries as Spark-SQL text -------------

# main.go:92-99 — partition discovery (GROUP BY ALL / ORDER BY ordinals
# work unchanged in Spark SQL; epoch_ms -> timestamp_millis)
PARTITION_ENUM_SQL = """
SELECT DISTINCT
  CAST(year(timestamp_millis(`timestamp`.seconds * 1000 + CAST(`timestamp`.nanos AS BIGINT) div 1000000)) AS STRING) AS year,
  CAST(month(timestamp_millis(`timestamp`.seconds * 1000 + CAST(`timestamp`.nanos AS BIGINT) div 1000000)) AS STRING) AS month,
  CAST(day(timestamp_millis(`timestamp`.seconds * 1000 + CAST(`timestamp`.nanos AS BIGINT) div 1000000)) AS STRING) AS day,
  CAST(hour(timestamp_millis(`timestamp`.seconds * 1000 + CAST(`timestamp`.nanos AS BIGINT) div 1000000)) AS STRING) AS hour
FROM bidreq
ORDER BY 1, 2, 3, 4
"""

# main.go:101-108 — templated raw export for one hour partition
# (scalar projection, FIXTURES.md §4, so results are hashable)
RAW_EXPORT_SQL = """
WITH t AS (
  SELECT *,
         timestamp_millis(`timestamp`.seconds * 1000 + CAST(`timestamp`.nanos AS BIGINT) div 1000000) AS __pts
  FROM bidreq
)
SELECT id AS bidreq_id,
       site.publisher.id AS pub_id,
       site.id AS site_id,
       user.id AS user_id,
       device.ifa AS ifa,
       `timestamp`.seconds AS seconds,
       CAST(`timestamp`.nanos AS BIGINT) AS nanos,
       event_tm
FROM t
WHERE year(__pts) = {{year}} AND month(__pts) = {{month}}
  AND day(__pts) = {{day}} AND hour(__pts) = {{hour}}
"""

# main.go:109-125 — the flagship hourly aggregate (GROUP BY ALL, exact
# count distinct), over the normalized view
HOURLY_AGG_SQL = """
SELECT
  CAST(CAST(date_trunc('DAY', timestamp_millis(event_time * 1000)) AS DATE) AS STRING) AS date,
  CAST(hour(timestamp_millis(event_time * 1000)) AS BIGINT) AS hour,
  pub_id,
  device_id,
  CONCAT(CAST(width AS STRING), 'x', CAST(height AS STRING)) AS resolution,
  deal,
  count(DISTINCT bidreq_id) AS requests
FROM bidreq_norm
GROUP BY ALL
"""
