"""Python-extension operators: UDTF and grouped-agg Pandas UDF
(SURVEY.md §2.2 "UDF/UDAF/UDTF").

These exist to prove the extension seams, not because the examples
need Python — both bodies are trivially portable SQL, which is exactly
what makes them oracle-checkable.  Real uses (tokenizers, model
scoring) slot into the same signatures.  Cost model: a UDTF is
row-at-a-time Python — keep it OFF the hot path; the grouped-agg
Pandas UDF moves one Arrow batch per group — fine when groups are few,
skew-prone when one group dominates.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from ..analytics.core import query, register_views


class SplitSentences:
    """Explode a document into ('. '-delimited) sentences with
    position — the canonical one-row-in / N-rows-out table function.
    Wrapped with ``udtf(...)`` lazily: the decorator resolves the Arrow
    setting from the active session, which doesn't exist at import."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            yield i, s, len(s)


@query(
    "udtf_split_sentences",
    """
    SELECT doc_id, i - 1 AS idx, parts[i] AS sentence,
           length(parts[i]) AS n_chars
    FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents),
         UNNEST(generate_series(1, len(parts))) t(i)
    WHERE doc_id % 25 = 0
    """,
    doc="Python UDTF via SQL LATERAL join: documents × split_sentences. "
    "Row-at-a-time Python — the query keeps it off the bulk path by "
    "pre-filtering to 1/25th of docs; the oracle replays the split as "
    "pure SQL.",
)
def udtf_split_sentences(spark, sf_dir):
    register_views(spark, sf_dir, "documents")
    spark.udtf.register(
        "split_sentences",
        udtf(SplitSentences, returnType="idx int, sentence string, n_chars int"),
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.idx, s.sentence, s.n_chars
        FROM documents d,
             LATERAL split_sentences(d.text) s
        WHERE d.doc_id % 25 = 0
        """
    )


# DoubleType() not the DDL string "double": the string form parses
# eagerly and needs a live SparkContext at import time.
@pandas_udf(DoubleType())
def _value_spread(v: pd.Series) -> float:
    """Grouped-agg Pandas UDF: max-min spread (exact, order-free —
    deterministic regardless of Arrow batch order)."""
    return float(v.max() - v.min())


@query(
    "pandas_udaf_value_spread",
    """
    SELECT event_type,
           round(max(value) - min(value), 6) AS spread
    FROM events GROUP BY event_type
    """,
    doc="Grouped-aggregate Pandas UDF (Arrow-batched UDAF): per-group "
    "Series → scalar. The partial-agg advantage is lost (all group "
    "rows move), so built-ins stay preferred — this pins the seam for "
    "aggregations that genuinely need numpy/pandas.",
)
def pandas_udaf_value_spread(spark, sf_dir):
    from ..analytics.core import table

    ev = table(spark, sf_dir, "events")
    # NB: a grouped-agg Pandas UDF cannot be mixed with built-in aggs
    # in the same agg() — Spark rejects the plan (0A000).
    return ev.groupBy("event_type").agg(
        F.round(_value_spread("value"), 6).alias("spread"),
    )


@query(
    "grouped_map_zscore",
    """
    SELECT event_type, event_id,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type),
                 4) AS zscore
    FROM events
    WHERE event_id % 20 = 0
    """,
    doc="Grouped-map applyInPandas (SURVEY.md §2.2 'applyInPandas'): "
    "whole-group pandas DataFrame in, transformed DataFrame out — "
    "per-event_type z-scores, the normalize-within-group shape every "
    "feature pipeline needs.  The WHOLE group materializes in one "
    "worker's memory (unlike window functions, which stream sorted "
    "partitions), so this seam is for transforms that truly need "
    "pandas; the oracle replays it as analytic windows.  Sample "
    "pre-filter keeps Python off the bulk path; ddof=1 matches "
    "stddev_samp.",
)
def grouped_map_zscore(spark, sf_dir):
    from ..analytics.core import table

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "event_id": pdf["event_id"],
                "zscore": ((pdf["value"] - mu) / sd).round(4),
            }
        )

    ev = table(spark, sf_dir, "events").where(F.col("event_id") % 20 == 0)
    return ev.groupBy("event_type").applyInPandas(
        _z, "event_type string, event_id bigint, zscore double"
    )
