"""Merged query catalog: every `queries()` entry and its DuckDB oracle."""

from __future__ import annotations

from . import (
    analytics,
    graphq,
    curation,
    dq,
    multimodalq,
    relational,
    relational2,
    sampling,
    sketchq,
    streamq,
    substrq,
    temporalq,
    textqueries,
    vectors,
)

QUERIES: dict = {}
ORACLES: dict = {}

for mod in (relational, relational2, textqueries, vectors, multimodalq, sampling, dq, streamq, temporalq, curation, sketchq, analytics, graphq, substrq):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
