"""GAQL-style report-query strings (the reference's query language
surface: ``SELECT <dot-paths> FROM <resource> WHERE <predicates>``,
assembled in CampaignCriterionStructureReport.scala:48-51 and executed
server-side; README.md:8-9).

Here the full round trip is native: parse the text, bind the paths via
the projection compiler, and hand predicates to Catalyst (``F.expr``),
so WHERE pushdown/pruning apply exactly as with the programmatic API.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proto_to_avro_ql_spark.plans.compile import compile_projection

_GAQL_RE = re.compile(
    r"^\s*SELECT\s+(?P<fields>.+?)\s+FROM\s+(?P<resource>\S+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


@dataclass(frozen=True)
class GaqlQuery:
    fields: tuple[str, ...]
    resource: str
    where: str | None

    @property
    def text(self) -> str:
        """Canonical query text (fields.mkString(',') analog) — the
        cache key (Main.scala:69-77)."""
        q = f"SELECT {', '.join(self.fields)} FROM {self.resource}"
        return q + (f" WHERE {self.where}" if self.where else "")


def parse_gaql(query: str) -> GaqlQuery:
    m = _GAQL_RE.match(query)
    if not m:
        raise ValueError(f"Cannot parse report query: {query!r}")
    fields = tuple(f.strip() for f in m.group("fields").split(",") if f.strip())
    if not fields:
        raise ValueError("Report query selects no fields")
    return GaqlQuery(fields, m.group("resource"), m.group("where"))


def run_gaql(
    spark: SparkSession,
    query: str,
    resolve_table: Callable[[str], DataFrame],
) -> DataFrame:
    """Parse → resolve resource → compile projection → apply WHERE.
    Predicates go through Catalyst unchanged, so they push down to the
    scan exactly like programmatic filters."""
    q = parse_gaql(query)
    df = resolve_table(q.resource)
    out = compile_projection(df, list(q.fields))
    if q.where:
        out = out.where(F.expr(q.where))
    return out
