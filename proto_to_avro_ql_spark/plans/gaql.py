"""GAQL-style report-query strings (the reference's query language
surface: ``SELECT <dot-paths> FROM <resource> WHERE <predicates>``,
assembled in CampaignCriterionStructureReport.scala:48-51 and executed
server-side; README.md:8-9).

Here the full round trip is native: parse the text, bind the paths via
the projection compiler, and hand predicates to Catalyst (``F.expr``),
so WHERE pushdown/pruning apply exactly as with the programmatic API.
"""

from __future__ import annotations

import datetime as dt
import re
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proto_to_avro_ql_spark.plans.compile import compile_projection

_GAQL_RE = re.compile(
    r"^\s*SELECT\s+(?P<fields>.+?)\s+FROM\s+(?P<resource>\S+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?"
    r"(?:\s+PARAMETERS\s+(?P<params>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_params(params: str | None) -> tuple[tuple[str, str], ...]:
    """GAQL trailing PARAMETERS clause (`PARAMETERS include_drafts =
    true, omit_unselected_resource_names = true`): comma-separated
    name = value settings. Parsed and carried so PARAMETERS queries
    round-trip instead of failing to parse; the two defined settings
    are no-ops on this engine's corpora (no draft entities; resource
    names are only emitted when selected anyway) — which is exactly
    the assertable contract."""
    if not params:
        return ()
    out = []
    for item in params.split(","):
        if not item.strip():
            continue
        m = re.match(r"^\s*(\w+)\s*=\s*(\S+)\s*$", item)
        if not m:
            raise ValueError(f"Bad PARAMETERS item {item!r}")
        out.append((m.group(1).lower(), m.group(2).lower()))
    return tuple(out)


@dataclass(frozen=True)
class GaqlQuery:
    fields: tuple[str, ...]
    resource: str
    where: str | None
    order_by: tuple[tuple[str, str], ...] = ()  # (path, 'ASC'|'DESC')
    limit: int | None = None
    parameters: tuple[tuple[str, str], ...] = ()  # (name, value), lowered

    @property
    def text(self) -> str:
        """Canonical query text (fields.mkString(',') analog) — the
        cache key (Main.scala:69-77)."""
        q = f"SELECT {', '.join(self.fields)} FROM {self.resource}"
        if self.where:
            q += f" WHERE {self.where}"
        if self.order_by:
            q += " ORDER BY " + ", ".join(f"{p} {d}" for p, d in self.order_by)
        if self.limit is not None:
            q += f" LIMIT {self.limit}"
        if self.parameters:
            q += " PARAMETERS " + ", ".join(
                f"{k} = {v}" for k, v in self.parameters
            )
        return q


def _parse_order(order: str | None) -> tuple[tuple[str, str], ...]:
    if not order:
        return ()
    out = []
    for item in order.split(","):
        parts = item.split()
        if not parts:
            continue
        direction = parts[1].upper() if len(parts) > 1 else "ASC"
        if direction not in ("ASC", "DESC"):
            raise ValueError(f"Bad ORDER BY direction in {item!r}")
        out.append((parts[0], direction))
    return tuple(out)


# --- string-literal masking -------------------------------------------------
# The clause regex and the comma/whitespace splitters must never see
# the INSIDE of a quoted string: `WHERE name = 'x ORDER BY y'` would
# otherwise split the literal into a bogus ORDER BY clause, and
# `IN ('a,b')` would split the field/order lists on the embedded comma.
# Literals are swapped for \x00<n>\x00 placeholders (no spaces, no
# commas, no keywords) before any structural parsing and restored in
# every captured fragment afterwards.  BOTH quote styles are masked:
# the WHERE clause executes via F.expr (Spark SQL), which accepts
# double-quoted string literals too — `name = "x ORDER BY y"` would
# otherwise shear the clause split exactly like the single-quote case
# (round-5 ADVICE).

_PLACEHOLDER_RE = re.compile("\x00(\\d+)\x00")


def _mask_literals(query: str) -> tuple[str, list[str]]:
    out: list[str] = []
    lits: list[str] = []
    i = 0
    n = len(query)
    while i < n:
        ch = query[i]
        if ch not in ("'", '"'):
            out.append(ch)
            i += 1
            continue
        quote = ch
        j = i + 1
        while j < n:
            if query[j] == "\\":
                j += 2
                continue
            if query[j] == quote:
                break
            j += 1
        if j >= n:
            raise ValueError(f"Unterminated string literal in query: {query!r}")
        lits.append(query[i : j + 1])
        out.append(f"\x00{len(lits) - 1}\x00")
        i = j + 1
    return "".join(out), lits


def _unmask(text: str | None, lits: list[str]) -> str | None:
    if text is None or not lits:
        return text
    return _PLACEHOLDER_RE.sub(lambda m: lits[int(m.group(1))], text)


def parse_gaql(query: str) -> GaqlQuery:
    masked, lits = _mask_literals(query)
    m = _GAQL_RE.match(masked)
    if not m:
        raise ValueError(f"Cannot parse report query: {query!r}")
    fields = tuple(
        _unmask(f.strip(), lits)
        for f in m.group("fields").split(",")
        if f.strip()
    )
    if not fields:
        raise ValueError("Report query selects no fields")
    limit = m.group("limit")
    order = tuple(
        (_unmask(p, lits), d) for p, d in _parse_order(m.group("order"))
    )
    params = tuple(
        (k, _unmask(v, lits)) for k, v in _parse_params(m.group("params"))
    )
    return GaqlQuery(
        fields,
        _unmask(m.group("resource"), lits),
        _unmask(m.group("where"), lits),
        order,
        int(limit) if limit is not None else None,
        params,
    )


def _flat(path: str) -> str:
    return path.replace(".", "_")


# --- DURING date-range macros ----------------------------------------------
# GAQL's date predicates: `segments.date DURING LAST_30_DAYS` etc. The
# macros are ANCHORED (an explicit reference date) so the same query
# text always compiles to the same plan — a wall-clock `today` would
# make results, caches, and oracles nondeterministic.

_DURING_RE = re.compile(
    r"(?P<path>[A-Za-z_][\w.]*)\s+DURING\s+(?P<range>[A-Za-z_0-9]+)",
    re.IGNORECASE,
)


def _month_start(d: dt.date) -> dt.date:
    return d.replace(day=1)


def _during_bounds(range_name: str, anchor: dt.date) -> tuple[dt.date, dt.date]:
    """(inclusive lo, inclusive hi) for a GAQL date-range macro.
    LAST_N_DAYS excludes the anchor day itself (GAQL semantics)."""
    r = range_name.upper()
    day = dt.timedelta(days=1)
    if r == "TODAY":
        return anchor, anchor
    if r == "YESTERDAY":
        return anchor - day, anchor - day
    m = re.fullmatch(r"LAST_(\d+)_DAYS", r)
    if m:
        n = int(m.group(1))
        return anchor - n * day, anchor - day
    if r == "THIS_MONTH":
        return _month_start(anchor), anchor
    if r == "LAST_MONTH":
        this_start = _month_start(anchor)
        prev_end = this_start - day
        return _month_start(prev_end), prev_end
    raise ValueError(f"Unknown DURING range {range_name!r}")


def expand_during(where: str, anchor_date: str | None) -> str:
    """Rewrite every `<path> DURING <RANGE>` into an ISO-string BETWEEN
    (dates travel as ISO strings per the reference's model, SURVEY
    §1.2, so BETWEEN on strings is correct). Raises if a DURING appears
    without an anchor. String literals are masked first so the word
    DURING inside a quoted value is never rewritten."""
    masked, lits = _mask_literals(where)
    if not _DURING_RE.search(masked):
        return where
    if anchor_date is None:
        raise ValueError(
            "Query uses DURING but no anchor_date was provided; "
            "pass run_gaql(..., anchor_date='YYYY-MM-DD')"
        )
    anchor = dt.date.fromisoformat(anchor_date)

    def repl(m: re.Match) -> str:
        lo, hi = _during_bounds(m.group("range"), anchor)
        return f"{m.group('path')} BETWEEN '{lo.isoformat()}' AND '{hi.isoformat()}'"

    return _unmask(_DURING_RE.sub(repl, masked), lits)


def default_catalog(
    spark: SparkSession, sf_dir: str
) -> Callable[[str], DataFrame]:
    """The engine's standard resource resolver: the synthesized
    ``ads_row`` report view plus every raw testdata table — so GAQL
    text queries address the whole catalog, not one pre-bound resource
    (the reference binds FROM to Google Ads resources the same way;
    CampaignCriterionStructureReport.scala:48-51)."""
    from proto_to_avro_ql_spark.fixtures import ads_row
    from proto_to_avro_ql_spark.sources.io import TABLES, read_table

    def resolve(name: str) -> DataFrame:
        if name == "ads_row":
            return ads_row(spark, sf_dir)
        if name in TABLES:
            return read_table(spark, sf_dir, name)
        raise ValueError(f"Unknown resource {name!r}; know ads_row + {TABLES}")

    return resolve


def run_gaql(
    spark: SparkSession,
    query: str,
    resolve_table: Callable[[str], DataFrame],
    implicit_agg: bool = False,
    anchor_date: str | None = None,
) -> DataFrame:
    """Parse → resolve resource → compile projection → apply WHERE.
    Predicates go through Catalyst unchanged, so they push down to the
    scan exactly like programmatic filters.

    ``implicit_agg=True`` reproduces the report semantics the Google
    Ads SERVER applies to a GAQL query (SURVEY.md §2.4: "metrics.* are
    aggregates over the selected segments.* dimensions" — the reference
    receives rows already grouped, CampaignCriterionStructureReport
    .scala:15-45): every selected ``metrics.`` path is SUMmed, grouped
    by all other selected paths, output columns flattened
    (``segments.date`` → ``segments_date``). WHERE keeps this engine's
    documented pre-projection semantics and therefore filters
    pre-aggregation rows. One shuffle, map-side partials."""
    q = parse_gaql(query)
    df = resolve_table(q.resource)
    if q.where:
        q = GaqlQuery(
            q.fields,
            q.resource,
            expand_during(q.where, anchor_date),
            q.order_by,
            q.limit,
            q.parameters,
        )
    if q.where:
        # WHERE may reference non-selected paths (the reference filters
        # server-side over full rows): filter the SOURCE, then project.
        # Catalyst pushes the predicate to the scan either way.
        df = df.where(F.expr(q.where))
    mets = [f for f in q.fields if f.startswith("metrics.")]
    if implicit_agg and mets:
        dims = [f for f in q.fields if not f.startswith("metrics.")]
        proj = compile_projection(df, list(q.fields))
        out = proj.groupBy(*[F.col(d).alias(_flat(d)) for d in dims]).agg(
            *[F.sum(F.col(m)).alias(_flat(m)) for m in mets]
        )
        name = _flat
    else:
        out = compile_projection(df, list(q.fields))
        name = lambda p: p  # noqa: E731
    # GAQL convention: ORDER BY attributes must be selected.
    if q.order_by:
        out = out.orderBy(
            *[
                F.col(name(p)).desc() if d == "DESC" else F.col(name(p)).asc()
                for p, d in q.order_by
            ]
        )
    if q.limit is not None:
        # ORDER BY + LIMIT plans as TakeOrderedAndProject (top-k, no
        # global sort) — the scalable form.
        out = out.limit(q.limit)
    return out
