"""Catalog scan / table-list filter (S2) — which tables get captured.

Reference: ``get_table_list`` runs a catalog query selecting ordinary
(relkind='r'), permanent, non-system tables whose qualified name
matches a LIKE pattern, resolves each table's key index by the
replica-identity rules, and refuses unkeyed tables unless
``--allow-unkeyed`` (/root/reference/ext/snapshot.c:199-298, SQL at
204-229; validation at 286-297).

Here the "catalog" is the fixture directory plus a static PK registry
(the parquet files carry no constraint metadata). The LIKE-pattern
semantics are reproduced exactly.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

# primary keys of the fixture tables (TESTDATA.md / FIXTURES.md §7).
# lineitem's synthetic (l_orderkey, l_linenumber) is NOT unique, so it
# is registered as unkeyed — exactly the situation the reference's
# --allow-unkeyed flag exists for.
TABLE_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": [],  # duplicate (orderkey, linenumber) pairs in fixture
    "events": [],  # append-only stream table (FIXTURES.md §2)
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


class UnkeyedTableError(ValueError):
    """Raised for unkeyed tables unless allow_unkeyed (snapshot.c:286-297)."""


@dataclass(frozen=True)
class TableInfo:
    name: str
    path: str
    key_columns: tuple[str, ...]
    relid: int

    @property
    def keyed(self) -> bool:
        return bool(self.key_columns)


def _like_to_regex(pattern: str) -> re.Pattern:
    """SQL LIKE -> regex (% = any run, _ = one char, backslash
    escapes the next character — PG's default ESCAPE), anchored."""
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
        i += 1
    return re.compile("^" + "".join(out) + "$")


def get_table_list(
    sf_dir: str, pattern: str = "%", allow_unkeyed: bool = False
) -> list[TableInfo]:
    """Enumerate capturable tables matching a LIKE pattern.

    Mirrors snapshot.c:199-298: deterministic ordering, key resolution,
    and the unkeyed-table refusal. ``relid`` is assigned stably from
    the sorted table list (16384 + index), standing in for the PG OID.

    Pattern matching is gated on qualification: a pattern containing a
    (literal) dot matches the QUALIFIED form ``public.<table>`` only;
    a dotless pattern matches the BARE table name only. This is a
    deliberate tightening over matching both forms (which would make
    ``p%`` select every ``public.*`` table): a dotless pattern whose
    wildcard used to span the dot of the qualified form — e.g.
    ``public_customer`` (``_`` matching ``.``) or ``pub%customer`` —
    now selects nothing; such patterns get a warning below rather than
    a silent empty result."""
    rx = _like_to_regex(pattern)
    infos: list[TableInfo] = []
    names = sorted(
        f[:-8]
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    # the reference matches the QUALIFIED name (snapshot.c:204-229
    # compares n.nspname||'.'||relname). Matching BOTH forms for every
    # pattern over-selects: 'p%' / '%.%' would match every
    # 'public.<table>'. So a pattern containing a (literal) dot is a
    # qualified-name pattern and matches only the qualified form; a
    # dotless pattern matches only the bare name.
    # ('.' is not a LIKE wildcard, so any dot — escaped or not — is a
    # literal dot, which only a qualified name can contain)
    qualified = "." in pattern
    if not qualified and not any(rx.match(n) for n in names) and any(
        rx.match(f"public.{n}") for n in names
    ):
        import warnings

        warnings.warn(
            f"table pattern {pattern!r} matches no bare table name but "
            f"would match a qualified 'public.<table>' form; dotless "
            f"patterns match bare names only — qualify the pattern "
            f"(e.g. 'public.%') to match qualified names",
            stacklevel=2,
        )
    for i, name in enumerate(names):
        subject = f"public.{name}" if qualified else name
        if not rx.match(subject):
            continue
        keys = tuple(TABLE_KEYS.get(name, ()))
        if not keys and not allow_unkeyed:
            raise UnkeyedTableError(
                f"table {name!r} has no primary key/replica identity; "
                f"pass allow_unkeyed=True to capture it "
                f"(reference snapshot.c:286-297)"
            )
        infos.append(
            TableInfo(
                name=name,
                path=os.path.join(sf_dir, f"{name}.parquet"),
                key_columns=keys,
                relid=16384 + i,
            )
        )
    return infos


# integer expression used for snapshot lsn assignment per fixture table
# (the reference's snapshot rows are ordered by cursor position; here a
# deterministic per-row integer plays that role). lineitem's composite
# fuse mirrors the events-composite convention.
TABLE_PKNUM_SQL: dict[str, str] = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey * 8 + l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def export_snapshot(
    spark,
    sf_dir: str,
    pattern: str = "%",
    allow_unkeyed: bool = False,
    namespace: str = "public",
    topic_prefix: str | None = None,
):
    """The §3.2 SQL entry point as one call — the Spark analog of
    ``SELECT bottledwater_export(pattern, allow_unkeyed, ...)``
    (/root/reference/ext/bottledwater--0.1.sql:21-26,
    snapshot.c:103-189): enumerate every capturable table matching the
    LIKE pattern (S2, key resolution + unkeyed refusal), and return
    ONE interleaved envelope DataFrame in which each table contributes
    its TableSchema control event (piggybacked before the first row,
    protocol_server.c:78-99) followed by every row as an Insert frame
    with xid=0.

    Scale: a union of per-table narrow projections — no shuffle at
    all; each table's scan parallelizes over its own splits, exactly
    the reference's one-cursor-per-table pull loop re-expressed as
    Spark's iterator model.
    """
    from pyspark.sql import functions as F

    from bottledwater_pg_spark.schema_tracker import table_schema_events
    from bottledwater_pg_spark.session import load_table
    from bottledwater_pg_spark.sources.generator import snapshot_events
    from bottledwater_pg_spark.routing import topic_name

    parts = []
    for t in get_table_list(sf_dir, pattern, allow_unkeyed):
        df = load_table(spark, sf_dir, t.name)
        if t.name not in TABLE_PKNUM_SQL:
            raise LookupError(
                f"table {t.name!r} has no pk-number expression: new "
                f"fixture tables must be registered in BOTH "
                f"catalog.TABLE_KEYS and catalog.TABLE_PKNUM_SQL"
            )
        pk_num = F.expr(TABLE_PKNUM_SQL[t.name])
        topic = topic_name(t.name, namespace, topic_prefix)
        ctl = table_schema_events(df, t.relid, topic, lsn=-1)
        parts.append(
            ctl.unionByName(
                snapshot_events(
                    df,
                    list(t.key_columns),
                    pk_num,
                    t.relid,
                    t.name,
                    namespace,
                    topic_prefix,
                )
            )
        )
    if not parts:
        raise LookupError(f"no tables match pattern {pattern!r}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
