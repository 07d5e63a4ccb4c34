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

import fnmatch
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
    """SQL LIKE -> regex (% = any run, _ = one char), anchored."""
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out) + "$")


def get_table_list(
    sf_dir: str, pattern: str = "%", allow_unkeyed: bool = False
) -> list[TableInfo]:
    """Enumerate capturable tables matching a LIKE pattern.

    Mirrors snapshot.c:199-298: deterministic ordering, key resolution,
    and the unkeyed-table refusal. ``relid`` is assigned stably from
    the sorted table list (16384 + index), standing in for the PG OID.
    """
    rx = _like_to_regex(pattern)
    infos: list[TableInfo] = []
    names = sorted(
        f[:-8]
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    for i, name in enumerate(names):
        if not rx.match(name):
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


def fnmatch_tables(sf_dir: str, glob_pattern: str) -> list[str]:
    """Convenience glob-style filter (non-SQL pattern)."""
    names = sorted(
        f[:-8] for f in os.listdir(sf_dir) if f.endswith(".parquet")
    )
    return [n for n in names if fnmatch.fnmatch(n, glob_pattern)]
