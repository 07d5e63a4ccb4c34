"""Sources: the CDC generator (stand-in for the reference's Postgres
capture side) and fixture-table readers."""

from bottledwater_pg_spark.sources.generator import (
    MutationSpec,
    generate_cdc,
    mutation_events,
    snapshot_events,
)

__all__ = [
    "MutationSpec",
    "generate_cdc",
    "mutation_events",
    "snapshot_events",
]
