"""Durable-or-local materialization barrier for operator internals.

Several operators need an execution barrier on an intermediate (a result
referenced by two downstream branches, or a small output that frees a big
cached input).  Two modes:

  with a catalog     commit the intermediate as a real snapshot table and
                     read it back — durable, recomputable after executor
                     loss, resumable, visible for audit.  This is the mode
                     a cluster deployment should use: it is the operator-
                     library extension of the flagship pipeline's
                     per-stage checkpoint story.
  without (default)  df.localCheckpoint(eager=True) — blocks pinned to
                     executors, NON-recomputable if one dies.  Correct
                     only in single-box/sandbox runs (and in tests), which
                     is why every operator keeps it merely as the fallback.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def scratch_name(base: str, *params) -> str:
    """Deterministic per-call scratch-table name: base + short hash of the
    call parameters.  Two operator calls with different parameters sharing
    one catalog land in different tables (no silent clobber, no bypassed
    schema-change guard); identical parameters map to the SAME name, so a
    re-run overwrites its own (byte-identical) scratch output — the
    resume-friendly behavior, not a leak."""
    h = hashlib.sha256(repr(params).encode()).hexdigest()[:8]
    return f"{base}_{h}"


def materialize(
    df: DataFrame,
    catalog=None,
    table: str | None = None,
    config_hash: str = "",
    inputs: dict | None = None,
) -> DataFrame:
    """Materialize df and return a re-readable handle to the result."""
    if catalog is not None:
        if not table:
            raise ValueError("materialize with a catalog requires a table name")
        # operator-internal intermediates are scratch state, not evolving
        # user tables: a config change may legitimately reshape them, so
        # schema evolution is always allowed here
        catalog.write_table(
            df, table, config_hash=config_hash, inputs=inputs,
            overwrite_schema=True,
        )
        return catalog.read_table(table)
    return df.localCheckpoint(eager=True)
