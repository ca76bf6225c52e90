"""Staged execution plans: initial workflow, incremental link/match,
lineage + metrics."""
