"""Structured Streaming operators.

The reference has no streaming at all — its "incremental" workflow is a
batch re-run over a second table (/root/reference/03_Incremental_Workflow.py:8-13).
We keep that batch-incremental core and add a genuine streaming surface on
top: file-source micro-batches feed the same link/match/merge logic via
foreachBatch, plus watermarked windowed aggregations and streaming dedup
for event/telemetry tables.
"""
