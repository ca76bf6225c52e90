"""customer_er_spark — a from-scratch PySpark-native near-duplicate
detection + clustering engine for (image, caption) records.

Re-imagines the two-phase entity-resolution workflow of
databricks-industry-solutions/customer-er (blocking/candidate generation,
then pairwise match scoring, then cluster assignment — see
/root/reference/02_Initial_Workflow_Part_B.py and
/root/reference/03_Incremental_Workflow.py) as a deterministic,
Spark-first staged DAG:

    ingest -> signatures -> bands -> candidates -> verified_pairs
           -> connected components -> clusters / cluster_members

All heavy math (MinHash, SimHash, pHash, image codecs, LCS) runs in
vectorized numpy inside Arrow-batched pandas UDFs; all relational logic
is declarative DataFrame/SQL so Catalyst handles pushdown, pruning,
join selection, and AQE handles runtime coalesce + skew.
"""

__version__ = "0.1.0"

from customer_er_spark.config import ERConfig  # noqa: F401
