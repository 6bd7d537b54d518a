"""fastselect_spark — a PySpark-native feature-engineering + feature-selection engine.

Re-expresses the capabilities of the FastSelect reference
(GavinLynch04/FastSelect, surveyed in /root/repo/SURVEY.md) as idiomatic
Spark: DataFrame/SQL window featurization, a point-in-time as-of join, and
partition-parallel ``treeAggregate`` scoring kernels (chi2, MI, mRMR, SU/CFS,
ReliefF/SURF/MultiSURF, MDR, TuRF, Fisher).

Layers
------
- ``featurize``: transcripts -> wide feature matrix (windows, sessionize,
  backfill, lag/lead, as-of join).
- ``select``: feature matrix -> scores / selected features (the reference's
  operator inventory, SURVEY.md §2.2 O1–O17).
- ``text`` / ``dedup`` / ``similarity`` / ``multimodal``: large-scale
  training-data pipeline operators over the documents/embeddings tables.
- ``runtime``: session config, checkpoint/lineage manifest for resumable
  backfill, scaling-bench helpers.
"""

__version__ = "0.1.0"

from fastselect_spark.runtime.session import get_spark  # noqa: F401
