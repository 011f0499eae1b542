"""Execution plans: checkpointed/resumable runs with snapshot lineage.

Iceberg-style table semantics over parquet + an explicit
``_snapshots.json`` manifest (SURVEY.md §7.1 plan B — no Iceberg jars
are available offline; the manifest keeps the same contract: atomic
snapshot append, per-partition row/byte metrics, lineage, and
resume-without-reprocessing)."""

from . import checkpoint  # noqa: F401
from . import layout  # noqa: F401
