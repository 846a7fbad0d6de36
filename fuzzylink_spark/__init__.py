"""fuzzylink_spark — a PySpark-native record-linkage / entity-resolution engine.

A brand-new, Spark-first implementation of the capabilities of the
``joeornstein/fuzzylink`` R package (reference at ``/root/reference``):
blocking → candidate pairs → embedding-cosine + lexical features →
probabilistic match scoring (EM mixture / logistic) → expected-F1 cutoff →
transitive clustering (connected components) → joined-back linked output.

Architecture (see SURVEY.md):
- all relational steps are Catalyst DataFrame ops (joins, windows, distinct);
- vector math runs in Arrow-batched pandas UDFs (never per-row Python);
- loops (EM, active learning, connected components) are driver-orchestrated
  DataFrame jobs with checkpointed, resumable stage outputs.
"""

from fuzzylink_spark.config import LinkConfig
from fuzzylink_spark.pipeline import fuzzylink, fuzzylink_twopass
from fuzzylink_spark.session import get_spark

__all__ = ["LinkConfig", "fuzzylink", "fuzzylink_twopass", "get_spark"]
__version__ = "0.1.0"
