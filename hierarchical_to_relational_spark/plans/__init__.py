"""Design-time planning: derive output schemas without running any job.

The reference validates configs and publishes the derived output schema to
downstream stages at pipeline-deploy time (``configurePipeline`` →
``setOutputSchema``, HierarchyToRelational.java:56-61 — reference O25).
This module is the engine's equivalent "analyze" surface: every pipeline
stage exposes a ``plan_*`` function returning the exact ``StructType`` the
runtime stage will produce, so callers can type-check a whole pipeline
before any data moves.
"""

from hierarchical_to_relational_spark.plans.dry_run import (  # noqa: F401
    plan_flatten,
    plan_normalize,
    plan_cdc_table,
    plan_pipeline,
)
