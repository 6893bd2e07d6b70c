"""Job-plan layer: checkpointed, metrics-emitting stage orchestration."""

from .pipeline import Pipeline, stage_metrics  # noqa: F401
