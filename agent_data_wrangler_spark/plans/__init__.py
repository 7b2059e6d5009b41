"""Pipeline composition layer (SURVEY §7): declarative stage specs, versioned
outputs, JSONL event log (S5), report rendering (S4 content)."""

from agent_data_wrangler_spark.plans.pipeline import Pipeline, PipelineResult, Stage
from agent_data_wrangler_spark.plans.report import render_report

__all__ = ["Pipeline", "PipelineResult", "Stage", "render_report"]
