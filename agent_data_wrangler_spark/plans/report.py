"""S4 report renderer: turn a pipeline run (+ optional table profile) into the
findings text the reference's ``create_report`` tool writes
(``/root/reference/graph_proj/src/agent/tool_call_agent.py:57-69``; example
artifacts ``dirty_hr_further_clean_report.txt``, ``stash/*_report.txt`` —
narrative sections listing cleaning actions and row deltas).

The renderer is driver-side string formatting over already-computed numbers —
no Spark jobs of its own.
"""

from __future__ import annotations

from agent_data_wrangler_spark.plans.pipeline import PipelineResult


def render_report(
    result: PipelineResult,
    *,
    title: str = "Data cleaning report",
    profile_lines: list[str] | None = None,
    notes: list[str] | None = None,
) -> str:
    """Render a plain-text report: header, per-stage actions with row deltas,
    optional profile section and free-form notes."""
    lines = [title, "=" * len(title), ""]
    start = next((e for e in result.events if e["event"] == "pipeline_start"), None)
    if start:
        lines.append(f"Pipeline: {start['pipeline']} ({start['n_stages']} stages)")
        lines.append("")
    lines.append("Cleaning steps")
    lines.append("--------------")
    for i, (stage, rows_in, rows_out) in enumerate(result.row_counts, 1):
        delta = ""
        if rows_in is not None and rows_out is not None:
            removed = rows_in - rows_out
            if removed > 0:
                delta = f": {rows_in} -> {rows_out} rows ({removed} removed)"
            elif removed < 0:
                delta = f": {rows_in} -> {rows_out} rows ({-removed} added)"
            else:
                delta = f": {rows_out} rows (unchanged)"
        lines.append(f"{i}. {stage}{delta}")
    end = next((e for e in result.events if e["event"] == "pipeline_end"), None)
    if end and end.get("rows_out") is not None:
        lines.append("")
        lines.append(f"Final row count: {end['rows_out']}")
    if profile_lines:
        lines.extend(["", "Profile", "-------", *profile_lines])
    if notes:
        lines.extend(["", "Notes", "-----", *notes])
    lines.append("")
    return "\n".join(lines)
