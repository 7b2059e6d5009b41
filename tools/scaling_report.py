"""Decade-over-decade scaling report from COMMITTED bench artifacts.

Verdict r08 item 3: round notes quoted scaling ratios that drifted from the
committed JSON pair (the sf0.1 record was re-captured mid-round, shifting
denominators). This tool makes drift impossible: the ratio table is EMITTED
from the artifacts, never hand-typed — prose quotes the generated file or
nothing.

Usage:
    python tools/scaling_report.py \
        --pair sf0.1=BENCH_local_r08.json --pair sf1=BENCH_sf1.json \
        [--pair sf10=BENCH_sf10.json] [--out SCALING.md]

Each --pair is label=path (ordered smallest SF first). For every query
present in consecutive pairs the report prints t_small, t_big and the ratio;
a per-decade data multiplier (from the SF labels when numeric) gives the
linearity verdict: ratio <= mult is at-most-linear, ratio > 1.5*mult is
flagged SUPERLINEAR — the threshold the round-8 verdict set for "needs a
named fix plan".

All timings are the bench protocol's per-query min-of-2; queries missing
from either artifact (targeted subset probes) are simply absent from that
decade's section.
"""

from __future__ import annotations

import argparse
import json
import os


def _load(path: str) -> dict[str, float]:
    with open(path, encoding="utf-8") as fh:
        payload = json.load(fh)
    return {k: v for k, v in payload["queries"].items() if v > 0}


def _sf_value(label: str) -> float | None:
    # "sf1-skew" (a variant capture at the same volume) still means 1.0 —
    # anything after the first '-' is a variant tag, not part of the SF.
    raw = label.removeprefix("sf").split("-")[0]
    try:
        return float(raw)
    except ValueError:
        return None


def build_report(pairs: list[tuple[str, str]],
                 footnotes: list[str] | None = None) -> str:
    lines = ["# Scaling report (generated — do not hand-edit)", ""]
    lines.append("Source artifacts: " + ", ".join(
        f"{lbl}={os.path.basename(p)}" for lbl, p in pairs))
    lines.append("")
    for (lbl_a, path_a), (lbl_b, path_b) in zip(pairs, pairs[1:]):
        qa, qb = _load(path_a), _load(path_b)
        common = sorted(set(qa) & set(qb))
        sa, sb = _sf_value(lbl_a), _sf_value(lbl_b)
        mult = (sb / sa) if sa and sb else None
        head = f"## {lbl_a} -> {lbl_b}"
        if mult is not None:
            head += f" ({mult:g}x data; ratio > {1.5 * mult:g} flagged)"
        lines += [head, ""]
        lines.append(f"| query | {lbl_a} s | {lbl_b} s | ratio | verdict |")
        lines.append("|---|---|---|---|---|")
        flagged = []
        for q in sorted(common, key=lambda q: -(qb[q] / qa[q])):
            ratio = qb[q] / qa[q]
            if mult is None:
                verdict = ""
            elif ratio > 1.5 * mult:
                verdict = "SUPERLINEAR"
                flagged.append(q)
            elif ratio <= mult:
                verdict = "at-most-linear"
            else:
                verdict = "near-linear"
            lines.append(
                f"| {q} | {qa[q]:.2f} | {qb[q]:.2f} | {ratio:.1f}x |"
                f" {verdict} |")
        lines.append("")
        if mult is not None:
            lines.append(
                f"Flagged (> {1.5 * mult:g}x at {mult:g}x data): "
                + (", ".join(flagged) if flagged else "none"))
            lines.append("")
    if footnotes:
        lines.append("## Notes")
        lines.append("")
        lines += [f"- {note}" for note in footnotes]
        lines.append("")
    return "\n".join(lines) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--pair", action="append", required=True,
        help="label=path, smallest SF first (repeatable)")
    ap.add_argument("--out", default=None, help="write here instead of stdout")
    ap.add_argument(
        "--footnote", action="append", default=None,
        help="verbatim bullet appended under a '## Notes' section "
        "(repeatable); use for pointers to sibling generated reports, "
        "never for numbers (numbers belong in generated rows)")
    args = ap.parse_args()
    pairs = []
    for spec in args.pair:
        lbl, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--pair wants label=path, got {spec!r}")
        pairs.append((lbl, path))
    report = build_report(pairs, footnotes=args.footnote)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(report)
        print(f"wrote {args.out}")
    else:
        print(report, end="")


if __name__ == "__main__":
    main()
