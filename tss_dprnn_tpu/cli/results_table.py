"""Aggregate final_metrics.json files into the reference README's results
table (reference README.md:36-45 is hand-transcribed from
metrics/*/final_metrics.json; this renders it mechanically).

    python -m tss_dprnn_tpu.cli.results_table metrics/**/final_metrics*.json
    python -m tss_dprnn_tpu.cli.results_table --compare-reference metrics/...
"""

from __future__ import annotations

import argparse
import json
import os


def load_rows(paths):
    rows = []
    for p in paths:
        with open(p) as f:
            m = json.load(f)
        label = os.path.relpath(p).replace("/final_metrics", " ").replace(".json", "")
        rows.append((label, m))
    return rows


def render(rows, reference_rows=None):
    cols = ["si_sdr", "si_sdr_imp", "pesq", "stoi"]
    header = "| model | SI-SDR | SI-SDRi | PESQ | STOI |"
    sep = "|---|---|---|---|---|"
    lines = [header, sep]
    refmap = dict(reference_rows or [])
    for label, m in rows:
        cells = []
        for c in cols:
            v = m.get(c)
            cells.append("—" if v is None else f"{v:.2f}" if "stoi" not in c else f"{v:.3f}")
        line = f"| {label} | " + " | ".join(cells) + " |"
        lines.append(line)
        ref = refmap.get(label)
        if ref:
            delta = {c: (m.get(c) - ref.get(c)) for c in cols
                     if m.get(c) is not None and ref.get(c) is not None}
            lines.append(
                "| ↳ Δ vs reference | "
                + " | ".join(f"{delta.get(c, 0):+.2f}" if c in delta else "—" for c in cols)
                + " |"
            )
    return "\n".join(lines)


REFERENCE_METRICS = "/root/reference/metrics"


def reference_rows():
    """The reference's shipped metric JSONs, when mounted."""
    rows = []
    if not os.path.isdir(REFERENCE_METRICS):
        return rows
    for root, _, files in os.walk(REFERENCE_METRICS):
        for f in sorted(files):
            if f.startswith("final_metrics") and f.endswith(".json"):
                p = os.path.join(root, f)
                with open(p) as fh:
                    rows.append((os.path.relpath(p, REFERENCE_METRICS)
                                 .replace("/final_metrics", " ").replace(".json", ""),
                                 json.load(fh)))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description="render a results table from final_metrics.json files")
    ap.add_argument("paths", nargs="*", help="final_metrics.json files")
    ap.add_argument("--reference", action="store_true",
                    help="also print the reference's shipped table")
    args = ap.parse_args(argv)
    if args.paths:
        print(render(load_rows(args.paths)))
    if args.reference or not args.paths:
        rows = reference_rows()
        if rows:
            print("\nReference (shipped metrics/):")
            print(render(rows))
    return 0


if __name__ == "__main__":
    main()
