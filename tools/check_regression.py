"""Cross-campaign throughput regression guard (VERDICT r4 item 8).

Compares, for every (model, dataset, dtype) series in
``analysis/tpu_model_matrix.jsonl``, the LATEST appended row against the
previous one and flags drops beyond a threshold (default 10%) in training
examples/s or eval users/s. Run at the end of each bench campaign:

    python tools/check_regression.py [--threshold 0.10] [--write-report]

Exit code 1 when any regression is flagged, so campaign scripts can gate on
it. This is the check that would have caught the round-3 artifact/table
drift automatically (PARITY.md eval-roofline section).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MATRIX = os.path.join(REPO, "analysis", "tpu_model_matrix.jsonl")
REPORT = os.path.join(REPO, "analysis", "regression_report.md")


def _norm_dataset(s: str) -> str:
    # round-3 rows say "synthetic-baby(...)", later rounds "synthetic(...)"
    return (s or "").replace("synthetic-baby", "synthetic")


def load_series(path: str = MATRIX):
    series = {}
    with open(path) as f:
        for line_no, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            extra = row.get("extra") or {}
            model = row["metric"].split("_train_examples")[0]
            key = (model, _norm_dataset(extra.get("dataset", "")),
                   extra.get("dtype", "f32"))
            series.setdefault(key, []).append(
                {
                    "line": line_no,
                    "train_eps": row.get("value"),
                    "eval_ups": extra.get("eval_users_per_s"),
                }
            )
    return series


def check(threshold: float):
    series = load_series()
    flags, rows = [], []
    for key in sorted(series):
        hist = series[key]
        if len(hist) < 2:
            continue
        prev, cur = hist[-2], hist[-1]
        for field, label in (("train_eps", "train examples/s"),
                             ("eval_ups", "eval users/s")):
            p, c = prev.get(field), cur.get(field)
            if not p or not c:
                continue
            ratio = c / p
            row = {
                "model": key[0], "dataset": key[1], "dtype": key[2],
                "metric": label, "prev": p, "cur": c,
                "ratio": round(ratio, 3),
                "lines": (prev["line"], cur["line"]),
            }
            rows.append(row)
            if ratio < 1.0 - threshold:
                flags.append(row)
    return rows, flags


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.10,
                    help="flag drops beyond this fraction (default 0.10)")
    ap.add_argument("--write-report", action="store_true",
                    help=f"write {os.path.relpath(REPORT, REPO)}")
    args = ap.parse_args()

    rows, flags = check(args.threshold)
    for r in rows:
        mark = " <-- REGRESSION" if r in flags else ""
        print(f"{r['model']:12s} {r['dtype']:5s} {r['metric']:18s} "
              f"{r['prev']:>12.1f} -> {r['cur']:>12.1f}  "
              f"x{r['ratio']:.3f}{mark}")
    print(f"\n{len(rows)} series compared, {len(flags)} regression(s) "
          f"beyond {args.threshold:.0%}")

    if args.write_report:
        with open(REPORT, "w") as f:
            f.write("# Bench regression report\n\n")
            f.write(f"Threshold: {args.threshold:.0%} drop; latest vs "
                    "previous row per (model, dataset, dtype) series in "
                    "`tpu_model_matrix.jsonl`.\n\n")
            f.write("| model | dtype | metric | prev | latest | ratio | flag |\n")
            f.write("|---|---|---|---|---|---|---|\n")
            for r in rows:
                f.write(
                    f"| {r['model']} | {r['dtype']} | {r['metric']} | "
                    f"{r['prev']:.0f} | {r['cur']:.0f} | {r['ratio']:.3f} | "
                    f"{'REGRESSION' if r in flags else ''} |\n")
            f.write(f"\n{len(rows)} series compared, {len(flags)} "
                    f"regression(s).\n\nEval wall rates over the axon "
                    "tunnel swing with host load (PARITY.md eval "
                    "roofline); treat eval flags as a prompt to re-measure "
                    "with more passes, train flags as real.\n")
        print(f"report written to {REPORT}")
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
