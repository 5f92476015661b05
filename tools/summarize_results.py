"""Aggregate evaluation summary_*.json files into one markdown table.

Each summary (written by tools/evaluation.py, format of the reference's
final evaluation dict: metric -> {"ground truth": [mean, ci],
"text2motion": [mean, ci]}) becomes one row; the ground-truth row of the
first file is printed once on top as the anchor. Used to assemble the
results/ experiment tables (rms_run, cfg_run, strong_op).

Usage:
  python tools/summarize_results.py /tmp/eqrun3/result/*/latest/summary_*.json
  python tools/summarize_results.py --label-regex 'summary_(.*)\\.json' FILES...
"""

import argparse
import json
import re

METRICS = ["Acc", "Consistency", "FID", "Diversity", "MultiModality"]


def cell(pair, digits=4):
    mean, ci = pair
    return f"{mean:.{digits}g}±{ci:.3g}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--label-regex", default=r"summary_?(.*)\.json",
                    help="regex over the path; group 1 is the row label")
    args = ap.parse_args()

    rows = []
    for path in args.files:
        data = json.load(open(path))
        m = re.search(args.label_regex, path)
        label = m.group(1) if m else path
        rows.append((label or "(default)", path, data))

    header = "| run | " + " | ".join(METRICS) + " |"
    print(header)
    print("|" + "---|" * (len(METRICS) + 1))
    gt = rows[0][2]
    print("| ground truth | " + " | ".join(
        cell(gt[k]["ground truth"]) for k in METRICS) + " |")
    for label, _, data in rows:
        print(f"| {label} | " + " | ".join(
            cell(data[k]["text2motion"]) for k in METRICS) + " |")


if __name__ == "__main__":
    main()
