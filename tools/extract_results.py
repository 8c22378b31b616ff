"""Scrape eval logs into results.csv (reference ``tools/extract_results.py``).

Usage: python tools/extract_results.py <test-log_rank0.log> <output_dir>

Parses repeated eval runs in one log (the eval sweep scripts append runs for every
subset x mask-model combination) and emits one CSV row per run.
"""

from __future__ import annotations

import os
import re
import sys

METRIC_KEYS = ["MAD", "MAD_fg", "MAD_unk", "MSE", "SAD", "Grad", "Conn"]


def parse_log(path: str) -> list[dict]:
    runs: list[dict] = []
    current: dict = {}
    in_metrics = 0
    with open(path) as f:
        for line in f:
            m = re.search(r"mask_dir_name[=:]\s*(\S+)", line)
            if m and "masks" in m.group(1):
                if current.get("metrics"):
                    runs.append(current)
                current = {"masks": m.group(1).replace("masks_matched_", ""),
                           "split": current.get("split", ""), "metrics": {}}
            m = re.search(r"\bsplit[=:]\s*(\S+)", line)
            if m:
                current.setdefault("metrics", {})
                current["split"] = m.group(1)
            if "Metrics:" in line:
                in_metrics = 12
                continue
            if in_metrics > 0:
                in_metrics -= 1
                m = re.match(r".*?(\w+):\s*([-\d.eE]+)\s*$", line)
                if m and m.group(1) in METRIC_KEYS + ["MAD_bg", "dtSSD", "MESSDdt"]:
                    current.setdefault("metrics", {})[m.group(1)] = float(m.group(2))
    if current.get("metrics"):
        runs.append(current)
    return runs


def main():
    file_log, output_dir = sys.argv[1], sys.argv[2]
    os.makedirs(output_dir, exist_ok=True)
    runs = parse_log(file_log)
    out_path = os.path.join(output_dir, "results.csv")
    with open(out_path, "w") as f:
        f.write("split,masks," + ",".join(METRIC_KEYS) + "\n")
        for r in runs:
            row = [r.get("split", ""), r.get("masks", "")]
            row += [str(r["metrics"].get(k, "")) for k in METRIC_KEYS]
            f.write(",".join(row) + "\n")
    print(f"Wrote {len(runs)} rows to {out_path}")


if __name__ == "__main__":
    main()
