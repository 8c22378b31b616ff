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
    """One run per ``test:`` config-dump section (each eval run logs its merged
    config, tools/main.py). The reference parser gates on the ``  test:`` line
    and consumes the first mask_dir_name/split after it
    (``/root/reference/tools/extract_results.py:29-40``) so the train section's
    own mask_dir_name/split keys are ignored; same discipline here."""
    runs: list[dict] = []
    current: dict = {}
    in_metrics = 0
    in_test_section = 0  # >0: accept the next mask/split keys (2 max)
    test_indent = 0      # indent of the arming ``test:`` line
    with open(path) as f:
        for line in f:
            m = re.search(r"(^|\n)(\s+)test:\s*$", line)
            if m:
                if current.get("metrics"):
                    runs.append(current)
                current = {"masks": "", "split": "", "metrics": {}}
                in_test_section = 2
                test_indent = len(m.group(2).expandtabs())
                continue
            # disarm on dedent to (or above) the ``test:`` level: a sibling
            # section header (e.g. ``train:``) ends the test block even if a
            # dumped section lacked one of the two keys (reference section
            # gating, /root/reference/tools/extract_results.py:29-40)
            if in_test_section > 0 and line.strip():
                expanded = line.expandtabs()
                if len(expanded) - len(expanded.lstrip()) <= test_indent:
                    in_test_section = 0
            if in_test_section > 0:
                m = re.search(r"mask_dir_name[=:]\s*(\S+)", line)
                if m:
                    current["masks"] = m.group(1).replace("masks_matched_", "")
                    in_test_section -= 1
                m = re.search(r"\bsplit[=:]\s*(\S+)", line)
                if m:
                    current["split"] = m.group(1)
                    in_test_section -= 1
            if "Metrics:" in line:
                in_metrics = 12
                continue
            if in_metrics > 0:
                in_metrics -= 1
                # value charset includes nan/inf (the reference parser also
                # float()s whatever follows the colon, extract_results.py:47)
                m = re.match(r".*?(\w+):\s*([-+\d.eE]+|nan|inf|-inf)\s*$", line)
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
