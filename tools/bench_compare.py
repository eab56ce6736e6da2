#!/usr/bin/env python3
"""Compare a graft.Bench JSON line against the recorded baseline.

Usage:
  tools/run.sh graft.Bench [...] | tail -1 > /tmp/bench.json
  python3 tools/bench_compare.py /tmp/bench.json [baseline.json]

The baseline defaults to the last ```json block in BASELINE.md. Prints
per-query ratios sorted worst-first and flags >1.5x regressions; exits
non-zero if the total exceeds 2x (the driver's bar).
"""
import json
import pathlib
import re
import sys


def load_baseline(path):
    if path.suffix == ".json":
        return json.loads(path.read_text())
    blocks = re.findall(r"```json\n(\{.*?\})\n```", path.read_text(), re.S)
    if not blocks:
        sys.exit(f"no ```json block found in {path}")
    return json.loads(blocks[-1])


def main():
    bench = json.loads(pathlib.Path(sys.argv[1]).read_text())
    base_path = pathlib.Path(sys.argv[2]) if len(sys.argv) > 2 else \
        pathlib.Path(__file__).resolve().parent.parent / "BASELINE.md"
    base = load_baseline(base_path)

    rows = []
    for q, t in sorted(bench["queries"].items()):
        b = base["queries"].get(q)
        rows.append((t / b if b else float("inf"), q, t, b))
    rows.sort(reverse=True)
    for ratio, q, t, b in rows:
        flag = ""
        if b is None:
            flag = "  NEW"
        elif ratio > 1.5:
            flag = "  <-- REGRESSION?"
        bs = f"{b:7.2f}" if b is not None else "      -"
        rs = f"{ratio:5.2f}x" if b is not None else "     -"
        print(f"{q:28s} {t:7.2f}s  base {bs}s  {rs}{flag}")

    total, btotal = bench["value"], base["value"]
    print(f"\n{'TOTAL':28s} {total:7.2f}s  base {btotal:7.2f}s  "
          f"{total / btotal:5.2f}x  ({len(bench['queries'])} vs "
          f"{len(base['queries'])} queries)")
    if total > 2 * btotal:
        sys.exit("total exceeds the 2x bar")


if __name__ == "__main__":
    main()
