#!/usr/bin/env python3
"""Compare a graft.Bench JSON line against the recorded baseline.

Usage:
  tools/run.sh graft.Bench [...] | tail -1 > /tmp/bench.json
  python3 tools/bench_compare.py /tmp/bench.json [baseline.json]

The baseline defaults to the last ```json block in BASELINE.md. Prints
per-query ratios sorted worst-first and flags >1.5x regressions; exits
non-zero if the total exceeds 2x (the driver's bar).

Ledger mode (round 16 — machine-checked calibration-normalized movers;
replaces the prose host-steal attributions):

  python3 tools/bench_compare.py --ledger OLD_LEDGER.md NEW_LEDGER.md

Parses both machine-written bench ledgers (header carries calib_mt),
normalizes each query's task-seconds by its session's calib_mt (work
units per host-throughput yardstick) and prints a markdown MOVERS
table of queries whose normalized cost moved >1.5x either way, plus
adds/drops. Paste the table into SCALE.md under the anchor; bouncer
claims should cite it.
"""
import json
import pathlib
import re
import sys


def parse_ledger(path):
    text = pathlib.Path(path).read_text()
    m = re.search(r"calib_mt=([0-9.]+)", text)
    if not m:
        sys.exit(f"{path}: no calib_mt in header")
    calib = float(m.group(1))
    rows = {}
    for line in text.splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) >= 9 and cells[0] not in ("query", "---") \
                and not cells[0].startswith("-"):
            try:
                rows[cells[0]] = {"sec": float(cells[1]),
                                  "task_sec": float(cells[5]),
                                  "shuffle_mb": float(cells[7])}
            except ValueError:
                continue
    return calib, rows


def ledger_movers(old_path, new_path, threshold=1.5):
    old_calib, old = parse_ledger(old_path)
    new_calib, new = parse_ledger(new_path)
    print(f"Calib-normalized movers: {old_path} (calib_mt={old_calib}) -> "
          f"{new_path} (calib_mt={new_calib}); flag = normalized "
          f"task-cost ratio > {threshold}x either way\n")
    print("| query | task_s old | task_s new | norm ratio | wall ratio | shuffle_mb old->new |")
    print("|---|---|---|---|---|---|")
    movers = []
    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        if o["task_sec"] <= 0.05 or n["task_sec"] <= 0.05:
            continue  # sub-noise task time: ratio is meaningless
        ratio = (n["task_sec"] / new_calib) / (o["task_sec"] / old_calib)
        if ratio > threshold or ratio < 1 / threshold:
            movers.append((ratio, q, o, n))
    for ratio, q, o, n in sorted(movers, key=lambda t: -t[0]):
        wall = n["sec"] / o["sec"] if o["sec"] > 0 else float("inf")
        print(f"| {q} | {o['task_sec']:.1f} | {n['task_sec']:.1f} | "
              f"{ratio:.2f}x | {wall:.2f}x | "
              f"{o['shuffle_mb']:.0f}->{n['shuffle_mb']:.0f} |")
    if not movers:
        print("| (none) | | | | | |")
    added = sorted(set(new) - set(old))
    dropped = sorted(set(old) - set(new))
    if added:
        print(f"\nadded: {', '.join(added)}")
    if dropped:
        print(f"\ndropped: {', '.join(dropped)}")


def load_baseline(path):
    if path.suffix == ".json":
        return json.loads(path.read_text())
    blocks = re.findall(r"```json\n(\{.*?\})\n```", path.read_text(), re.S)
    if not blocks:
        sys.exit(f"no ```json block found in {path}")
    return json.loads(blocks[-1])


def main():
    if sys.argv[1] == "--ledger":
        ledger_movers(sys.argv[2], sys.argv[3])
        return
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
