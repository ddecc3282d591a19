"""Render a bench.py JSON line as a BENCH.md markdown table, optionally
with movement vs an earlier round's JSON (VERDICT r4 #1: the round-4
driver capture truncated and lost most medians — from round 5 on, the
full-suite JSON is committed in-tree and the table is generated from it,
so the evidence survives any capture truncation).

Usage: python tools/bench_table.py tools/bench_r5.json [prev.json]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read().strip()
    try:  # driver artifact: {"n":..., "tail":..., "parsed": {bench json}}
        obj = json.loads(txt)
        return obj["parsed"] if "parsed" in obj else obj
    except json.JSONDecodeError:
        pass
    # raw bench.py stdout: progress noise + ONE JSON line
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise ValueError(f"no bench JSON found in {path}")


def main() -> None:
    cur = load(sys.argv[1])
    prev = load(sys.argv[2]) if len(sys.argv) > 2 else None
    single = set(cur.get("single_pass", []))
    spread = cur.get("spread", {})
    pq = (prev or {}).get("queries", {})

    hdr = "| entry | median s | spread | note |"
    sep = "|---|---|---|---|"
    if prev:
        hdr = "| entry | median s | spread | prev s | movement | note |"
        sep = "|---|---|---|---|---|---|"
    print(hdr)
    print(sep)
    for name, med in cur["queries"].items():
        note = "single-pass (stateful)" if name in single else ""
        sp = f"{spread[name]:.3f}" if name in spread else "—"
        if prev:
            p = pq.get(name)
            mov = f"{(med / p - 1) * +100:+.0f}%" if p else "new"
            print(f"| {name} | {med} | {sp} | {p if p is not None else '—'} | {mov} | {note} |")
        else:
            print(f"| {name} | {med} | {sp} | {note} |")
    print()
    print(
        f"Suite total (sum of medians): **{cur['value']} s** over "
        f"{len(cur['queries'])} entries, {cur.get('passes', '?')} interleaved "
        f"passes, sf={cur.get('sf')}, wall {cur.get('extra', {}).get('wall_sec')} s."
    )
    extra = {k: v for k, v in cur.get("extra", {}).items() if k != "wall_sec"}
    if extra:
        print(f"Extra metrics: {json.dumps(extra)}")


if __name__ == "__main__":
    main()
