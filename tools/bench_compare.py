#!/usr/bin/env python3
"""Compare two BENCH_r*.json artifacts per query.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [ratio_flag]

Prints queries present in both with NEW/OLD ratio, sorted worst-first,
flags ratios above `ratio_flag` (default 1.5), and summarizes totals
over the COMMON query set (headline totals are incomparable when the
query count grew). Self-diagnosing load fields are echoed so an
inflated run is never mistaken for a regression (VERDICT r11 item 2).
"""
import json
import re
import sys


def load(path):
    """Accepts either Bench's own JSON line (bench_last.json) or the
    driver's BENCH_rN.json wrapper, whose `tail` field holds a
    front-TRUNCATED copy of that line — per-query pairs are recovered
    by regex, dropping the first (possibly clipped) pair.
    """
    d = json.load(open(path))
    if "queries" in d:
        return d
    tail = d.get("tail", "")
    pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9.]+)', tail)
    qname = re.compile(r"^(q\d|g\d|llm_|stream_)")
    qs = {k: float(v) for k, v in pairs[1:] if qname.match(k)}
    meta = {}
    for key in ("load_risk", "tainted", "loadavg_start", "value"):
        m = re.search(rf'"{key}":("?[^,"}}]+"?)', tail)
        if m:
            meta[key] = m.group(1).strip('"')
    return {"queries": qs, **meta}


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = load(old_p)
    new = load(new_p)
    for tag, d in (("old", old), ("new", new)):
        print(f"{tag}: total={d.get('value')}s n={len(d.get('queries', {}))} "
              f"load_risk={d.get('load_risk')} tainted={d.get('tainted')} "
              f"loadavg_start={d.get('loadavg_start')}")
    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qo) & set(qn))
    rows = [(qn[q] / qo[q] if qo[q] > 0 else float("inf"), q) for q in common]
    rows.sort(reverse=True)
    n_flagged = 0
    for r, q in rows:
        mark = " <-- FLAG" if r > flag else ""
        if mark:
            n_flagged += 1
        if mark or r == rows[0][0] or len(rows) <= 20:
            print(f"  {q}: {qo[q]:.2f}s -> {qn[q]:.2f}s ({r:.2f}x){mark}")
    tot_o = sum(qo[q] for q in common)
    tot_n = sum(qn[q] for q in common)
    print(f"common set: {len(common)} queries, {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x), {n_flagged} flagged above {flag}x")


if __name__ == "__main__":
    main()
