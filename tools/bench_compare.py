#!/usr/bin/env python3
"""Compare two bench artifacts, noise-band aware.

Three rounds of dedup-family forensics (PLANS.md r10-r13) were done by
hand from truncated artifacts; this tool does that work mechanically.

Accepts any mix of:
  - the one-line Bench stdout JSON ({"metric":"total",...,"queries":{...}});
  - a driver BENCH_r{N}.json wrapper ({"tail":"..."} — the query map is
    reconstructed from the possibly-truncated tail, truncation reported);
  - BENCH_DETAIL.json ({"pass_times":{...}} — per-query min of passes,
    cold passes flagged).

Usage: python3 tools/bench_compare.py OLD.json NEW.json [--band=0.6]

The noise band is the documented one (PLANS.md): sub-second queries
swing ±20-60% between identical-code runs, so only deltas that are BOTH
>60% relative and above an absolute floor are reported as movers. The
ratio is fixed at 60%; --band=<sec> sets the absolute floor
(default 0.3 s).
"""
import json
import re
import sys


def load(path):
    """-> (times: {name: sec}, meta: dict, truncated: bool)"""
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        # one-line stdout format possibly wrapped in logs: take the line
        lines = [l for l in raw.splitlines() if '"metric":"total"' in l]
        if not lines:
            raise SystemExit(f"unrecognized bench artifact shape: {path}")
        d = json.loads(re.sub(r"^\[info\] ", "", lines[-1]).strip())
    truncated = False
    if "pass_times" in d:  # BENCH_DETAIL.json
        times = {k: min(v) for k, v in d["pass_times"].items() if v}
        meta = {k: d[k] for k in ("pass_loadavg", "warmup_sec", "sf") if k in d}
        meta["pass_times"] = d["pass_times"]
        return times, meta, truncated
    if "queries" in d:  # full stdout line
        meta = {k: d[k] for k in ("loadavg", "pass_loadavg", "warmup_sec", "sf", "value")
                if k in d}
        meta["pass_times"] = d.get("pass_times", {})
        return dict(d["queries"]), meta, truncated
    if "tail" in d:  # driver wrapper, possibly truncated mid-map
        tail = d["tail"]
        times = {m.group(1): float(m.group(2))
                 for m in re.finditer(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', tail)}
        # drop artifact fields that regex-match like queries
        for k in ("value", "loadavg", "warmup_sec"):
            times.pop(k, None)
        truncated = not tail.lstrip().startswith("{")
        meta = {}
        for k in ("loadavg", "sf"):
            m = re.search(rf'"{k}":([0-9.]+|"[^"]*")', tail)
            if m:
                meta[k] = m.group(1).strip('"')
        return times, meta, truncated
    raise SystemExit(f"{path}: unrecognized bench artifact shape")


def main():
    argv = sys.argv[1:]
    band_abs = 0.3
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--band"):
            # accept both --band=0.6 and --band 0.6
            if "=" in a:
                band_abs = float(a.split("=", 1)[1])
            else:
                i += 1
                band_abs = float(argv[i])
        else:
            args.append(a)
        i += 1
    old_path, new_path = args
    old, old_meta, old_trunc = load(old_path)
    new, new_meta, new_trunc = load(new_path)

    for name, meta, trunc, path in ((("OLD",) + (old_meta, old_trunc, old_path)),
                                    (("NEW",) + (new_meta, new_trunc, new_path))):
        bits = [f"{len(old if name == 'OLD' else new)} queries"]
        if "loadavg" in meta:
            bits.append(f"loadavg {meta['loadavg']}")
        if "pass_loadavg" in meta:
            bits.append(f"pass loadavg {meta['pass_loadavg']}")
        if trunc:
            bits.append("TRUNCATED artifact — leading entries missing")
        print(f"{name} {path}: " + ", ".join(bits))

    shared = sorted(set(old) & set(new))
    print(f"\nshared {len(shared)}, only-old {sorted(set(old)-set(new))}, "
          f"only-new {sorted(set(new)-set(old))}")
    print(f"shared totals: {sum(old[q] for q in shared):.1f} s -> "
          f"{sum(new[q] for q in shared):.1f} s")

    movers = []
    for q in shared:
        a, b = old[q], new[q]
        if abs(b - a) > band_abs and (b > a * 1.6 or a > b * 1.6):
            movers.append((b - a, q, a, b))
    if movers:
        print("\nbeyond the documented noise band (>60% and "
              f">{band_abs} s):")
        for delta, q, a, b in sorted(movers, reverse=True):
            print(f"  {q:28s} {a:7.2f} -> {b:7.2f}  ({b/a:5.2f}x)")
    else:
        print("\nno per-query delta beyond the noise band")

    # cold-pass detection from per-pass data, the r12 llm_dedup_clusters
    # signature: one pass far above the other
    for name, meta in (("OLD", old_meta), ("NEW", new_meta)):
        suspicious = [(q, ts) for q, ts in meta.get("pass_times", {}).items()
                      if len(ts) >= 2 and max(ts) > 2 * min(ts) and max(ts) > 1.0]
        for q, ts in sorted(suspicious):
            print(f"{name} cold/contended pass: {q} passes={ts} — "
                  "quote the min, check that pass's loadavg")


if __name__ == "__main__":
    main()
