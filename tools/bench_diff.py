"""Compare two bench JSON records with calib_s normalization (r13).

Cross-round bench comparison is dominated by machine drift (SCALE.md
§Bench methodology: the same commit measured 1.35-1.7× slower hours
apart). bench.py stamps a pure-JVM machine anchor as ``calib_s``;
this tool normalizes the newer record's per-query times by the
calib ratio before diffing, so the printed deltas approximate
code-attributable change. Records without calib_s (pre-r13) diff raw
with a warning.

Usage: python tools/bench_diff.py BENCH_r12.json BENCH_r13.json
       [--threshold 1.25]   # only print |normalized ratio| past this
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Read either bench.py's own one-line JSON or the driver's
    BENCH_r{N}.json wrapper, whose 'tail' field holds the LAST chunk
    of bench stdout — possibly truncated at the FRONT, so per-query
    times are regex-scraped (entries cut off by the truncation are
    simply absent; diff on the shared parseable set)."""
    import re
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    tail = doc.get("tail", "")
    queries = {m.group(1): float(m.group(2)) for m in re.finditer(
        r'"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)', tail)}
    out = {"queries": {k: v for k, v in queries.items()
                       if k not in ("value", "sf", "calib_s")}}
    m = re.search(r'"calib_s"\s*:\s*([0-9.]+)', tail)
    if m:
        out["calib_s"] = float(m.group(1))
    return out


def main(old_path: str, new_path: str, threshold: float = 1.25) -> None:
    old, new = load(old_path), load(new_path)
    co, cn = old.get("calib_s"), new.get("calib_s")
    if co and cn:
        scale = co / cn      # >1: the new machine state is FASTER
        print(f"calib: {co}s -> {cn}s  "
              f"(machine ratio {cn / co:.2f}x; normalizing new times "
              f"by {scale:.3f})")
    else:
        scale = 1.0
        print("WARNING: calib_s missing from one record — diffing "
              "RAW times; expect ±40% machine noise on sub-second "
              "entries and +20-70% on the slow class (SCALE.md)")
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    rows = []
    for name in shared:
        a, b = qo[name], qn[name] * scale
        if a <= 0:
            continue
        rows.append((b / a, name, a, qn[name], b))
    rows.sort(reverse=True)
    total_o = sum(qo[n] for n in shared)
    total_n = sum(qn[n] for n in shared)
    print(f"shared entries: {len(shared)}; raw totals "
          f"{total_o:.1f}s -> {total_n:.1f}s; normalized new total "
          f"{total_n * scale:.1f}s ({total_n * scale / total_o:.2f}x)")
    flagged = [r for r in rows
               if r[0] >= threshold or r[0] <= 1 / threshold]
    if not flagged:
        print(f"no entry beyond {threshold}x after normalization")
    for ratio, name, a, raw_b, b in flagged:
        print(f"  {name}: {a:.2f}s -> {raw_b:.2f}s raw "
              f"({b:.2f}s normalized, {ratio:.2f}x)")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print("new entries: "
              + ", ".join(f"{n} ({qn[n]:.2f}s)" for n in only_new))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.25
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a
                        else sys.argv[sys.argv.index(a) + 1])
    main(args[0], args[1], thr)
