#!/usr/bin/env python3
"""Compare two Bench JSON dumps (e.g. BENCH_r6.json vs a fresh run).

Usage: bench_diff.py OLD.json NEW.json [threshold]

Prints per-query median ratios for the common set, the common-set totals,
and flags regressions beyond the threshold (default 1.5x). Medians are
compared when present (the `medians` field records the 3-run median, the
regression-gate statistic); single-run `queries` values are the fallback.
Exit code 1 if any regression exceeds the threshold — usable as a CI gate.
"""
import json
import sys


def load(path):
    """Accept a raw Bench stdout capture OR the driver's BENCH_r{N}.json
    wrapper ({"tail": "...{metric line}...", "parsed": {...}})."""
    with open(path) as f:
        content = f.read()
    try:
        wrapper = json.loads(content)
        if isinstance(wrapper, dict) and "metric" in wrapper:
            return wrapper
        if isinstance(wrapper, dict):
            if wrapper.get("parsed"):
                return wrapper["parsed"]
            tail = wrapper.get("tail", "")
            i = tail.find('{"metric"')
            if i >= 0:
                j = tail.find("\\n", i)
                frag = tail[i:j if j > 0 else len(tail)]
                return json.loads(frag.encode().decode("unicode_escape"))
            raise SystemExit(f"{path}: driver wrapper holds no complete "
                             "bench line (truncated tail)")
    except json.JSONDecodeError:
        pass
    for line in content.splitlines():
        if '"metric"' in line:
            return json.loads(line[line.index("{"):])
    raise SystemExit(f"no bench JSON line in {path}")


def medians(b):
    return b.get("medians") or b["queries"]


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    om, nm = medians(old), medians(new)
    common = sorted(set(om) & set(nm))
    flagged = []
    print(f"{'query':28s} {'old':>8s} {'new':>8s} {'ratio':>6s}")
    for q in common:
        r = nm[q] / om[q] if om[q] > 0 else float("inf")
        mark = " <-- REGRESSION" if r > threshold else ""
        if r > threshold:
            flagged.append(q)
        print(f"{q:28s} {om[q]:8.2f} {nm[q]:8.2f} {r:6.2f}{mark}")
    to, tn = sum(om[q] for q in common), sum(nm[q] for q in common)
    print(f"\ncommon set: {len(common)} queries, total {to:.1f}s -> {tn:.1f}s "
          f"({tn / to:.2f}x)")
    only_new = sorted(set(nm) - set(om))
    if only_new:
        print(f"new-only queries ({len(only_new)}): "
              + ", ".join(f"{q}={nm[q]:.2f}s" for q in only_new))
    if flagged:
        print(f"\n{len(flagged)} regression(s) over {threshold}x: "
              + ", ".join(flagged))
        sys.exit(1)


if __name__ == "__main__":
    main()
