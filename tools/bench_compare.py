"""Round-over-round bench comparison that respects `host_quiet`.

Usage::

    python tools/bench_compare.py FULLBENCH_r13.json FULLBENCH_r14.json

Compares per-query medians over the COMMON query set and prints the total
and median ratios (new/old) plus the biggest movers. Honesty gate (r13
verdict #7): if either artifact was captured on a loaded host
(``host.host_quiet`` false, or loadavg_1m > 2.0 for pre-r14 artifacts
that lack the bit), the comparison is REFUSED unless ``--force`` is
given, and with ``--force`` the output is labeled non-comparative —
the r12/r13 rounds each burned a session adjudicating phantom
regressions from exactly this confound.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _quiet(payload: dict, path: str) -> tuple[bool, str]:
    host = payload.get("host") or {}
    if "host_quiet" in host:
        return bool(host["host_quiet"]), f"host_quiet={host['host_quiet']}"
    load = host.get("loadavg_start", host.get("loadavg_1m"))
    if load is None:
        return False, "no host fingerprint"
    return load <= 2.0, f"loadavg={load} (pre-host_quiet artifact)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--force", action="store_true",
                    help="compare anyway; output labeled non-comparative")
    ap.add_argument("--top", type=int, default=8, help="movers to print")
    args = ap.parse_args()

    old, new = _load(args.old), _load(args.new)
    labels = []
    for path, payload in ((args.old, old), (args.new, new)):
        ok, why = _quiet(payload, path)
        labels.append((path, ok, why))
    loaded = [(p, why) for p, ok, why in labels if not ok]
    if loaded and not args.force:
        for p, why in loaded:
            print(f"REFUSED: {p} was not a quiet-host capture ({why}); "
                  f"re-capture or pass --force for a NON-COMPARATIVE look",
                  file=sys.stderr)
        return 2

    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qo) & set(qn))
    if not common:
        print("no common queries", file=sys.stderr)
        return 1
    to, tn = sum(qo[n] for n in common), sum(qn[n] for n in common)
    ratios = {n: (qn[n] / qo[n]) if qo[n] > 0 else float("inf") for n in common}
    med = statistics.median(ratios.values())
    tag = " [NON-COMPARATIVE: loaded host]" if loaded else ""
    print(f"common queries: {len(common)}{tag}")
    print(f"total: {to:.1f} s -> {tn:.1f} s = {tn / to:.3f}x")
    print(f"median per-query ratio: {med:.3f}x")
    movers = sorted(common, key=lambda n: ratios[n])
    print("biggest improvements:")
    for n in movers[: args.top]:
        print(f"  {n}: {qo[n]:.2f} -> {qn[n]:.2f} ({ratios[n]:.2f}x)")
    print("biggest regressions:")
    for n in movers[-args.top:][::-1]:
        print(f"  {n}: {qo[n]:.2f} -> {qn[n]:.2f} ({ratios[n]:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
