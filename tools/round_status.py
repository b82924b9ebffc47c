"""Round-close status generator — the single source of truth for the
counts that COVERAGE.md / README.md round sections quote.

The r13 verdict (#6) found the staged count hand-written as "16" while
``registry.STAGED_DECLARED_ROUND`` held 15; load-bearing counts (the
rotation arithmetic depends on the staged count) must be emitted by
tooling, not copied by hand. Run::

    python tools/round_status.py

and paste the block into the round-close docs. Also prints the rotation
budget forecast for the next MAX_GATE_STALENESS rounds so the window
policy (COVERAGE.md §rotation-budget) can be checked against reality
each round.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from distributed_graph_database_simulation_spark import registry  # noqa: E402

MAX_GATE_STALENESS = 8  # mirrored in tests/test_registry_window.py


def last_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") or row.get("err") == "no_oracle":
                    last[name] = max(last.get(name, 0), rnd)
    return last


def main() -> None:
    q = registry.queries()
    oracles = registry.oracle_sql()
    window = list(q)[: registry.CHECK_WINDOW]
    staged = dict(sorted(registry.STAGED_DECLARED_ROUND.items()))
    last = last_green()

    print(f"registry entries:        {len(q)}")
    print(f"with exact oracles:      {len(oracles)}")
    print(f"rows-only by design:     {sorted(set(q) - set(oracles))}")
    print(f"gate round (committed):  {registry.GATE_ROUND}")
    print(f"gate window:             {len(window)} entries")
    print(f"staged (next rotation):  {len(staged)}")
    for name, rnd in staged.items():
        print(f"  - {name} (declared r{rnd}, row due by r{rnd + 2})")
    never = sorted(set(q) - set(last))
    print(f"never driver-gated:      {len(never)}")

    # Rotation budget forecast: greedy simulation. Assume THIS window
    # gates green; each future round fills the window with the 2 graph
    # essentials, that round's assumed staged debuts, then the oldest
    # remaining vintages. A round goes red if the staleness-DUE set alone
    # (entries whose last row is exactly MAX_GATE_STALENESS old) exceeds
    # the slots — that's the burst the pre-gating convention exists to
    # smooth.
    post = dict(last)
    for name in window:
        post[name] = registry.GATE_ROUND
    growth = int(os.environ.get("ROUND_STATUS_GROWTH", "10"))
    print(f"\nrotation budget simulation (greedy oldest-first, "
          f"{growth} staged debuts/round, horizon {MAX_GATE_STALENESS} rounds):")
    vint = Counter(post[n] for n in q if n in post)
    essentials = 2
    for future in range(registry.GATE_ROUND + 1,
                        registry.GATE_ROUND + 1 + MAX_GATE_STALENESS):
        slots = registry.CHECK_WINDOW - essentials - growth
        due = sum(c for r, c in vint.items() if r <= future - MAX_GATE_STALENESS)
        # gate the oldest `slots` entries this round
        gated = 0
        for r in sorted(vint):
            take = min(vint[r], slots - gated)
            vint[r] -= take
            gated += take
            if gated == slots:
                break
        vint += Counter()  # drop zeros
        vint[future] += gated + growth  # re-gated + this round's debuts
        status = "OK" if due <= slots else f"RED (due {due} > slots {slots})"
        print(f"  r{future}: {due} due / {slots} re-gate slots -> {status}")
    total = sum(vint.values())
    print(f"  registry at horizon: {total} entries "
          f"(capacity per {MAX_GATE_STALENESS} rounds: "
          f"{(registry.CHECK_WINDOW - essentials) * MAX_GATE_STALENESS})")


if __name__ == "__main__":
    main()
