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
import os
import statistics
import subprocess
import sys
import tempfile

# The same-host code-vs-code adjudication subset (r14 verdict #6): the
# historically noisiest / heaviest headline entries plus one
# representative per operator family, so a cross-round wall-clock dispute
# resolves with ONE command instead of a hand-built names file. The r14
# round settled a phantom 1.39x full-replay "regression" with exactly
# this shape of subset (SCALE.md, round-14 adjudication).
ADJUDICATION_SUBSET = (
    "g_hyperball_harmonic_est",   # worst r14 full-replay mover (9.2x noise)
    "stream_dedup_ingest",        # slowest headline entry three rounds running
    "stream_cms_ingest",
    "g_walk_skipgram_pairs",
    "pipe_end_to_end",
    "sim_ivf_index_append",
    "stream_crawl_diff_ingest",
    "mm_jpeg_decode",
    "pipe_corpus_clean_pack",
    "g_hits_scale",
    "dedup_cluster_representatives",
    "rel_scd2",
    "text_keywords",
    "g_butterflies",
)


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _run_bench(tree: str, names_file: str, sf_dir: str) -> dict:
    """Run bench.py --names-from in `tree`, return its JSON payload."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py"),
         "--names-from", names_file],
        capture_output=True, text=True, env=env, cwd=tree, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench in {tree} failed:\n{out.stderr[-2000:]}")
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    # bench prints the full artifact line first, then a summary line;
    # take the one that carries per-query timings
    for ln in lines:
        payload = json.loads(ln)
        if "queries" in payload:
            return payload
    raise RuntimeError(f"no bench JSON with queries in {tree} output")


def adjudicate(old_ref: str, sf_dir: str, out_path: str | None) -> int:
    """Same-host code-vs-code: check out `old_ref` into a worktree, run
    the ADJUDICATION_SUBSET through bench.py in both trees back-to-back
    on THIS host, and print totals + median per-query ratio. This is the
    decisive test for any cross-round wall-clock delta — artifact-vs-
    artifact comparisons confound code with VM drift."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names_file = tempfile.mktemp(suffix=".json", prefix="dgds_adj_names_")
    with open(names_file, "w") as f:
        json.dump({"queries": {n: 0 for n in ADJUDICATION_SUBSET}}, f)
    old_tree = tempfile.mkdtemp(prefix="dgds_adj_old_")
    subprocess.run(["git", "worktree", "add", "-f", old_tree, old_ref],
                   cwd=repo, check=True, capture_output=True)
    try:
        new_run = _run_bench(repo, names_file, sf_dir)
        old_run = _run_bench(old_tree, names_file, sf_dir)
        # second interleave to damp session-position noise
        new_run2 = _run_bench(repo, names_file, sf_dir)
        old_run2 = _run_bench(old_tree, names_file, sf_dir)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", old_tree],
                       cwd=repo, capture_output=True)
        os.unlink(names_file)
    qo = {n: min(old_run["queries"].get(n, float("inf")),
                 old_run2["queries"].get(n, float("inf")))
          for n in ADJUDICATION_SUBSET}
    qn = {n: min(new_run["queries"].get(n, float("inf")),
                 new_run2["queries"].get(n, float("inf")))
          for n in ADJUDICATION_SUBSET}
    common = [n for n in ADJUDICATION_SUBSET
              if qo[n] != float("inf") and qn[n] != float("inf")]
    to, tn = sum(qo[n] for n in common), sum(qn[n] for n in common)
    ratios = {n: qn[n] / qo[n] for n in common if qo[n] > 0}
    med = statistics.median(ratios.values())
    result = {
        "adjudication": {
            "old_ref": old_ref, "subset": common,
            "old_sec": {n: qo[n] for n in common},
            "new_sec": {n: qn[n] for n in common},
            "old_total": round(to, 2), "new_total": round(tn, 2),
            "total_ratio": round(tn / to, 3) if to else None,
            "median_ratio": round(med, 3),
            "host": new_run.get("host"),
        }
    }
    print(json.dumps(result))
    print(f"code-vs-code ({len(common)} q, same host): old {to:.1f} s -> "
          f"new {tn:.1f} s = {tn / to:.3f}x; median per-query {med:.3f}x",
          file=sys.stderr)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    return 0


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
    ap.add_argument("old", help="old BENCH artifact, or a git ref with --adjudicate")
    ap.add_argument("new", nargs="?", help="new BENCH artifact (artifact mode)")
    ap.add_argument("--adjudicate", action="store_true",
                    help="treat OLD as a git ref: run the canonical "
                         "ADJUDICATION_SUBSET through bench.py in both that "
                         "ref's worktree and this tree, same host, and report "
                         "the code-vs-code ratio")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None,
                    help="with --adjudicate: also write the JSON block here")
    ap.add_argument("--force", action="store_true",
                    help="compare anyway; output labeled non-comparative")
    ap.add_argument("--top", type=int, default=8, help="movers to print")
    args = ap.parse_args()

    if args.adjudicate:
        return adjudicate(args.old, args.sf, args.out)
    if args.new is None:
        ap.error("artifact mode needs OLD and NEW artifact paths")

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
