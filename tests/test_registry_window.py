"""Pins for the driver-facing correctness window and its local canary.

Round 3 lesson: environment drift (regenerated events.parquet) reached the
driver's gate before any repo-local check saw it. The canary
(``tools/check_oracles.py --window``) reproduces the driver's exact gate —
first CHECK_WINDOW registry entries, vanilla session. These tests pin the
window's structural invariants so a refactor can't silently shrink coverage
or push a never-certified operator out of the gate.
"""

import os
import subprocess
import sys

from distributed_graph_database_simulation_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def window_names():
    return list(registry.queries())[: registry.CHECK_WINDOW]


def test_window_is_exactly_check_window_entries():
    assert len(window_names()) == registry.CHECK_WINDOW == 50


def test_window_covers_every_family():
    prefixes = {n.split("_")[0] for n in window_names()}
    assert {"g", "dedup", "sim", "text", "mm", "rel", "stream"} <= prefixes


def test_r04_rotation_certifies_previously_unchecked_ops():
    w = window_names()
    assert "g_common_neighbors_scale" in w
    assert "text_shard_assign" in w
    # rotated-out entries remain registered (tail), just no longer gate rows
    q = registry.queries()
    assert "g_reachable" in q and "text_token_count" in q
    assert "g_reachable" not in w and "text_token_count" not in w


def test_every_window_entry_has_oracle_or_documented_rows_only():
    oracles = registry.oracle_sql()
    # rows-only-by-design set (SURVEY §5): traversal-order DFS, probabilistic
    # ANN recall. Everything else in the window must carry a DuckDB oracle.
    rows_only = {n for n in window_names() if n not in oracles}
    assert rows_only <= {"g_dfs_leaves", "sim_topk_lsh", "sim_topk_ivf"}


def test_canary_smoke_representative_window_queries():
    """End-to-end drift canary inside the suite: run one window entry per
    drift-prone family through the REAL vanilla-session gate at sf0.001.
    Round 3's regression (regenerated events.parquet -> TIMESTAMP_NTZ) broke
    exactly these query shapes while every repo check stayed green; this
    test makes `pytest tests/` fail the moment the testdata moves again."""
    names = [
        "rel_scalar_events",       # ts scalar arithmetic (unix_micros)
        "rel_event_sessions",      # ts lag-window sessionization
        "stream_dedup_events",     # withWatermark requires TIMESTAMP
        "dedup_exact",             # documents table shape
        "g_bfs_levels",            # fixture graph path
        "mm_image_features",       # binary payload plumbing
    ]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracles.py"),
         "--window", "--sf", "/root/testdata/sf0.001", "--keep-going", *names],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "0 fail" in out.stdout


def test_canary_window_flag_selects_gate_prefix():
    # --window + explicit names intersects, preserving gate membership: a
    # tail-only name under --window selects nothing (exit fast, no Spark job
    # beyond session startup is fine to pay once here).
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracles.py"),
         "--window", "g_reachable"],
        capture_output=True, text=True, timeout=180, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "0 fail" in out.stdout
    assert "g_reachable" not in out.stdout
