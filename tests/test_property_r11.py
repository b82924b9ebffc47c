"""Property tests for the r11 operators (SURVEY.md §5 strategy): randomized
invariants via hypothesis against pure-Python references.

- bipartite projection == brute-force co-occurrence counting on arbitrary
  small incidence lists (cap large enough not to truncate), and the capped
  variant == brute force over each left's cap smallest rights;
- CMS point estimates are >= exact counts for arbitrary multisets (the
  one-sided guarantee holds on ANY data, not just the gate corpus) and the
  per-depth-row mass equals the multiset size exactly;
- epoch shuffle emits a PERMUTATION per epoch: every doc exactly once,
  positions dense per (epoch, shard).

Small inputs (sub-second jobs) so hypothesis can run dozens of examples.
"""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributed_graph_database_simulation_spark.operators.graph_analytics import (
    bipartite_project,
)
from distributed_graph_database_simulation_spark.operators.pipeline import (
    CMS_DEPTH,
    cms_point_estimates,
    cms_sketch,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

incidences = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 6)),
    min_size=1,
    max_size=30,
)


def _py_project(pairs, cap, min_weight=1):
    lr = sorted(set(pairs))
    by_left = {}
    for l, r in lr:
        by_left.setdefault(l, []).append(r)
    counts = Counter()
    for l, rs in by_left.items():
        for a, b in combinations(sorted(rs)[:cap], 2):
            counts[(a, b)] += 1
    return {k: v for k, v in counts.items() if v >= min_weight}


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@given(pairs=incidences, cap=st.integers(min_value=1, max_value=8))
@_SETTINGS
def test_bipartite_matches_bruteforce(sess, pairs, cap):
    df = sess.createDataFrame(pairs, "l int, r int")
    got = {
        (r.r_a, r.r_b): r.weight
        for r in bipartite_project(df, "l", "r", degree_cap=cap).collect()
    }
    assert got == _py_project(pairs, cap)


@given(pairs=incidences)
@_SETTINGS
def test_bipartite_uncapped_matches_bruteforce(sess, pairs):
    df = sess.createDataFrame(pairs, "l int, r int")
    got = {
        (r.r_a, r.r_b): r.weight
        for r in bipartite_project(df, "l", "r", degree_cap=None).collect()
    }
    assert got == _py_project(pairs, cap=10**9)


multisets = st.lists(st.text(alphabet="abcdef", min_size=1, max_size=3),
                     min_size=1, max_size=40)


@given(keys=multisets, width=st.sampled_from([4, 16, 64]))
@_SETTINGS
def test_cms_one_sided_and_mass(sess, keys, width):
    df = sess.createDataFrame([(k,) for k in keys], "key string")
    sk = cms_sketch(df, "key", width=width).localCheckpoint(eager=True)
    masses = [r.m for r in sk.groupBy("j").agg(F.sum("cnt").alias("m")).collect()]
    assert len(masses) == CMS_DEPTH and all(m == len(keys) for m in masses)
    exact = Counter(keys)
    est = {
        r.key: r.cms_est
        for r in cms_point_estimates(sk, df.distinct(), "key", width=width).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= n for k, n in exact.items())


@given(n_docs=st.integers(min_value=1, max_value=40),
       epochs=st.integers(min_value=1, max_value=3))
@_SETTINGS
def test_epoch_shuffle_is_permutation(sess, n_docs, epochs):
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        epoch_shuffle_df,
    )

    docs = sess.range(n_docs).select(F.col("id").alias("doc_id"))
    rows = epoch_shuffle_df(docs, epochs=epochs, shards=4).collect()
    assert len(rows) == n_docs * epochs
    for e in range(epochs):
        ep = [r for r in rows if r.epoch == e]
        assert sorted(r.doc_id for r in ep) == list(range(n_docs))
        by_shard = {}
        for r in ep:
            by_shard.setdefault(r.shard, []).append(r.pos)
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(len(poss)))  # dense, 0-based
