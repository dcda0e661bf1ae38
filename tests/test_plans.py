"""Physical-plan shape gates for the scale-critical queries.

Correctness gates can't see a plan regress from an equi hash join into a
nested-loop — results stay identical while the 100-TB cost explodes. These
tests pin the plan shapes the round-1 verdict audited:

- near-dup / LSH / minhash candidate generation must be EQUI joins
  (hash-partitionable), never BroadcastNestedLoopJoin or CartesianProduct;
- the IVF assignment stage is |V| x |C| BY DESIGN but only survives because
  the centroid side is broadcast — assert the broadcast actually happens;
- the brute-force cosine top-k is the one sanctioned nested-loop (it is the
  small-scale oracle, excluded from the bench headline).
"""

import pytest

from i_landsat8_swlst_spark import textops

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_embed_neardup_has_no_nested_loop(spark):
    plan = _plan(textops.q_embed_neardup(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan  # the band-bucket equi self-join


def test_minhash_lsh_pairs_has_no_nested_loop(spark):
    plan = _plan(textops.q_minhash_lsh_pairs(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_minhash_plan_has_single_aggregate_shuffle(spark):
    # the round-2 rewrite dropped the shingle distinct: the only exchange
    # left before the signature aggregate is the aggregate's own shuffle
    plan = _plan(textops.q_minhash_signatures(spark, SF_DIR))
    assert "Distinct" not in plan and "distinct" not in plan.lower().replace(
        "countdistinct", "")
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, f"expected <=1 hash exchange, plan had {n_exchanges}"


def test_ann_ivf_assignment_is_broadcast(spark):
    plan = _plan(textops.q_ann_ivf(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the candidate -> embedding rejoin stages stay equi
    assert "HashJoin" in plan


def test_hamming_join_is_equi(spark):
    from i_landsat8_swlst_spark import relational

    plan = _plan(relational.queries()["q_hamming_join"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan
