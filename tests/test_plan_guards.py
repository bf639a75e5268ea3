"""Plan-shape regression guards over the contract queries.

Automates the anti-pattern sweep the round reviews run by hand, as a
cheap planning-only test (nothing executes):

1. NO `CartesianProduct` anywhere — the all-pairs failure mode every
   LSH/banding design here exists to avoid.  Today the whole 126-query
   surface plans zero of them; any appearance is a regression.
2. `BroadcastNestedLoopJoin` only on the explicit allowlist — every
   entry is either a 1-row broadcast bounds/totals frame (`crossJoin`
   against a single aggregated row) or a guarded exact baseline whose
   quadratic side is capped by construction.  A BNLJ outside the list
   means a join lost its equi-condition or broadcast hint.
3. The FK/star checks must broadcast the deduped dim keys (a
   sort-merge join there would shuffle the fact table).
4. The flagship single-pass validate contains no join of any kind.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# queries whose plans legitimately contain a BroadcastNestedLoopJoin:
# 1-row broadcast bounds/totals/model frames, or guarded exact baselines
ALLOWED_BNLJ = {
    "ann_topk_embeddings",       # guarded brute-force baseline
    "lsh_recall_embeddings",     # exact side capped/sampled
    "jaccard_pairs_documents",   # minhash signature constants frame
    "containment_pairs_documents",
    "winsorize_lineitem",        # 1-row exact-percentile bounds
    "sketchbins_documents",      # 1-row quantile-edges frame
    "separation_embeddings",     # G^2 label-pair cross on the tiny
                                 # (labels x d) centroid frame, broadcast
    "drift_events", "ks_events", "psi_documents",
    "psi_timeline_events",       # 1-row totals frames
    "lmscore_documents",         # 1-row (N, V) totals
    "match_documents",           # 1-row scarcest-bin bottleneck
    "card_documents",            # 1-row corpus totals
    "temperature_documents",     # 1-row stratum totals
    "pii_documents",             # 1-row residual totals
    "quarantine_counts_lineitem",
    "bloom_documents",           # broadcast dense filter row
    "zorder_events",             # 1-row min/max bounds
    "join_card_lineitem",        # two 1-row multiplicity summaries
    "search_documents", "rerank_documents",
    "bm25_documents",            # 1-row idf/df/avgdl frames
    "nbclassify_documents",      # tiny label-list cross
    "synthesize_validate",       # 1-row synthesis bounds
    "bigram_documents",          # 1-row smoothing-vocab totals
    # resemblance_documents pruned r12: the exact path now derives the
    # minima and set arithmetic from one grouped hash frame — no
    # crossJoin left in the plan
    "dsir_scores_documents",     # 1-row broadcast log-ratio model array
    "dsir_sample_documents",     # same model row (+1-row threshold in frac path)
    "qann_embeddings",           # guarded brute-force baseline: broadcast
                                 # query side capped by max_queries
    "standardize_lineitem",      # 1-row median/IQR bounds frame
    "trimmedmean_lineitem",      # 1-row percentile-band bounds frame
    "targetenc_events",          # 1-row global-prior cross onto the
                                 # k-row fitted encoder frame
    "triangles_part",            # two 1-row summary frames crossed
                                 # (degree stats x triangle count)
    "classweights_events",       # 1-row totals + 1-row raw-weight sum
                                 # crossed onto the k-row class frame
    "kruskal_events",            # 1-row tie-correction total crossed
                                 # onto the k-row group rank-sum frame
    "benford_lineitem",          # 1-row digit-count total crossed onto
    "benfordsum_lineitem",       # the fixed 9-row digit spine (and the
    "fdrbenford_lineitem",       # BH composite built on the same frame)
    "acf_events",                # 1-row series-moments frame (mean +
                                 # denominator) crossed onto the
                                 # bucket-grain series before the
                                 # equi-join on idx+lag
    "kappa_lineitem",            # 1-row chance-agreement numerator
                                 # crossed onto the 1-row totals frame
    "fleisskappa_orders",        # 1-row label-marginal p_e frame
                                 # crossed onto the 1-row p_bar frame
    "rankeval_embeddings",       # guarded brute-force ANN baseline
                                 # (broadcast query side capped by
                                 # max_query_rows), same as qann
    "lorenz_lineitem",           # 1-row (n, total) frame crossed onto
                                 # the value-grain cumulative frame
    "coverage_part",             # 1-row total crossed onto the k-row
                                 # TakeOrdered head
    "qq_events",                 # 1-row (n_a, n_b) group totals
                                 # crossed onto the value-grain
                                 # cumulative frame
    "calib_events",              # 1-row ECE/MCE bin summary crossed
                                 # onto the 1-row Brier frame
    "pmi_documents",             # two 1-row corpus-total frames
                                 # (N_unigrams, N_bigrams) crossed onto
                                 # the min_count-filtered bigram frame
    "mediantest_events",         # 1-row pooled-median frame crossed
                                 # onto the filtered rows — the r12
                                 # fold of the eager .first() median
                                 # probe into one lazy plan
    "friedman_events",           # 1-row global-k frame crossed onto
                                 # the (block, treatment) cell grain —
                                 # the r11 fold of the two eager
                                 # .first() probes into one lazy plan
    "lift_events",               # 1-row sketch_bins decile-edges
                                 # frame crossed onto the scored rows
    "brandpairs_lineitem",       # 1-row basket-count denominator frame
                                 # crossed onto the pair stats — the r12
                                 # fold of the eager n_baskets count
    "heavyhitters_documents",    # 1-row token-total frame crossed onto
                                 # the candidate counts — the r12 fold
                                 # of the eager total count
    "joincard_approx_lineitem",  # 1-row exact-key-count frame crossed
                                 # onto the sketch row — the r12 fold of
                                 # two eager distinct counts
    "pagerank_orders",           # 1-row node-count frame crossed onto
                                 # the rank frame for the mean-1
                                 # normalization (r12 fold)
}


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(_spark_base):
    """Plan every contract query once (planning only, no execution)."""
    _spark_base.conf.set("spark.sql.ansi.enabled", "false")
    out = {}
    for name, fn in entrymod.queries().items():
        out[name] = _plan(fn(_spark_base, SF_DIR))
    return out


def test_no_cartesian_product_anywhere(plans):
    bad = sorted(n for n, p in plans.items() if "CartesianProduct" in p)
    assert not bad, f"cartesian product leaked into: {bad}"


def test_bnlj_only_on_one_row_broadcast_patterns(plans):
    bad = sorted(
        n for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in ALLOWED_BNLJ
    )
    assert not bad, (
        f"BroadcastNestedLoopJoin outside the 1-row-broadcast allowlist: "
        f"{bad} — a join lost its equi-condition, or a new 1-row cross "
        "needs an allowlist entry with a justification comment"
    )


def test_bnlj_allowlist_not_stale(plans):
    stale = sorted(
        n for n in ALLOWED_BNLJ
        if n in plans and "BroadcastNestedLoopJoin" not in plans[n]
    )
    assert not stale, (
        f"allowlist entries whose plans no longer cross-join: {stale} — "
        "prune them so future regressions aren't hidden"
    )


def test_fk_checks_broadcast_the_dim_side(plans):
    for name in ["fk_lineitem", "fk_supplier_region", "star_report"]:
        assert "BroadcastHashJoin" in plans[name], name
        assert "SortMergeJoin" not in plans[name], (
            f"{name}: FK check fell back to a sort-merge join — the "
            "fact table would shuffle; the deduped dim keys must "
            "broadcast"
        )


def test_balanced_shards_global_rank_is_range_partitioned(
    plans, _spark_base, monkeypatch
):
    """balanced_shards must rank via repartitionByRange + per-partition
    windows (the ordered.py two-pass idiom), never an un-partitioned
    window sorting every (id, cost) pair in ONE task.  An un-partitioned
    windowspec shows ONLY sort-ordered args (every arg carries ASC/DESC);
    such a spec may order the tiny #partitions-row offsets frame
    (``__pid``) but never the corpus cost column.

    Since the r12 determinism fix the ranked frame sits behind
    ``_pin_range_partitions`` (a lazy localCheckpoint), whose plan node
    is an RDD scan — the range exchange is no longer visible in the
    final query's explain.  So this guard (a) asserts the REAL plan
    carries the pin, and (b) re-plans with the pin stubbed to identity
    to assert the underlying lineage is still the range-partitioned
    two-pass construction."""
    import re

    import pandera_spark.operators.ranks as ranks_mod

    real_plan = plans["balanced_shards_documents"]
    assert "Scan ExistingRDD" in real_plan, (
        "balanced_shards lost its _pin_range_partitions checkpoint — "
        "the rank and counts branches may sample different range "
        "boundaries again (the r12 nondeterminism bug)"
    )
    monkeypatch.setattr(
        ranks_mod, "_pin_range_partitions", lambda df: df
    )
    plan = _plan(
        entrymod.queries()["balanced_shards_documents"](
            _spark_base, SF_DIR
        )
    )
    assert "rangepartitioning(toks" in plan, (
        "balanced_shards lost its repartitionByRange(cost desc, id) — "
        "the global rank is no longer range-partitioned"
    )
    def _split_top_level(s: str) -> list[str]:
        # split on commas at paren depth 0 only: nested calls inside a
        # sort key (cast/coalesce/...) carry commas that a bare split
        # would misread as extra (partition-looking) args
        out, depth, cur = [], 0, []
        for ch in s:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        tail = "".join(cur).strip()
        if tail:
            out.append(tail)
        return out

    for spec in re.findall(
        r"windowspecdefinition\((.*?)specifiedwindowframe", plan
    ):
        args = [a for a in _split_top_level(spec) if a]
        partitioned = any(
            " ASC" not in a and " DESC" not in a for a in args
        )
        if not partitioned:
            assert "toks" not in spec, (
                "un-partitioned window orders the corpus cost column — "
                f"single-task global sort regression: {spec}"
            )


def test_validate_plan_is_one_aggregate_no_join(plans):
    plan = plans["validate_lineitem"]
    for node in ["SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                 "BroadcastNestedLoopJoin"]:
        assert node not in plan, (node, "validate_lineitem")
