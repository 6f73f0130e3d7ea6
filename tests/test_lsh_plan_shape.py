"""Plan-shape CI for every ``*_lsh`` candidate join (VERDICT r11 item 2).

Round-11 found Catalyst folding a self-join band equality spelled over a
shared parent attribute to trivially-true — the candidate join silently
keyed on the signature alone (caught by hand in ops_wave104; fixed by
giving both sides distinct column names). That failure mode is invisible
to correctness tests on small fixtures (the sig is discriminating enough
alone) and only shows up as a quadratic-ish candidate blow-up at scale.
These tests pin, for every LSH-family candidate join, that:

  * the candidate self-join is an EQUI-join carrying BOTH keys
    (band + signature / block-index + block-value) — a fold-to-true
    regression drops the key count to 1 and fails the regex;
  * no CartesianProduct and no BroadcastNestedLoopJoin appears anywhere
    in the operator plan EXCEPT the documented 1-row scalar-attach BNLJ
    pattern (corpus-constant attach; build side is a single-row
    aggregate — VERDICT r11 audited these as the idiomatic spelling).

``llm_dedup_clusters_lsh`` / ``_apply_lsh`` / ``_keeper_lsh`` consume
``llm_dedup_near``'s pairs as their edge set and iterate over
localCheckpoint barriers, so their FINAL plans are lineage-truncated
(join shape invisible). Their candidate-join coverage is the
``llm_dedup_near`` pin; keeper additionally pins its own election joins.
"""

import contextlib
import io
import re

import pytest

from training_feed_kinesis_spark.registry import load_all

from .conftest import SF_DIR

_REGISTRY = load_all()


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _assert_two_key_equijoin(plan: str, key_a: str, key_b: str) -> None:
    """Both candidate keys must survive optimization on both join sides."""
    for side in ("Left", "Right"):
        pat = rf"{side} keys \[2\]: \[{key_a}#\d+L?, {key_b}#\d+L?\]"
        assert re.search(pat, plan), (
            f"candidate join lost a key: no `{side} keys [2]: "
            f"[{key_a}, {key_b}]` in plan — Catalyst may have folded the "
            f"{key_a} equality to trivially-true (the wave-104 regression)"
        )


def _bnlj_is_scalar_attach_only(plan: str) -> None:
    """BNLJ is allowed ONLY as the 1-row scalar-attach idiom: every
    BroadcastNestedLoopJoin node must be a Cross with no join condition
    (the corpus-constant attach); any conditioned BNLJ means an equi-join
    degenerated (lost its keys) and would be corpus × corpus at scale."""
    for m in re.finditer(
        r"\(\d+\) BroadcastNestedLoopJoin[^\n]*\n"
        r"Join type: ([^\n]+)\nJoin condition: ([^\n]+)",
        plan,
    ):
        jtype, jcond = m.group(1).strip(), m.group(2).strip()
        assert jtype == "Cross" and jcond == "None", (
            f"non-scalar-attach BNLJ in plan: type={jtype!r} cond={jcond!r} "
            "— an equi-join degenerated (lost its keys)"
        )


@pytest.mark.parametrize(
    "key,join_keys",
    [
        ("llm_dedup_near", ("band", "band_sig")),
        ("llm_simhash_pairs", ("k", "blk")),
        ("llm_dedup_embed_lsh", ("a_band", "b_band")),
    ],
)
def test_candidate_join_keeps_both_keys(spark, key, join_keys):
    plan = _plan(_REGISTRY[key].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    _bnlj_is_scalar_attach_only(plan)
    if key == "llm_dedup_embed_lsh":
        # distinct names per side (the r11 fix): left [a_band, a_sig],
        # right [b_band, b_sig]
        assert re.search(r"Left keys \[2\]: \[a_band#\d+L?, a_sig#\d+L?\]", plan)
        assert re.search(r"Right keys \[2\]: \[b_band#\d+L?, b_sig#\d+L?\]", plan)
    else:
        _assert_two_key_equijoin(plan, *join_keys)


def test_keeper_lsh_election_joins_are_keyed(spark):
    """keeper_lsh's post-CC plan: labels⋈attrs on node=doc_id, then the
    keeper manifest join on component — all single-key equi-joins over
    (id, label) rows, never document payloads. The CC edge set itself is
    covered by the llm_dedup_near pin (shared edge generation)."""
    plan = _plan(_REGISTRY["llm_dedup_keeper_lsh"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    _bnlj_is_scalar_attach_only(plan)
    assert re.search(r"Left keys \[1\]: \[node#\d+L?\]", plan)
    assert re.search(r"keys \[1\]: \[component#\d+L?\]", plan)
    # the election itself must stay a window over (component), not a
    # self-join re-aggregation
    assert "Window" in plan


def test_clusters_lsh_edge_frame_is_the_near_pairs_plan(spark):
    """The cluster keys' candidate join is llm_dedup_near's (shared edge
    generation via _labels_lsh) — pin that linkage so a future refactor
    that forks the edge spelling re-points this test."""
    from training_feed_kinesis_spark.operators import ops_wave102

    src = ops_wave102._labels_lsh.__wrapped__ if hasattr(
        ops_wave102._labels_lsh, "__wrapped__"
    ) else ops_wave102._labels_lsh
    import inspect

    body = inspect.getsource(src)
    assert "llm_dedup_near(" in body, (
        "_labels_lsh no longer derives edges from llm_dedup_near — "
        "add a candidate-join plan pin for the new edge source"
    )
