"""Streaming replay batch-boundary fuzz (VERDICT r5 item 6).

Round 5 caught a stale-by-name replay cache — the bug class where a
streaming result silently depends on HOW the replay was batched rather
than on the data. This makes that class systematically tested: each seed
re-splits the events replay into a random number of micro-batch files
with random boundaries, and the drained result must be identical to the
batch oracle for every split.

Two split regimes, matched to each operator's invariance contract:

* ANY assignment (rows hashed to files in arbitrary order) — valid for
  complete-mode aggregations (no watermark late-drop in complete mode:
  all state is retained) and for the associative CDC merge (per-key
  argmax over any batch partition equals the global compaction).
* ORDERED chunking (random contiguous cuts of the (ts, event_id)-sorted
  sequence) — for append-mode session windows, whose no-loss guarantee
  holds exactly when arrival respects event-time order: the watermark
  (max ts − delay, advanced between batches) then never passes an
  unseen row, REGARDLESS of where the batch boundaries fall. That
  boundary-independence is the property under test.

50 seeded splits total (5 seeds × 10 keys), each compared to the DuckDB
oracle on the clean corpus. The round-6 extension widens the matrix to
every oracled replay consumer whose invariance contract is clean:
complete-mode aggregations (sliding windows, windowed top-k, the
stream-static enrichment join — the join itself is stateless, so ANY
batching feeds the same rows to the complete-mode agg), the chained
append-mode double aggregation (ordered chunking + far-future sentinel:
the multi-stateful-operator pipeline finalizes identically wherever the
cuts fall), and the watermark-bounded dedup under doubled redelivery
(the 400-day delay covers the corpus span, so first-seen election is
batching-independent by construction).
"""

from __future__ import annotations

import os
import random
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from training_feed_kinesis_spark.streaming import replay

from .conftest import SF_DIR, assert_matches_oracle

SEEDS = [101, 202, 303, 404, 505]

# key -> (replay variant it requests, split regime)
FUZZ_KEYS = {
    "stream_tumbling": ("ordered", "any"),
    "stream_dedup": ("doubled", "any"),
    "stream_cdc_merge": ("ordered", "any"),
    "stream_session": ("ordered", "chunked"),
    # round-6 extension: the remaining clean-contract replay consumers
    "stream_sliding": ("ordered", "any"),  # complete-mode agg
    "stream_topk_windowed": ("ordered", "any"),  # complete-mode agg + batch rank
    "join_stream_static": ("ordered", "any"),  # stateless join → complete agg
    "stream_chained_aggs": ("ordered", "chunked"),  # append mode: needs order
    "stream_dedup_watermark": ("doubled", "any"),  # 400d delay ⊇ corpus span
    # per-key monotone fold (count+max, NoTimeout), final = max over the
    # cumulative update emissions — batching cannot change the totals
    "stream_stateful": ("ordered", "any"),
}


@pytest.fixture(scope="module")
def registry():
    from training_feed_kinesis_spark.registry import load_all

    return load_all()


def _materialize_split(spark, df, assign_col, k, dstdir) -> None:
    """Write df into k flat part files (file i = rows with assign==i),
    mtime-stamped in file order — the same on-disk contract _prepare
    produces, so FileStreamSource replays file i as micro-batch i."""
    tagged = df.withColumn("_chunk", assign_col)
    os.makedirs(dstdir, exist_ok=True)
    for i in range(k):
        tmp = f"{dstdir}_w{i}"
        (
            tagged.filter(F.col("_chunk") == i)
            .drop("_chunk", "_rn", "_copy")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        parts = [
            f
            for f in os.listdir(tmp)
            if f.startswith("part-") and not f.endswith(".crc")
        ]
        if parts:
            os.replace(
                os.path.join(tmp, parts[0]),
                os.path.join(dstdir, f"part-{i:05d}.parquet"),
            )
        shutil.rmtree(tmp)
    replay._stamp_mtimes(dstdir)
    with open(os.path.join(dstdir, "_READY"), "w") as f:
        f.write("ok")


def _build_split(spark, variant: str, regime: str, seed: int, dstdir: str):
    from training_feed_kinesis_spark.tables import load_table

    rng = random.Random(seed)
    k = rng.randint(2, 6)
    ev = load_table(spark, SF_DIR, "events")
    if variant == "doubled":
        # at-least-once redelivery: two copies, independently scattered
        ev = ev.withColumn("_copy", F.lit(0)).unionByName(
            ev.withColumn("_copy", F.lit(1))
        )
        hash_cols = [F.col("event_id"), F.col("_copy"), F.lit(seed)]
    else:
        ev = ev.withColumn("_copy", F.lit(0))
        hash_cols = [F.col("event_id"), F.lit(seed)]
    if regime == "any":
        assign = F.pmod(F.xxhash64(*hash_cols), F.lit(k)).cast("int")
        ev = ev.withColumn("_rn", F.lit(0))
    else:
        n = ev.count()
        w = Window.orderBy("ts", "event_id")
        ev = ev.withColumn("_rn", F.row_number().over(w))
        cuts = sorted(rng.sample(range(2, n + 1), k - 1))
        assign = F.expr(
            "size(filter(array({}), c -> c <= _rn))".format(
                ",".join(map(str, cuts))
            )
        )
    _materialize_split(spark, ev, assign, k, dstdir)
    return k


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("key", sorted(FUZZ_KEYS))
def test_drained_result_is_split_invariant(
    key, seed, spark, duck, registry, tmp_path, monkeypatch
):
    variant, regime = FUZZ_KEYS[key]
    dstdir = str(tmp_path / f"split_{key}_{seed}")
    _build_split(spark, variant, regime, seed, dstdir)

    def fake_prepare(_spark, _sf_dir, req_variant):
        assert req_variant == variant, (key, req_variant)
        return dstdir

    monkeypatch.setattr(replay, "_prepare", fake_prepare)
    spec = registry[key]
    assert spec.oracle is not None, key
    assert_matches_oracle(spec.fn(spark, SF_DIR), duck, spec.oracle)
