"""r12 optimization-round pins: load_table plan memoization is METADATA
reuse, never data caching; parallelize's partition probe memo keeps its
repartition-only-when-needed contract.

The r12 contract the bench runs under: every timed query computes from
the parquet inputs. load_table may reuse the (lazy) relation plan — the
driver-side footer read + file listing is catalog metadata — but must
never persist/cache the data behind it.
"""

import os
import shutil

from pyspark.storagelevel import StorageLevel

from training_feed_kinesis_spark.tables import load_table, parallelize

from .conftest import SF_DIR


def test_load_table_memoizes_plan_not_data(spark):
    a = load_table(spark, SF_DIR, "orders")
    b = load_table(spark, SF_DIR, "orders")
    # same session + same dir content -> same plan object (no rebuild)
    assert a is b
    # and that plan is NOT cached/persisted — every action re-reads parquet
    assert a.storageLevel == StorageLevel.NONE


def test_load_table_memo_is_content_keyed(spark, tmp_path):
    src = os.path.join(SF_DIR, "region.parquet")
    dst_dir = tmp_path / "sfx"
    dst_dir.mkdir()
    dst = str(dst_dir / "region.parquet")
    shutil.copy(src, dst)
    a = load_table(spark, str(dst_dir), "region")
    n_a = a.count()
    # rewrite the file in place (different mtime_ns) -> memo must miss
    shutil.copy(src, dst)
    os.utime(dst, ns=(1, 1))
    b = load_table(spark, str(dst_dir), "region")
    assert a is not b
    assert b.count() == n_a


def test_parallelize_still_widens_single_split_scans(spark):
    df = load_table(spark, SF_DIR, "documents")
    target = spark.sparkContext.defaultParallelism
    out = parallelize(df)
    assert out.rdd.getNumPartitions() >= min(target, 2)
    # repeated calls (memo hit) must keep the same contract
    out2 = parallelize(load_table(spark, SF_DIR, "documents"))
    assert out2.rdd.getNumPartitions() >= min(target, 2)


def test_parallelize_probe_memo_does_not_pin_frames(spark):
    """r12 ADVICE/VERDICT item 4: the id(df)-keyed module dict held a
    strong reference to every frame ever probed — callers passing fresh
    derived frames (parallelize(gated) etc.) leaked an entry + pinned
    JVM plan per call. The r13 attribute memo must (a) still memoize,
    (b) let a dropped frame be collected."""
    import gc
    import weakref

    df = load_table(spark, SF_DIR, "documents").select("doc_id")
    parallelize(df)
    assert isinstance(getattr(df, "_tfk_npart", None), int)  # memo present
    ref = weakref.ref(df)
    del df
    gc.collect()
    assert ref() is None  # nothing module-level pins the frame
