"""Scale-pattern wave 6: backfill/stream seam, point-in-time features,
nearest as-of, stop-shingle thinning.

  * ``stream_backfill_union``: the kappa-migration seam — batch history
    unioned with an overlapping streamed tail, deduplicated on event id;
    drained result must equal the plain batch table.
  * ``feature_pit_snapshot``: point-in-time-correct feature snapshot —
    for every purchase (label row), the user's trailing-7-day click count
    and value sum strictly BEFORE the label timestamp (leakage-free
    feature-store training-set generation).
  * ``join_asof_nearest``: as-of in EITHER direction — each click paired
    with its temporally nearest purchase per user, window-carried (no
    join), tie broken toward the earlier purchase.
  * ``llm_stopshingle_jaccard``: document-frequency-capped shingle
    Jaccard — the hot-shingle (boilerplate) guard that keeps
    shared-shingle blocking skew-free at corpus scale.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, sane_ts, substrate

CAT_STREAM = "2.I streaming"
CAT_JOIN = "2.C joins"
CAT_DEDUP = "2.J llm-pipeline (dedup)"
CAT_WORK = "2.M workloads"

# --- kappa backfill seam ---------------------------------------------------

# history = everything before the cutoff; the replayed stream contributes
# everything from one day BEFORE the cutoff (deliberate overlap) onward, so
# the seam dedup provably does work.
_CUTOFF = "2024-01-20 00:00:00"


@register(
    "stream_backfill_union",
    CAT_STREAM,
    # exactly-once over the distinct-id relation (r10 joint sweep; see
    # stream_dedup — the source table itself may carry redelivered ids,
    # and the seam dedup collapses them like any other redelivery)
    """
    WITH once AS (
      SELECT event_id, MIN(event_type) AS event_type,
             MIN(user_id) AS user_id
      FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
      GROUP BY event_id
    )
    SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id)::BIGINT AS n_users
    FROM once
    GROUP BY event_type
    """,
)
def stream_backfill_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill-plus-stream seam (the kappa migration): batch history
    (ts < cutoff) unioned with a drained streaming tail that deliberately
    OVERLAPS history by one day, deduplicated on event_id at the seam.
    The result must equal the plain batch table — which is exactly what
    the oracle asserts; any seam loss or double-count breaks it.

    At 100 TB this is how a pipeline moves from nightly batch to
    streaming without a flag-day: history writes once, the stream owns
    the tail, and the seam dedup is an event_id anti-join bounded to the
    overlap window (here spelled as a full dedup for oracle strength —
    production restricts it to ts within the overlap).

    NULL event-time rows belong to NEITHER epoch (the history predicate
    ts < cutoff and the tail predicate ts >= cutoff-1d are both unknown
    on NULL), so the oracle pins the same exclusion — the r8 NULL-time
    seam; an undated event cannot be assigned to a migration side. An
    ID-LESS event cannot cross the seam either (NULL-PK r9): the seam
    dedup is keyed on event_id, so both engines exclude it."""
    from ..streaming.replay import drain, replay_stream

    ev = load_table(spark, sf_dir, "events")
    history = ev.filter(F.col("ts") < F.lit(_CUTOFF).cast("timestamp"))
    tail_stream = replay_stream(spark, sf_dir, "ordered").filter(
        F.col("ts")
        >= F.lit(_CUTOFF).cast("timestamp") - F.expr("INTERVAL 1 DAY")
    )
    tail = drain(tail_stream, "append")
    # an id-less event cannot cross the seam exactly-once: the dedup
    # key is the identity (NULL-PK r9; dropDuplicates would keep ONE
    # survivor for ALL NULL ids where the batch oracle counts each)
    merged = (
        history.unionByName(tail)
        .filter(F.col("event_id").isNotNull())
        .dropDuplicates(["event_id"])
    )
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


# --- point-in-time feature snapshot ----------------------------------------

_PIT_WINDOW_S = 7 * 86400


@register(
    "feature_pit_snapshot",
    CAT_WORK,
    f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, value, epoch(ts)::BIGINT AS sec
      FROM events
    ),
    feat AS (
      SELECT event_id, user_id, event_type,
             COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER w, 0)::BIGINT AS clicks_7d,
             ROUND(COALESCE(SUM(CASE WHEN event_type = 'click' THEN value END)
               OVER w, 0), 4) AS click_value_7d
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN {_PIT_WINDOW_S} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, clicks_7d, click_value_7d
    FROM feat WHERE event_type = 'purchase'
    """,
)
def feature_pit_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature snapshot: for every purchase (the
    label row), the user's click count and click value over the trailing
    7 days STRICTLY before the label timestamp — the leakage-free
    training-set join a feature store performs. A RANGE frame on epoch
    seconds ([−7d, −1s]) makes "strictly before" a frame bound, not a
    join condition: same-second events never leak into their own label.

    Scale shape: ONE shuffle on user_id computes features for every
    candidate row in a single pass (frame bounds are value-based, so no
    per-label range join, no per-key quadratic blowup — this is the
    spelling that replaces the classic events×events as-of range join);
    the label filter then keeps purchase rows only."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_timestamp("ts").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-_PIT_WINDOW_S, -1)
    )
    is_click = F.col("event_type") == "click"
    feat = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce(
            F.sum(F.when(is_click, 1)).over(w), F.lit(0)
        ).cast("long").alias("clicks_7d"),
        F.round(
            F.coalesce(F.sum(F.when(is_click, F.col("value"))).over(w), F.lit(0.0)),
            4,
        ).alias("click_value_7d"),
    )
    return feat.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "clicks_7d", "click_value_7d"
    )


# --- nearest as-of ---------------------------------------------------------


@register(
    "join_asof_nearest",
    CAT_JOIN,
    """
    WITH seq AS (
      SELECT event_id, user_id, event_type, ts,
             MAX(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_p,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_p
      FROM events WHERE ts IS NOT NULL AND (ts IS NULL OR (ts >= TIMESTAMP '1970-01-01' AND ts < TIMESTAMP '2200-01-01'))
    )
    SELECT event_id, user_id,
           CASE
             WHEN prev_p IS NULL THEN next_p
             WHEN next_p IS NULL THEN prev_p
             WHEN ts - prev_p <= next_p - ts THEN prev_p
             ELSE next_p
           END AS nearest_purchase_ts
    FROM seq WHERE event_type = 'click'
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of: each click paired with its temporally
    NEAREST purchase by the same user — either direction, ties to the
    earlier purchase. Spelled joinless: one ordered pass per user carries
    the last purchase backward and the next purchase forward (running
    max/min over purchase-only timestamps), then a row-local CASE picks
    the nearer — the same linearization that fixed ``join_asof``'s
    quadratic hot-key risk, generalized to both directions.

    Scale: one shuffle on user_id, O(events) state-free window work;
    a hot user costs O(n log n) sort, never O(n²) pairs. NULL ts
    dropped on both engines (the r8 NULL-time seam)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & sane_ts("ts")  # temporal admission (r12)
    )
    base = Window.partitionBy("user_id").orderBy("ts", F.col("event_id").asc_nulls_last())
    p_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    prev_p = F.max(p_ts).over(
        base.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_p = F.min(p_ts).over(
        base.rowsBetween(1, Window.unboundedFollowing)
    )
    seq = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        prev_p.alias("prev_p"),
        next_p.alias("next_p"),
    )
    nearest = (
        F.when(F.col("prev_p").isNull(), F.col("next_p"))
        .when(F.col("next_p").isNull(), F.col("prev_p"))
        .when(
            F.col("ts").cast("long") - F.col("prev_p").cast("long")
            <= F.col("next_p").cast("long") - F.col("ts").cast("long"),
            F.col("prev_p"),
        )
        .otherwise(F.col("next_p"))
    )
    return seq.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", nearest.alias("nearest_purchase_ts")
    )


# --- stop-shingle-thinned Jaccard ------------------------------------------

_DF_CAP = 10  # shingles in more than this many docs are boilerplate


def stopshingle_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df-thinned shingle relation (doc_id, sh) with boilerplate
    shingles (df > _DF_CAP) dropped — a SESSION SUBSTRATE shared by
    llm_stopshingle_jaccard and llm_containment_pairs. One shared
    builder (ADVICE r9): the substrate memo is first-builder-wins, so
    two call sites with independent caps would silently serve whichever built
    first; routing every consumer through this helper makes the
    relation provably identical."""
    from .llm_dedup import _shingle_rows

    sh = _shingle_rows(spark, sf_dir)
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("d"))
    return substrate(
        spark, sf_dir, "stopshingle_kept",
        lambda: sh.join(df_counts.filter(F.col("d") <= _DF_CAP), "sh")
        .select("doc_id", "sh"),
    )


@register(
    "llm_stopshingle_jaccard",
    CAT_DEDUP,
    f"""
    WITH sh AS (
      -- DISTINCT at (doc_id, sh): the _shingle_rows set discipline — a
      -- re-ingested duplicate doc row must not inflate the df counts
      -- that feed the cap (doc-corruption replay)
      -- toks materialized ONCE per doc (r12 payload campaign): the
      -- split inlined in the lambda is O(tokens²) per document
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' ||
                      toks[i+2]))) AS sh
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
              FROM documents)
      )
    ),
    df AS (SELECT sh, COUNT(*) AS d FROM sh GROUP BY sh),
    kept AS (
      SELECT s.doc_id, s.sh FROM sh s JOIN df ON df.sh = s.sh
      WHERE df.d <= {_DF_CAP}
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT a_id, b_id,
           ROUND(inter * 1.0 / (ca.n + cb.n - inter), 4) AS jaccard
    FROM pairs
    JOIN counts ca ON ca.doc_id = a_id
    JOIN counts cb ON cb.doc_id = b_id
    WHERE inter * 1.0 / (ca.n + cb.n - inter) >= 0.5
    """,
)
def llm_stopshingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-shingle Jaccard pairs with a document-frequency cap: shingles
    appearing in more than 10 documents (boilerplate headers, templates)
    are dropped BEFORE the blocking join. This is the skew guard the
    plain ``llm_jaccard_pairs`` docstring promises at scale, made
    concrete: the join key's maximum fan-out is df_cap, so no reduce task
    can receive more than df_cap² candidate rows per shingle — the
    difference between a bounded shuffle and one hot boilerplate shingle
    producing a cartesian straggler.

    Jaccard here is over the THINNED shingle sets (both engines agree on
    that definition, so the oracle holds exactly)."""
    # SESSION SUBSTRATE (tables.substrate): the df-thinned shingle
    # relation is cached once per (session, table dir) and shared by the
    # counts leg, both join legs, and repeated invocations — bounded
    # footprint, no per-call cache residue (r7 class)
    kept = stopshingle_kept(spark, sf_dir)
    counts = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = kept.select(F.col("doc_id").alias("a_id"), "sh")
    b = kept.select(F.col("doc_id").alias("b_id"), "sh")
    pairs = (
        a.join(b, "sh")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    jac = F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(ca, "a_id")
        .join(cb, "b_id")
        .filter(jac >= 0.5)
        .select("a_id", "b_id", F.round(jac, 4).alias("jaccard"))
    )
