"""Round-10 CDC operators (operators/cdc.py): log compaction, MERGE
upsert, SCD-2 intervals — unit semantics on engineered logs plus the
driver-style oracle replay of the merge_battery cdc arm."""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import cdc  # noqa: E402

_LOG_SCHEMA = "k long, ts timestamp, v double, op string"


def _ts(s: int):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=s)


def _log(spark, rows):
    return spark.createDataFrame(rows, _LOG_SCHEMA)


def test_cdc_compact_tombstone_wins_and_ties_break_on_order(spark):
    log = _log(spark, [
        (1, _ts(0), 1.0, "U"),
        (1, _ts(5), 2.0, "U"),          # latest for k=1 -> kept
        (2, _ts(0), 3.0, "U"),
        (2, _ts(9), 4.0, "D"),          # tombstone latest -> key dropped
        (3, _ts(7), 5.0, "D"),
        (3, _ts(7), 6.0, "U"),          # ts tie: needs a tiebreaker
    ])
    # tiebreak on v: (ts, v) makes the 6.0/'U' row the latest for k=3
    out = cdc.cdc_compact(log, ["k"], ["ts", "v"]).orderBy("k").collect()
    assert [(r.k, r.v, r.op) for r in out] == [(1, 2.0, "U"), (3, 6.0, "U")]
    # drop_deleted=False keeps the k=2 tombstone row (a MERGE feed)
    feed = cdc.cdc_compact(log, ["k"], ["ts", "v"], drop_deleted=False)
    assert {(r.k, r.op) for r in feed.collect()} == {
        (1, "U"), (2, "D"), (3, "U")}


def test_cdc_compact_null_op_is_non_delete(spark):
    """A contract-violating NULL op on the latest row is treated as a
    non-delete (same decision merge_upsert documents), not silently
    dropped by a NULL predicate (ADVICE r10)."""
    log = _log(spark, [
        (1, _ts(0), 1.0, "U"),
        (1, _ts(5), 2.0, None),   # latest has NULL op -> kept
        (2, _ts(0), 3.0, "D"),    # latest is a real tombstone -> dropped
    ])
    out = cdc.cdc_compact(log, ["k"], ["ts", "v"]).collect()
    assert [(r.k, r.v, r.op) for r in out] == [(1, 2.0, None)]


def test_cdc_compact_salted_equals_unsalted_on_whale_key(spark):
    """salt_buckets decomposes the one-window-per-key pass into two
    passes that both split; result identical because the per-key argmax
    of a UNIQUE order tuple is the max over per-salt maxima."""
    rows = []
    # whale key 1 holds ~60% of the log; keys 2..5 share the rest
    for i in range(300):
        rows.append((1, _ts(i), float(i), "D" if i == 37 else "U"))
    for k in range(2, 6):
        for i in range(50):
            rows.append((k, _ts(i), float(k * 1000 + i), "U"))
    rows.append((6, _ts(99), 9.0, "D"))  # tombstone-latest key vanishes
    log = _log(spark, rows).repartition(8)
    plain = sorted(map(tuple, cdc.cdc_compact(log, ["k"], ["ts", "v"]).collect()))
    for nb in (2, 7):
        salted = sorted(map(tuple, cdc.cdc_compact(
            log, ["k"], ["ts", "v"], salt_buckets=nb).collect()))
        assert salted == plain
    # feed mode (keep tombstones) must agree too
    plain_feed = sorted(map(tuple, cdc.cdc_compact(
        log, ["k"], ["ts", "v"], drop_deleted=False).collect()))
    salted_feed = sorted(map(tuple, cdc.cdc_compact(
        log, ["k"], ["ts", "v"], drop_deleted=False, salt_buckets=4
    ).collect()))
    assert salted_feed == plain_feed


def test_merge_upsert_four_action_quadrants(spark):
    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double")
    source = spark.createDataFrame(
        [(2, 21.0, "U"),     # matched + U -> update
         (3, None, "D"),     # matched + D -> removed
         (4, 40.0, "U"),     # new key     -> insert
         (5, None, "D")],    # delete of an absent key -> no row
        "k long, v double, op string")
    out = {(r.k, r.v, r.action)
           for r in cdc.merge_upsert(target, source, ["k"]).collect()}
    assert out == {(1, 10.0, "keep"), (2, 21.0, "update"),
                   (4, 40.0, "insert")}


def test_merge_upsert_broadcast_source_plan_and_parity(spark):
    target = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "k long, v double")
    source = spark.createDataFrame(
        [(5, 55.0, "U"), (99, 9.9, "U"), (7, None, "D")],
        "k long, v double, op string")
    plain = cdc.merge_upsert(target, source, ["k"])
    bcast = cdc.merge_upsert(target, source, ["k"], broadcast_source=True)
    # Spark can't broadcast a full-outer join, so the broadcast form is a
    # decomposition into broadcast anti/semi legs: the snapshot side must
    # appear only under BroadcastHashJoins, never a shuffled join
    txt = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in txt, txt
    assert "SortMergeJoin" not in txt, txt
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bcast.collect()))


def test_scd2_build_intervals_chain_and_current_flag(spark):
    log = _log(spark, [
        (1, _ts(0), 1.0, "U"),
        (1, _ts(10), 2.0, "U"),
        (1, _ts(20), 3.0, "U"),
        (2, _ts(5), 9.0, "U"),
    ])
    out = cdc.scd2_build(log, ["k"], "ts", order=["ts", "v"]) \
        .orderBy("k", "version").collect()
    k1 = [r for r in out if r.k == 1]
    # intervals chain: valid_to[i] == valid_from[i+1]; last row open
    assert [r.version for r in k1] == [1, 2, 3]
    assert k1[0].valid_to == k1[1].valid_from
    assert k1[1].valid_to == k1[2].valid_from
    assert k1[2].valid_to is None and k1[2].is_current
    assert not k1[0].is_current and not k1[1].is_current
    k2 = [r for r in out if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current and k2[0].version == 1


def test_cdc_arm_matches_duckdb_oracle(spark, sf_med):
    """Driver-style replay: the cdc arm's Spark output value-matches the
    exact SQL embedded in the merge_battery oracle."""
    import __spark_entry__ as entry
    from tests.oracle_harness import compare, duck_connection

    con = duck_connection(sf_med)
    errs = compare("cdc_arm", entry.cdc_arm(spark, sf_med), con,
                   entry._CDC_ORACLE)
    assert not errs, errs


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# a random change feed: (key, value, op) with repeated keys and a mix of
# updates, deletes, and keys absent from the target
_feed = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 10.0),
        # None = a contract-violating NULL op: both plans must treat it
        # as a non-delete (ADVICE r10 — the broadcast plan used to drop
        # the key entirely while full-outer emitted update/insert)
        st.sampled_from(["U", "D", None]),
    ),
    min_size=0,
    max_size=20,
).map(lambda rows: list({k: (k, v, o) for k, v, o in rows}.values()))
# dict-dedup keeps ONE row per key: merge_upsert's contract is an
# already-compacted source feed


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    _feed,
    st.sets(st.integers(min_value=0, max_value=9), max_size=8),
    st.booleans(),
    st.booleans(),
)
def test_merge_upsert_broadcast_decomposition_equals_full_outer(
    spark, feed, target_keys, null_in_target, null_in_source
):
    """The broadcast anti/semi decomposition and the full-outer plan are
    two physical strategies for ONE semantics — property-pinned equal on
    random compacted feeds against random target snapshots, INCLUDING a
    NULL key on either or both sides (both plans match keys null-safely,
    like a MERGE ON clause with <=>)."""
    trows = [(k, float(k) * 2.0) for k in sorted(target_keys)]
    if null_in_target:
        trows.append((None, -1.0))
    srows = list(feed)
    if null_in_source:
        srows.append((None, -2.0, "U"))
    target = spark.createDataFrame(
        trows or [(0, 0.0)], "k long, v double"
    )
    source = spark.createDataFrame(
        srows or [(99, 9.9, "U")], "k long, v double, op string"
    )
    plain = sorted(
        map(tuple, cdc.merge_upsert(target, source, ["k"]).collect()),
        key=repr,
    )
    bcast = sorted(
        map(tuple, cdc.merge_upsert(
            target, source, ["k"], broadcast_source=True).collect()),
        key=repr,
    )
    assert plain == bcast
    if null_in_target and null_in_source:
        # null-safe match: ONE row for the NULL key, updated from source
        nulls = [r for r in plain if r[0] is None]
        assert nulls == [(None, -2.0, "update")]


def test_scd2_apply_equals_rebuild_on_union(spark):
    """r11 incremental SCD-2: applying a day's changes to the standing
    dimension equals a from-scratch build over the whole log — including
    multiple same-day changes per key, interleaved timestamps, and a
    brand-new key."""
    old = [
        (1, _ts(0), 1.0, "U"), (1, _ts(10), 2.0, "U"),
        (2, _ts(5), 9.0, "U"),
        (3, _ts(2), 4.0, "U"),
    ]
    new = [
        (1, _ts(20), 3.0, "U"),          # appends a third version
        (1, _ts(25), 3.5, "U"),          # two changes in one batch
        (2, _ts(3), 8.0, "U"),           # EARLIER than 2's history
        (4, _ts(30), 7.0, "U"),          # brand-new key
    ]
    dim = cdc.scd2_build(_log(spark, old), ["k"], "ts", order=["ts", "v"])
    inc = cdc.scd2_apply(
        dim, _log(spark, new), ["k"], "ts", order=["ts", "v"])
    full = cdc.scd2_build(
        _log(spark, old + new), ["k"], "ts", order=["ts", "v"])
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, full.collect()))
    # key 3 untouched, key 1 now has 4 chained versions
    k1 = sorted(
        (r.version, r.v, r.is_current) for r in inc.collect() if r.k == 1)
    assert [v for v, _, _ in k1] == [1, 2, 3, 4]
    assert [c for _, _, c in k1] == [False, False, False, True]


def test_scd2_apply_snapshot_never_shuffled(spark, tmp_path):
    """The standing dimension read from parquet splits by one broadcast
    semi/anti pair — no shuffled join; the rebuild window touches only
    the affected keys."""
    log = _log(spark, [
        (k, _ts(s), float(k * 10 + s), "U")
        for k in range(1, 40) for s in (0, 5)
    ])
    dim = cdc.scd2_build(log, ["k"], "ts", order=["ts", "v"])
    p = str(tmp_path / "dim")
    dim.write.parquet(p)
    changes = _log(spark, [(3, _ts(9), 99.0, "U"), (41, _ts(1), 1.0, "U")])
    out = cdc.scd2_apply(
        spark.read.parquet(p), changes, ["k"], "ts", order=["ts", "v"])
    txt = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in txt, txt
    assert "ShuffledHashJoin" not in txt, txt
    assert "BroadcastHashJoin" in txt, txt


_scd_log = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),               # key
        st.integers(min_value=0, max_value=50),              # ts seconds
        st.integers(min_value=-99, max_value=99),            # value
    ),
    min_size=1, max_size=30,
).map(lambda rows: list({(k, s): (k, s, v) for k, s, v in rows}.values()))
# (key, ts) dedup: scd2's order tuple must be unique per key


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_scd_log, st.integers(min_value=0, max_value=50))
def test_scd2_apply_property_random_split(spark, rows, cutoff):
    """Any split of a random log into (standing, new) — including splits
    that put LATER rows in standing — rebuilds identically through
    scd2_apply."""
    old = [(k, _ts(s), float(v), "U") for k, s, v in rows if s <= cutoff]
    new = [(k, _ts(s), float(v), "U") for k, s, v in rows if s > cutoff]
    if not old or not new:
        return
    dim = cdc.scd2_build(_log(spark, old), ["k"], "ts", order=["ts"])
    inc = cdc.scd2_apply(dim, _log(spark, new), ["k"], "ts", order=["ts"])
    full = cdc.scd2_build(_log(spark, old + new), ["k"], "ts", order=["ts"])
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, full.collect()))
