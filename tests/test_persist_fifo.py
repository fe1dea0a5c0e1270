"""Bounded persist FIFO mechanics (functions/ranks.py).

Round-4 bench --compare caught dedup_cluster_representatives at 2.8x:
iterative loops released superseded frames with bare ``df.unpersist()``
but the FIFO kept their (dead) entries, so r loop rounds pushed r dead
slots and evicted the query's own still-live frames (the edge set the
CC loop re-joins every round), forcing full recomputation. These tests
pin the fix — ``unpersist_tracked`` frees the slot — with stub frames
(no Spark needed; the FIFO only calls persist/unpersist).
"""

from __future__ import annotations

from spark_streaming_practicum_spark.functions import ranks


class _Stub:
    def __init__(self, name: str):
        self.name = name
        self.persisted = False

    def persist(self):
        self.persisted = True
        return self

    def unpersist(self, blocking=False):
        self.persisted = False
        return self


def setup_function(_fn):
    ranks._live_persisted.clear()


def teardown_function(_fn):
    ranks._live_persisted.clear()


def test_fifo_caps_live_frames():
    frames = [ranks.persisted(_Stub(f"f{i}")) for i in range(ranks._MAX_LIVE + 5)]
    assert len(ranks._live_persisted) == ranks._MAX_LIVE
    assert sum(f.persisted for f in frames) == ranks._MAX_LIVE
    # oldest were evicted
    assert not frames[0].persisted and frames[-1].persisted


def test_unpersist_tracked_frees_the_slot():
    keep = ranks.persisted(_Stub("edges"))
    # a loop: each round persists a new labels frame and releases the
    # previous one THROUGH the tracker
    prev = ranks.persisted(_Stub("labels0"))
    for i in range(ranks._MAX_LIVE * 3):
        new = ranks.persisted(_Stub(f"labels{i + 1}"))
        ranks.unpersist_tracked(prev)
        prev = new
    # the long-lived frame was never evicted: released slots were freed
    assert keep.persisted, "loop releases must not evict live frames"
    assert prev.persisted
    assert len(ranks._live_persisted) == 2


def test_bare_unpersist_would_have_evicted_live_frame():
    # the failure mode the fix removes, kept as documentation: bare
    # unpersist leaves dead entries that push live ones out
    keep = ranks.persisted(_Stub("edges"))
    prev = ranks.persisted(_Stub("labels0"))
    for i in range(ranks._MAX_LIVE * 3):
        new = ranks.persisted(_Stub(f"labels{i + 1}"))
        prev.unpersist()  # NOT tracked
        prev = new
    assert not keep.persisted


def test_release_drains_everything():
    frames = [ranks.persisted(_Stub(f"g{i}")) for i in range(4)]
    ranks.release_persisted_frames()
    assert not ranks._live_persisted
    assert not any(f.persisted for f in frames)
