"""Protocol-level tests of the shared index-maintenance ledger
(`operators/index_ledger.py`) — no Spark: `write_fn` is stubbed with a
plain directory write, so these pin the COMMIT PROTOCOL itself
(manifest evolution, two-scope replay semantics, dir-name safety,
cross-process lock serialization) independently of any index family.
The Spark-side behavior of each family rides the same functions and is
covered end-to-end in test_index_lifecycle.py."""

from __future__ import annotations

import json
import multiprocessing as mp
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from explora_kafka_spark.operators import index_ledger as L


def _touch_write(path: str) -> bool:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0"), "w") as f:
        f.write("x")
    return True


def _empty_write(path: str) -> bool:
    return False


# ---------------------------------------------------------------------------
# manifest + append protocol vs a reference model
# ---------------------------------------------------------------------------


def test_legacy_manifest_default(tmp_path):
    m = L.read_manifest(str(tmp_path), "base")
    assert m == {"dirs": ["base"], "batches": [], "streams": {}}


def test_bare_batch_scope_membership(tmp_path):
    p = str(tmp_path)
    assert L.ledger_append(p, "base", "d", _touch_write, batch_id="a")
    assert not L.ledger_append(p, "base", "d", _touch_write, batch_id="a")
    assert L.ledger_append(p, "base", "d", _touch_write, batch_id="b")
    m = L.read_manifest(p, "base")
    assert m["batches"] == ["a", "b"]
    assert len(m["dirs"]) == 3  # base + two deltas


def test_stream_scope_watermark_vs_bare_scope(tmp_path):
    """The two scopes are independent: a stream watermark never
    consults the bare-id list and vice versa."""
    p = str(tmp_path)
    assert L.ledger_append(p, "base", "d", _touch_write,
                           batch_id=5, stream_id="s")
    # same NUMBER as a bare id is not a replay of the stream epoch
    assert L.ledger_append(p, "base", "d", _touch_write, batch_id=5)
    # stream replays: <= watermark no-ops, > applies
    assert not L.ledger_append(p, "base", "d", _touch_write,
                               batch_id=5, stream_id="s")
    assert not L.ledger_append(p, "base", "d", _touch_write,
                               batch_id=4, stream_id="s")
    assert L.ledger_append(p, "base", "d", _touch_write,
                           batch_id=6, stream_id="s")
    m = L.read_manifest(p, "base")
    assert m["streams"] == {"s": 6} and m["batches"] == ["5"]


def test_stream_scope_requires_batch_id(tmp_path):
    with pytest.raises(ValueError, match="batch_id"):
        L.ledger_append(str(tmp_path), "base", "d", _touch_write,
                        stream_id="s")
    assert not os.listdir(tmp_path)  # nothing written


def test_empty_batch_commits_ledger_without_dir(tmp_path):
    """An empty batch must still advance the ledger (the epoch is
    consumed) but add no dir for readers to scan."""
    p = str(tmp_path)
    assert L.ledger_append(p, "base", "d", _empty_write,
                           batch_id=0, stream_id="s")
    m = L.read_manifest(p, "base")
    assert m["dirs"] == ["base"] and m["streams"] == {"s": 0}
    assert not L.ledger_append(p, "base", "d", _touch_write,
                               batch_id=0, stream_id="s")


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=1, max_size=80))
def test_safe_component_always_dir_safe_and_stable(s):
    out = L._safe_component(s)
    assert L._SAFE_RE.fullmatch(out), out
    assert "/" not in out and out not in (".", "..")
    assert L._safe_component(s) == out  # deterministic


@settings(max_examples=50, deadline=None)
@given(st.lists(
    st.one_of(
        st.tuples(st.just("bare"), st.text(
            alphabet="ab/é .", min_size=1, max_size=8)),
        st.tuples(st.just("stream"), st.integers(0, 5)),
    ),
    max_size=12,
))
def test_append_sequence_matches_reference_model(tmp_path_factory, ops):
    """Any sequence of bare/stream appends yields exactly the manifest
    a simple reference model predicts — applied batches, watermark,
    and one committed dir per APPLIED non-empty batch."""
    p = str(tmp_path_factory.mktemp("ledger"))
    seen_bare: list[str] = []
    watermark = -1
    applied = 0
    for kind, val in ops:
        if kind == "bare":
            bid = str(val)
            expect = bid not in seen_bare
            got = L.ledger_append(p, "base", "d", _touch_write,
                                  batch_id=bid)
            assert got is expect
            if expect:
                seen_bare.append(bid)
                applied += 1
        else:
            expect = val > watermark
            got = L.ledger_append(p, "base", "d", _touch_write,
                                  batch_id=val, stream_id="s")
            assert got is expect
            if expect:
                watermark = val
                applied += 1
    m = L.read_manifest(p, "base")
    assert m["batches"] == seen_bare
    assert m["streams"] == ({"s": watermark} if watermark >= 0 else {})
    assert len(m["dirs"]) == 1 + applied
    assert len(set(m["dirs"])) == len(m["dirs"])  # no dir collisions


# ---------------------------------------------------------------------------
# cross-process serialization (the flock claim)
# ---------------------------------------------------------------------------


def _worker(path: str, ids) -> None:
    for i in ids:
        L.ledger_append(path, "base", "d",
                        lambda d: _touch_write(d), batch_id=int(i),
                        stream_id="shared")


def test_concurrent_appends_serialize_across_processes(tmp_path):
    """Four processes race interleaved epoch ids into ONE stream scope:
    the flock'd read→mutate→swap must lose no commit — the final
    watermark is the global max and every applied epoch's dir is in
    the manifest exactly once."""
    p = str(tmp_path)
    os.makedirs(p, exist_ok=True)
    ctx = mp.get_context("fork")
    procs = [ctx.Process(target=_worker, args=(p, range(s, 40, 4)))
             for s in range(4)]
    for pr in procs:
        pr.start()
    for pr in procs:
        pr.join(60)
        assert pr.exitcode == 0
    m = L.read_manifest(p, "base")
    assert m["streams"] == {"shared": 39}
    # every committed dir exists on disk and is unique
    assert len(set(m["dirs"])) == len(m["dirs"])
    for d in m["dirs"][1:]:
        assert os.path.isdir(os.path.join(p, d))
    # the watermark can only have advanced monotonically: applied dirs
    # form a subset of epochs 0..39 with at least the 4 per-process
    # first-claims... exact count is interleaving-dependent; what MUST
    # hold is no torn manifest and a readable, consistent state
    assert json.load(open(os.path.join(p, L.MANIFEST)))["streams"] == {
        "shared": 39}


def test_compact_with_stub_rewrite(tmp_path):
    """Protocol-level compact: folds the snapshot dirs, keeps ledgers,
    GCs folded dirs — with a stub rewrite (no Spark)."""
    p = str(tmp_path)
    L.ledger_append(p, "base", "d", _touch_write, batch_id="x")
    L.ledger_append(p, "base", "d", _touch_write, batch_id="y")
    # seed the base dir so the fold has something to replace
    _touch_write(os.path.join(p, "base"))

    # compact() builds its union via spark.read.parquet — the protocol
    # tail (snapshot-scoped fold + late carry + ledger survival) is
    # exercised here directly through mutate_manifest
    snapshot = L.read_manifest(p, "base")
    folded = list(snapshot["dirs"])
    new_dir = "compact_test"
    _touch_write(os.path.join(p, new_dir))

    def _commit(manifest):
        late = [d for d in manifest["dirs"] if d not in folded]
        manifest["dirs"] = [new_dir, *late]
        return manifest

    L.mutate_manifest(p, _commit, "base")
    m = L.read_manifest(p, "base")
    assert m["dirs"] == [new_dir]
    assert m["batches"] == ["x", "y"]  # ledger survives


# ---------------------------------------------------------------------------
# VACUUM: crash-orphan GC under the grace lease
# ---------------------------------------------------------------------------


def test_vacuum_deletes_only_aged_orphans(tmp_path):
    p = str(tmp_path)
    L.ledger_append(p, "base", "base_delta", _touch_write, batch_id="a")
    _touch_write(os.path.join(p, "base"))
    # crash debris: a delta that never committed and a died compaction
    _touch_write(os.path.join(p, "base_delta_orphan"))
    _touch_write(os.path.join(p, "base_compact_died"))
    # a foreign dir the prefixes must protect
    _touch_write(os.path.join(p, "centroids"))
    prefixes = ("base_delta_", "base_compact_")
    # inside the grace lease: nothing deleted
    assert L.vacuum(p, "base", prefixes, grace_secs=3600) == []
    # past the lease: exactly the two orphans go
    deleted = L.vacuum(p, "base", prefixes, grace_secs=0)
    assert sorted(deleted) == ["base_compact_died", "base_delta_orphan"]
    on_disk = {d for d in os.listdir(p) if os.path.isdir(
        os.path.join(p, d))}
    committed = set(L.read_manifest(p, "base")["dirs"])
    assert committed <= on_disk          # committed dirs survive
    assert "centroids" in on_disk        # foreign dirs survive
    # idempotent
    assert L.vacuum(p, "base", prefixes, grace_secs=0) == []


def test_open_delta_count(tmp_path):
    p = str(tmp_path)
    assert L.open_delta_count(p, "base") == 0
    L.ledger_append(p, "base", "base_delta", _touch_write, batch_id="a")
    L.ledger_append(p, "base", "base_delta", _touch_write, batch_id="b")
    assert L.open_delta_count(p, "base") == 2


def test_vacuum_reclaims_folded_base_dir_only_with_manifest(tmp_path):
    """After a gc=False compaction the EX-base dir is an unmanifested
    orphan vacuum may reclaim — but on a pre-manifest legacy index the
    base dir is implicitly committed and untouchable."""
    p = str(tmp_path)
    # legacy index: base on disk, NO manifest file
    _touch_write(os.path.join(p, "base"))
    assert L.vacuum(p, "base", ("base_delta_",), grace_secs=0) == []
    # now a ledgered append + a simulated deferred-GC compaction
    L.ledger_append(p, "base", "base_delta", _touch_write, batch_id="a")
    _touch_write(os.path.join(p, "base_compact_x"))

    def _swap(manifest):
        manifest["dirs"] = ["base_compact_x"]
        return manifest

    L.mutate_manifest(p, _swap, "base")
    deleted = L.vacuum(p, "base", ("base_delta_", "base_compact_"),
                       grace_secs=0)
    assert "base" in deleted  # ex-base reclaimed
    assert all(d.startswith("base_delta_") or d == "base"
               for d in deleted)
    assert os.path.isdir(os.path.join(p, "base_compact_x"))


def test_reset_manifest_if_present(tmp_path):
    p = str(tmp_path)
    # no manifest: stays manifest-free (legacy bit-compat)
    L.reset_manifest_if_present(p, "base")
    assert not os.path.exists(os.path.join(p, L.MANIFEST))
    # with a manifest carrying deltas + a stream watermark: full reset
    L.ledger_append(p, "base", "base_delta", _touch_write,
                    batch_id=7, stream_id="s")
    L.reset_manifest_if_present(p, "base")
    m = L.read_manifest(p, "base")
    assert m == {"dirs": ["base"], "batches": [], "streams": {}}
    # the stale watermark is gone: epoch 0 applies on the fresh index
    assert L.ledger_append(p, "base", "base_delta", _touch_write,
                           batch_id=0, stream_id="s")
