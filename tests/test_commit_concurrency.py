"""Manifest commit concurrency: the lockfile-serialized
read-modify-write (the catalog-CAS stand-in) and the optimistic
per-bucket conflict validation rewrites pass through ``expected_runs``
(Iceberg's snapshot-validation analogue).

Pure Python — commit() never touches Spark — so these run in ms and
can hammer the lock with real threads.
"""

from __future__ import annotations

import os
import threading
import time

import pytest

from logparse_spark.sinks import (
    CommitConflict,
    SinkSet,
    _commit_lock,
    load_manifest,
)


def _lineage(buckets, rows=10):
    return {b: {"rows": rows, "sinks": {"error": rows}} for b in buckets}


def test_concurrent_commits_lose_nothing(tmp_path):
    """N threads commit disjoint bucket groups through N SinkSet
    instances at once: without the lock this is a read-modify-write
    race that silently drops buckets; with it, every bucket and every
    history entry must land."""
    out = str(tmp_path / "t")
    n_threads, per = 8, 4
    errs = []

    def work(i):
        try:
            ss = SinkSet(out_dir=out)
            ss.commit(_lineage(range(i * per, (i + 1) * per)),
                      extra={"thread": i})
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,))
               for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errs
    manifest = load_manifest(out)
    assert len(manifest["buckets"]) == n_threads * per
    assert len(manifest["history"]) == n_threads
    assert sorted(h["thread"] for h in manifest["history"]) == list(
        range(n_threads))
    # lock released
    assert not os.path.exists(os.path.join(out, "_manifest", "LOCK"))


def test_rewrite_conflict_detected(tmp_path):
    """A rewrite that read bucket 3 under run A must fail to commit if
    another commit repointed bucket 3 meanwhile — and must leave the
    manifest untouched."""
    out = str(tmp_path / "t")
    first = SinkSet(out_dir=out)
    first.commit(_lineage([1, 2, 3]))

    # a rewrite reads the mapping...
    expected = {3: first.run_id}
    # ...then an interleaved commit repoints bucket 3
    interloper = SinkSet(out_dir=out)
    interloper.commit(_lineage([3]))

    before = load_manifest(out)
    with pytest.raises(CommitConflict, match=r"\[3\]"):
        SinkSet(out_dir=out).commit(_lineage([3]), expected_runs=expected)
    assert load_manifest(out) == before

    # with a fresh read of the mapping the same rewrite commits fine
    ok = SinkSet(out_dir=out)
    ok.commit(_lineage([3]), expected_runs={3: interloper.run_id})
    assert load_manifest(out)["buckets"]["3"]["run_id"] == ok.run_id


def test_conflict_on_vanished_bucket(tmp_path):
    """expected_runs against a bucket that is no longer committed at
    all (manifest entry gone) is a conflict, not a KeyError."""
    out = str(tmp_path / "t")
    SinkSet(out_dir=out).commit(_lineage([1]))
    with pytest.raises(CommitConflict):
        SinkSet(out_dir=out).commit(
            _lineage([9]), expected_runs={9: "neverexisted"})


def test_lock_timeout_and_stale_break(tmp_path):
    out = str(tmp_path / "t")
    lock_path = os.path.join(out, "_manifest", "LOCK")
    os.makedirs(os.path.dirname(lock_path))

    # a FRESH foreign lock blocks until timeout
    with open(lock_path, "w") as f:
        f.write("424242")
    t0 = time.monotonic()
    with pytest.raises(TimeoutError, match="commit lock"):
        with _commit_lock(out, timeout=0.3):
            pass
    assert time.monotonic() - t0 >= 0.3
    # the foreign lock was NOT stolen
    assert open(lock_path).read() == "424242"

    # a STALE lock (holder died mid-commit) is broken and acquired
    old = time.time() - 3600
    os.utime(lock_path, (old, old))
    with _commit_lock(out, timeout=0.3, stale_sec=300):
        assert open(lock_path).read() == str(os.getpid())
    assert not os.path.exists(lock_path)
