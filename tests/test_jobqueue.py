"""Multi-host job queue (parallel/jobqueue.py) — the DCN per-video work
sharding axis (SURVEY §2.8; VERDICT round 2, Missing #7)."""

import json
import multiprocessing as mp
import os
import time
from pathlib import Path

import pytest

from neuralstyletransferv1_tpu.parallel.jobqueue import (
    JobQueue,
    default_worker_id,
    shard_static,
)


def test_shard_static_partition():
    items = [f"v{i}" for i in range(10)]
    shards = [shard_static(items, k, 3) for k in range(3)]
    flat = sorted(x for s in shards for x in s)
    assert flat == sorted(items)
    assert all(len(s) in (3, 4) for s in shards)
    with pytest.raises(ValueError):
        shard_static(items, 3, 3)


def test_enqueue_claim_complete(tmp_path):
    q = JobQueue(tmp_path / "q")
    a = q.enqueue({"video": "a.mp4"}, job_id="a")
    q.enqueue({"video": "b.mp4"}, job_id="b")
    assert a == "a"
    assert q.counts() == {"pending": 2, "running": 0, "done": 0, "failed": 0}

    jid, rec = q.claim("w1")
    assert jid == "a" and rec["video"] == "a.mp4" and rec["_worker"] == "w1"
    q.complete(jid, {"frames": 10})
    jid2, _ = q.claim("w1")
    q.complete(jid2)
    assert q.claim("w1") is None
    assert q.drained()
    done = json.loads((tmp_path / "q" / "done" / "a.json").read_text())
    assert done["_result"] == {"frames": 10}


def test_enqueue_unique_idempotent(tmp_path):
    q = JobQueue(tmp_path / "q")
    assert q.enqueue_unique({"v": 1}, "x") is True
    assert q.enqueue_unique({"v": 1}, "x") is False
    jid, _ = q.claim()
    q.complete(jid)
    # still present in done/ -> re-enqueue refused (re-running the enqueue
    # command on another host must not duplicate finished work)
    assert q.enqueue_unique({"v": 1}, "x") is False


def test_fail_retry_budget(tmp_path):
    q = JobQueue(tmp_path / "q")
    q.enqueue({"v": 1}, "j")
    for k in range(2):
        jid, rec = q.claim()
        assert rec["_retries"] == k
        q.fail(jid, "boom", retry=True, max_retries=2)
    jid, rec = q.claim()
    assert rec["_retries"] == 2 and rec["_last_error"] == "boom"
    q.fail(jid, "boom again", retry=True, max_retries=2)  # budget exhausted
    assert q.counts()["failed"] == 1
    assert json.loads((tmp_path / "q" / "failed" / "j.json").read_text())["_error"]


def test_requeue_stale(tmp_path):
    q = JobQueue(tmp_path / "q")
    q.enqueue({"v": 1}, "s")
    jid, _ = q.claim("dead-worker")
    # age the heartbeat
    p = tmp_path / "q" / "running" / "s.json"
    old = time.time() - 100
    os.utime(p, (old, old))
    assert q.requeue_stale(stale_secs=50) == ["s"]
    jid2, rec = q.claim("live-worker")
    assert jid2 == "s" and rec["_retries"] == 1
    # a fresh heartbeat is NOT requeued
    q.heartbeat(jid2)
    assert q.requeue_stale(stale_secs=50) == []


def _claim_worker(root, out_file):
    q = JobQueue(root)
    got = []
    while True:
        c = q.claim()
        if c is None:
            break
        got.append(c[0])
        q.complete(c[0])
    Path(out_file).write_text(json.dumps(got))


def test_concurrent_claim_exclusivity(tmp_path):
    """N processes hammering claim() must partition the jobs exactly."""
    q = JobQueue(tmp_path / "q")
    jobs = [q.enqueue({"i": i}) for i in range(40)]

    ctx = mp.get_context("spawn")
    outs = [tmp_path / f"w{k}.json" for k in range(4)]
    procs = [ctx.Process(target=_claim_worker, args=(str(tmp_path / "q"), str(o)))
             for o in outs]
    for p in procs:
        p.start()
    for p in procs:
        p.join(60)
        assert p.exitcode == 0
    claimed = [j for o in outs for j in json.loads(o.read_text())]
    assert sorted(claimed) == sorted(jobs)  # every job exactly once
    assert q.drained() and q.counts()["done"] == 40


def test_work_loop(tmp_path):
    q = JobQueue(tmp_path / "q")
    for i in range(5):
        q.enqueue({"i": i})
    seen = []
    n = q.work(lambda rec: seen.append(rec["i"]) or {"ok": True},
               worker="w", poll_secs=0.01)
    assert n == 5 and sorted(seen) == list(range(5))
    # a raising job retries then fails, loop still drains
    q.enqueue({"i": 99}, "bad")

    def fn(rec):
        raise RuntimeError("nope")

    q.work(fn, worker="w", poll_secs=0.01)
    assert q.counts()["failed"] == 1


def test_drive_videos_queue_mode(tmp_path, monkeypatch):
    """drive_videos with QUEUE_DIR enqueues per-video jobs and drains them;
    a second (late) worker invocation finds nothing left."""
    import numpy as np

    cv2 = pytest.importorskip("cv2")
    from neuralstyletransferv1_tpu.apps import drive_videos as dv

    vid_dir = tmp_path / "in"
    vid_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("a.mp4", "b.mp4"):
        vw = cv2.VideoWriter(str(vid_dir / name),
                             cv2.VideoWriter_fourcc(*"mp4v"), 8, (32, 24))
        for _ in range(4):
            vw.write((rng.random((24, 32, 3)) * 255).astype(np.uint8))
        vw.release()

    processed = []
    monkeypatch.setattr(dv, "_run_chunk", lambda vid, env: processed.append(vid.name))
    monkeypatch.setenv("IN_DIR", str(vid_dir))
    monkeypatch.setenv("OUT_DIR", str(tmp_path / "out"))
    monkeypatch.setenv("QUEUE_DIR", str(tmp_path / "queue"))
    monkeypatch.setenv("MODELS", "pytorch:/nonexistent/x.pth")
    monkeypatch.setenv("CHUNK_STRATEGY", "chunk")

    assert dv.main([]) == 0
    assert sorted(processed) == ["a.mp4", "b.mp4"]
    q = JobQueue(tmp_path / "queue")
    assert q.counts()["done"] == 2

    # second run: idempotent enqueue, nothing to do
    processed.clear()
    assert dv.main([]) == 0
    assert processed == []


def test_drive_videos_static_shard(tmp_path, monkeypatch):
    import numpy as np

    cv2 = pytest.importorskip("cv2")
    from neuralstyletransferv1_tpu.apps import drive_videos as dv

    vid_dir = tmp_path / "in"
    vid_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("a.mp4", "b.mp4", "c.mp4"):
        vw = cv2.VideoWriter(str(vid_dir / name),
                             cv2.VideoWriter_fourcc(*"mp4v"), 8, (32, 24))
        for _ in range(3):
            vw.write((rng.random((24, 32, 3)) * 255).astype(np.uint8))
        vw.release()

    monkeypatch.setenv("IN_DIR", str(vid_dir))
    monkeypatch.setenv("OUT_DIR", str(tmp_path / "out"))
    monkeypatch.setenv("MODELS", "pytorch:/nonexistent/x.pth")
    monkeypatch.delenv("QUEUE_DIR", raising=False)

    got = {}
    for host in range(2):
        processed = []
        monkeypatch.setattr(dv, "_run_chunk",
                            lambda vid, env: processed.append(vid.name))
        monkeypatch.setenv("NUM_HOSTS", "2")
        monkeypatch.setenv("HOST_ID", str(host))
        assert dv.main([]) == 0
        got[host] = processed
    assert sorted(got[0] + got[1]) == ["a.mp4", "b.mp4", "c.mp4"]
    assert got[0] and got[1]
