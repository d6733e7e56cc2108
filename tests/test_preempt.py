"""GracefulStop: SIGTERM / sentinel-file stop watcher (runtime/preempt.py).

The reference trainer has no graceful-stop path (Lightning loop, killed
hard on preemption); ours turns SIGTERM or a STOP file into a clean
checkpoint-and-exit. These tests cover the watcher itself; the train-loop
wiring is exercised by the quality-loop CLI runs.
"""
import os
import signal

from mdgen_tpu.runtime import GracefulStop


def test_sentinel_file_triggers_stop(tmp_path):
    sentinel = str(tmp_path / "STOP")
    w = GracefulStop(sentinel, install_signal=False)
    assert not w.poll()
    assert not w.poll()
    open(sentinel, "w").close()
    assert w.poll()
    # latched: removing the file does not un-stop
    os.remove(sentinel)
    assert w.poll()


def test_sigterm_triggers_stop(tmp_path):
    w = GracefulStop(str(tmp_path / "STOP"))
    try:
        assert not w.poll()
        os.kill(os.getpid(), signal.SIGTERM)
        assert w.poll()
    finally:
        w.close()


def test_close_restores_previous_handler(tmp_path):
    seen = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
    try:
        w = GracefulStop(None)
        w.close()
        os.kill(os.getpid(), signal.SIGTERM)
        assert seen == [signal.SIGTERM]
        assert not w.poll()
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_no_sentinel_path_never_stats(tmp_path):
    w = GracefulStop(None, install_signal=False)
    assert not w.poll()


def test_clear_sentinel_removes_stale_file(tmp_path):
    # a STOP file committed by a previous run must not latch a resumed run
    sentinel = str(tmp_path / "STOP")
    open(sentinel, "w").close()
    w = GracefulStop(sentinel, install_signal=False)
    assert w.clear_sentinel()
    assert not os.path.exists(sentinel)
    assert not w.poll()  # cleared before first poll -> no stop
    # idempotent when there is nothing to clear
    assert not w.clear_sentinel()


def test_clear_sentinel_keeps_prequeued_stop(tmp_path):
    """With ckpt_dir: only a CONSUMED sentinel (older than the newest step_*
    checkpoint) is stale. A sentinel newer than every checkpoint — or in a
    checkpoint-less dir — is a pre-queued stop for this run and must stay
    (code-review round 5: the watchdog-vs-pipelined-launch race)."""
    import time

    d = tmp_path / "run"
    d.mkdir()
    sentinel = str(d / "STOP")

    # checkpoint-less dir: a pre-queued STOP is honored
    open(sentinel, "w").close()
    w = GracefulStop(sentinel, install_signal=False)
    assert not w.clear_sentinel(str(d))
    assert os.path.exists(sentinel) and w.poll()

    # consumed: a step_* dir written after the sentinel -> stale -> removed
    time.sleep(0.05)
    (d / "step_100").mkdir()
    w2 = GracefulStop(sentinel, install_signal=False)
    assert w2.clear_sentinel(str(d))
    assert not os.path.exists(sentinel) and not w2.poll()

    # pre-queued: sentinel NEWER than the newest checkpoint -> kept
    time.sleep(0.05)
    open(sentinel, "w").close()
    w3 = GracefulStop(sentinel, install_signal=False)
    assert not w3.clear_sentinel(str(d))
    assert os.path.exists(sentinel) and w3.poll()
