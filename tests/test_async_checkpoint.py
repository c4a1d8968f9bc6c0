"""Async (write-behind) checkpointing semantics.

Single-process saves are scheduled on a background worker
(`utils/checkpoint.py`) so the orbax serialization overlaps the next
epoch's device work; every read helper must drain the pending write
first, errors must surface at the next flush, and per-directory
backpressure must keep at most one write in flight.
"""

import threading

import jax
import numpy as np
import pytest

from otfusion_tpu.utils.checkpoint import (
    _PENDING,
    checkpoint_exists,
    flush_checkpoints,
    load_metadata,
    restore_checkpoint,
    save_checkpoint,
)


class _State:
    """Minimal TrainState stand-in (params/batch_stats/opt_state/step)."""

    def __init__(self, value):
        self.params = {"w": np.full((4, 4), float(value), np.float32)}
        self.batch_stats = {"m": np.full((4,), float(value), np.float32)}
        self.opt_state = ()
        self.step = 0

    def replace(self, **kw):
        out = _State(0.0)
        out.params = kw.get("params", self.params)
        out.batch_stats = kw.get("batch_stats", self.batch_stats)
        out.opt_state = kw.get("opt_state", self.opt_state)
        out.step = kw.get("step", self.step)
        return out


def test_read_helpers_drain_pending_write(tmp_path):
    d = tmp_path / "ckpt"
    save_checkpoint(d, _State(3.0), {"epoch": 7})
    # No manual flush: the read helpers must block on the worker.
    assert checkpoint_exists(d)
    assert load_metadata(d)["epoch"] == 7
    restored = restore_checkpoint(d, _State(0.0))
    np.testing.assert_array_equal(restored.params["w"],
                                  np.full((4, 4), 3.0, np.float32))


def test_payload_is_snapshotted_not_aliased(tmp_path):
    d = tmp_path / "ckpt"
    state = _State(1.0)
    save_checkpoint(d, state, {"epoch": 1})
    # Mutating the live state after save must not leak into the write:
    # save_checkpoint snapshots (COPIES — np.asarray alone aliases
    # ndarray leaves) on the caller's thread, because the train step
    # donates/overwrites these buffers right after.
    state.params["w"][:] = -99.0
    flush_checkpoints()
    restored = restore_checkpoint(d, _State(0.0))
    np.testing.assert_array_equal(restored.params["w"],
                                  np.full((4, 4), 1.0, np.float32))


def test_last_save_wins(tmp_path):
    d = tmp_path / "ckpt"
    save_checkpoint(d, _State(1.0), {"epoch": 1})
    save_checkpoint(d, _State(2.0), {"epoch": 2})
    flush_checkpoints()
    assert load_metadata(d)["epoch"] == 2
    restored = restore_checkpoint(d, _State(0.0))
    np.testing.assert_array_equal(restored.params["w"],
                                  np.full((4, 4), 2.0, np.float32))


def test_flush_propagates_worker_errors(tmp_path):
    d = tmp_path / "ckpt"
    save_checkpoint(d, _State(1.0))
    flush_checkpoints()
    # Make the atomic swap fail: a FILE occupying the .tmp slot makes the
    # worker's shutil.rmtree(tmp_dir) raise NotADirectoryError.
    tmp_slot = tmp_path / "ckpt.tmp"
    tmp_slot.write_text("in the way")
    save_checkpoint(d, _State(2.0))
    with pytest.raises(OSError):
        flush_checkpoints()
    tmp_slot.unlink()
    # The error drained the pending entry; the directory still holds the
    # previous good checkpoint.
    restored = restore_checkpoint(d, _State(0.0))
    np.testing.assert_array_equal(restored.params["w"],
                                  np.full((4, 4), 1.0, np.float32))


def test_block_true_is_synchronous(tmp_path):
    d = tmp_path / "ckpt"
    save_checkpoint(d, _State(5.0), {"epoch": 1}, block=True)
    assert d.exists()  # durable before return, no flush needed
    assert str(d.resolve()) not in _PENDING


def test_backpressure_one_inflight_per_directory(tmp_path):
    # Saturate the single worker with a slow job, then schedule two saves
    # to the same directory: the second save_checkpoint call must block
    # until the first write drains (never >1 queued payload per dir).
    gate = threading.Event()
    from otfusion_tpu.utils import checkpoint as ckpt

    fut = ckpt._executor().submit(gate.wait, 10)
    d = tmp_path / "ckpt"
    save_checkpoint(d, _State(1.0))  # queued behind the gate
    assert not (d.exists())  # worker hasn't reached it yet

    t = threading.Thread(target=save_checkpoint, args=(d, _State(2.0)))
    t.start()
    t.join(timeout=0.3)
    assert t.is_alive()  # blocked on the in-flight write to d
    gate.set()
    t.join(timeout=30)
    assert not t.is_alive()
    flush_checkpoints()
    assert fut.result(timeout=1) is True
    restored = restore_checkpoint(d, _State(0.0))
    np.testing.assert_array_equal(restored.params["w"],
                                  np.full((4, 4), 2.0, np.float32))
