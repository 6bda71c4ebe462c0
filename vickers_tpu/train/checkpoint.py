"""Checkpointing: Orbax for native state, .pth export for reference compat.

The reference saves bare ``model.state_dict()`` as best.pth / last.pth with
no optimizer/epoch state, so it cannot truly resume (train.py:668-678,
SURVEY §5).  Here:

- ``save_native`` / ``load_native``: FULL train state (params, batch_stats,
  opt_state, epoch counter, best metric) via Orbax — crash-safe resume, a
  capability the reference lacks.
- ``export_pth``: the same weights in the reference's best.pth format via
  ``compat.convert.flax_to_torch_state_dict`` so reference tooling (and our
  compat entry points) can consume checkpoints interchangeably.
"""

from __future__ import annotations

import os
import queue
import threading
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _as_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class AsyncWriter:
    """One background thread that serializes checkpoint writes in order.

    best.pth/best.ckpt export doubled epoch wall-clock while val_dice was
    improving (round-4 profile finding): torch pickling + msgpack of ~100 MB
    ran on the training thread.  The device->host fetch stays on the caller's
    thread (one relay round trip, unavoidable); serialization + file IO move
    here.  ``drain()`` blocks until the queue is empty and re-raises the
    first worker error; ``close()`` drains and joins the thread.
    """

    def __init__(self) -> None:
        self._q: "queue.Queue" = queue.Queue()
        self._err: Optional[BaseException] = None
        self._t = threading.Thread(
            target=self._work, name="ckpt-writer", daemon=True)
        self._t.start()

    def _work(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            fn, args, kwargs = item
            try:
                fn(*args, **kwargs)
            except BaseException as e:  # surfaced on the next submit/drain
                self._err = e
            finally:
                self._q.task_done()

    def submit(self, fn, *args, **kwargs) -> None:
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        self._q.put((fn, args, kwargs))

    def drain(self) -> None:
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self) -> None:
        self._q.join()
        self._q.put(None)
        self._t.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def save_native(path: str | Path, tree: Dict[str, Any]) -> None:
    """Atomic-ish single-file checkpoint (flax msgpack).

    A single file keeps the format trivially portable; Orbax's directory
    layout is overkill for a 24M-param model and this path is also exercised
    on CPU test backends."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = serialization.to_bytes(_as_numpy(tree))
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_native(path: str | Path, target: Optional[Dict[str, Any]] = None):
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def load_resume_tree(path: str | Path, state) -> Dict[str, Any]:
    """Restore a last.ckpt for resume, tolerant of EMA config changes.

    ``from_bytes`` requires the template structure to exactly match the
    saved bytes, so resuming a pre-EMA checkpoint with ema_decay set (or
    vice versa) would raise.  Restore without a template first, then map
    each present key onto the live state's structure:

    - ckpt has no 'ema' but the run wants EMA -> EMA restarts from the
      restored live weights (the standard EMA warm start);
    - ckpt has 'ema' but the run disabled it -> the saved EMA is ignored.
    """
    raw = load_native(path)
    out = {
        "params": serialization.from_state_dict(state.params, raw["params"]),
        "batch_stats": serialization.from_state_dict(
            state.batch_stats, raw["batch_stats"]),
        "opt_state": serialization.from_state_dict(
            state.opt_state, raw["opt_state"]),
        "epoch": int(raw["epoch"]),
        "best_dice": float(raw["best_dice"]),
    }
    if state.ema is not None:
        if "ema" in raw:
            out["ema"] = serialization.from_state_dict(state.ema, raw["ema"])
        else:
            out["ema"] = {"params": out["params"],
                          "batch_stats": out["batch_stats"]}
    return out


def export_pth(path: str | Path, params, batch_stats) -> None:
    """Write weights in the reference's torch state-dict format (atomic)."""
    import torch

    from vickers_tpu.compat.convert import flax_to_torch_state_dict

    sd = flax_to_torch_state_dict(_as_numpy(params), _as_numpy(batch_stats))
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    torch.save(sd, str(tmp))
    os.replace(tmp, path)
