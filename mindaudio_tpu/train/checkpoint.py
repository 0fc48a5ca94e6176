"""Checkpoint save/restore/averaging via orbax.

Replaces the reference's ModelCheckpoint/SaveCallBack/ResumeCallback +
offline ``average_model.py`` (reference utils/callback.py:256-494,
utils/average_model.py:10-53). State is a pytree (params + opt state + step);
``average_checkpoints`` reproduces the reference's top-/last-N parameter mean
that its published Conformer CER depends on (conformer.yaml ``avg_30``).
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "average_checkpoints",
    "list_steps",
    "load_scores",
    "CheckpointManager",
]

_STEP_DIR = re.compile(r"^step_(\d+)$")


def list_steps(directory):
    """Committed checkpoint steps (temp ``*.orbax-checkpoint-tmp`` dirs of
    in-flight saves are excluded)."""
    if not os.path.isdir(directory):
        return []
    steps = []
    for d in os.listdir(directory):
        m = _STEP_DIR.match(d)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def save_checkpoint(directory, state, step):
    """Write ``state`` pytree at ``directory/step_{step}`` (blocking).

    Multi-process: call on ALL processes — orbax save is a global collective
    (it synchronizes every JAX process and lets the primary host write);
    gating it on ``process_index() == 0`` deadlocks the other ranks'
    next collective. This replaces the reference's lock-file rank-0
    coordination (reference callback.py:122-156) with orbax's own barriers.
    """
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.close()  # flush the async metadata commit before returning
    return path


def restore_checkpoint(directory, step=None, target=None):
    """Restore a pytree; latest step when ``step`` is None."""
    directory = os.path.abspath(directory)
    if step is None:
        steps = list_steps(directory)
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        step = steps[-1]
    path = os.path.join(directory, f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    try:
        if target is not None:
            return ckptr.restore(path, target=target)
        return ckptr.restore(path)
    finally:
        ckptr.close()


def average_checkpoints(directory, steps: Sequence[int], target=None):
    """Parameter-average N checkpoints (reference average_model.py:22-53).

    ``steps`` selects which ``step_*`` checkpoints to average — callers pick
    top-N by eval loss or last-N, as the recipes do. Only floating-point
    leaves are averaged; integer/bool leaves (``step``, optax ``count``, …)
    are taken from the *last* step so a full ``TrainState`` round-trips with
    its structure and dtypes intact.
    """
    assert steps, "need at least one checkpoint"

    def _averaged(dtype):
        # integer/bool leaves (step counters, optax count, rng keys) are not
        # averaged; everything else (f32/f64/bf16/complex) is
        return np.dtype(dtype).kind not in "iub"

    acc = None
    for s in steps:
        ckpt = restore_checkpoint(directory, step=s, target=target)
        if acc is None:
            orig_dtypes = jax.tree_util.tree_map(lambda x: np.asarray(x).dtype, ckpt)
            acc = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64)
                if _averaged(np.asarray(x).dtype) else np.asarray(x),
                ckpt,
            )
        else:
            acc = jax.tree_util.tree_map(
                lambda a, x: a + np.asarray(x, np.float64)
                if _averaged(np.asarray(x).dtype)
                else np.asarray(x),  # non-float: keep the latest value
                acc, ckpt,
            )
    n = float(len(steps))
    return jax.tree_util.tree_map(
        lambda a, dt: (a / n).astype(dt) if _averaged(dt) else a,
        acc, orig_dtypes,
    )


def load_scores(directory):
    """step -> eval metric recorded by a CheckpointManager in ``directory``."""
    import json

    path = os.path.join(os.path.abspath(directory), "eval_scores.json")
    if not os.path.exists(path):
        return {}
    with open(path, encoding="utf-8") as f:
        return {int(k): float(v) for k, v in json.load(f).items()}


class CheckpointManager:
    """Rolling save with ``keep_max`` retention + best-by-metric tracking
    (the EvalCallback behavior, reference callback.py:256-448)."""

    def __init__(self, directory, keep_max=30, keep_best=None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_max = keep_max
        # best-scored steps protected from recency pruning — defaults to
        # keep_max so "average the N best" always has its inputs on disk
        # (the reference keeps eval'd ckpts for averaging, callback.py:401)
        self.keep_best = keep_max if keep_best is None else keep_best
        # step -> eval metric, persisted so a later decode process can pick
        # the best-N (the reference writes an eval-loss YAML per ckpt,
        # callback.py:333-355)
        self.scores = load_scores(self.directory)

    def save(self, state, step, eval_metric=None):
        """Call on ALL processes (see :func:`save_checkpoint`); score-file
        writes and retention pruning are process-0 side effects."""
        save_checkpoint(self.directory, state, step)
        if eval_metric is not None:
            self.scores[step] = float(eval_metric)
            if jax.process_index() == 0:
                self._write_scores()
        if jax.process_index() == 0:
            self._prune()

    def _write_scores(self):
        import json

        path = os.path.join(self.directory, "eval_scores.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump({str(k): v for k, v in self.scores.items()}, f)

    def _prune(self):
        steps = list_steps(self.directory)
        if len(steps) <= self.keep_max:
            return
        protected = set(steps[-self.keep_max:]) | set(self.best_steps(self.keep_best))
        import shutil

        pruned = False
        for s in steps:
            if s not in protected:
                shutil.rmtree(os.path.join(self.directory, f"step_{s}"),
                              ignore_errors=True)
                pruned = self.scores.pop(s, None) is not None or pruned
        if pruned:  # a pruned step must drop its score
            self._write_scores()

    def best_steps(self, n):
        """Top-n steps by (ascending) eval metric — feed to average_checkpoints."""
        ranked = sorted(self.scores.items(), key=lambda kv: kv[1])
        return [s for s, _ in ranked[:n]]

    def average_best(self, n, target=None):
        return average_checkpoints(self.directory, self.best_steps(n), target=target)


def _main():
    """CLI: offline checkpoint averaging (reference utils/average_model.py:10).

    Usage: python -m mindaudio_tpu.train.checkpoint --ckpt_dir DIR
           [--num 30] [--steps 100 200 ...] --output DIR/avg
    """
    import argparse

    parser = argparse.ArgumentParser(description="average checkpoints")
    parser.add_argument("--ckpt_dir", required=True)
    parser.add_argument("--num", type=int, default=30, help="last-N to average")
    parser.add_argument("--steps", type=int, nargs="*", default=None)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    steps = args.steps or list_steps(args.ckpt_dir)[-args.num:]
    avg = average_checkpoints(args.ckpt_dir, steps)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.output), avg, force=True)
    ckptr.close()
    print(f"averaged {len(steps)} checkpoints {steps} -> {args.output}")


if __name__ == "__main__":
    _main()
