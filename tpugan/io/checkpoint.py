"""Orbax-backed checkpointing with step metadata and auto-resume.

Replaces the reference's raw ``torch.save(E.state_dict())`` every 5000
iterations (E_align_cropping_s1.py:296-297) — unlike the reference,
optimizer state and the step counter are checkpointed too, so training
resumes exactly (SURVEY.md §5 calls out that the reference never
checkpoints optimizer state).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax


def _ckpt_dir(path):
    os.makedirs(path, exist_ok=True)
    return path


def save_checkpoint(path: str, state: Any, step: int) -> str:
    """Save a pytree under ``path/step_<N>`` (atomic via orbax).

    Multi-host: call from EVERY process (orbax coordinates the save with
    a cross-process barrier; gating it on process 0 would deadlock), and
    ``path`` must resolve to the same shared filesystem on all hosts."""
    import orbax.checkpoint as ocp

    target = os.path.join(os.path.abspath(_ckpt_dir(path)), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(target, state, force=True)
    ckptr.wait_until_finished()
    return target


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        m = re.match(r"step_(\d+)$", name)
        if m and os.path.isdir(os.path.join(path, name)):
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def load_checkpoint(path: str, template: Any, step: Optional[int] = None) -> tuple[Any, int]:
    """Restore ``template``-structured state from ``path`` (latest step by
    default). Returns (state, step)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    target = os.path.join(os.path.abspath(path), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        template,
    )
    state = ckptr.restore(target, abstract)
    return state, step
