"""Checkpoint / resume (Orbax).

Parity target: the reference's torch .tar checkpointing
(/root/reference/run_nerf_uncertainty_NF.py:1085-1100 save, :345-374 load):
  * directory layout basedir/dataname/type_flows/expname/ (:349);
  * name pattern {step:06d}_{ensemble:02d} (:1086) — here a directory per
    checkpoint instead of a .tar file;
  * auto-resume from the newest checkpoint in the run dir, or from
    --index_step / --ft_path overrides (:351-355);
  * params are merged with a FILTERED state-dict update — keys absent from
    the current model are dropped, keys missing from the checkpoint keep
    their fresh init (tolerates architecture drift, :363-374);
  * optimizer state is deliberately NOT restored (:360-361).
"""
from __future__ import annotations

import os
import re
from typing import Any, List, Optional, Tuple

import jax
import numpy as np

# 6+ digits: {step:06d} grows past 6 digits for steps >= 1M and those
# checkpoints must still be found by auto-resume
_CKPT_RE = re.compile(r"^(\d{6,})_(\d{2})$")


def run_dir(basedir: str, dataname: str, type_flows: str, expname: str) -> str:
    return os.path.join(basedir, dataname, type_flows, expname)


def checkpoint_path(rundir: str, step: int, ensemble: int = 1) -> str:
    return os.path.join(rundir, f"{step:06d}_{ensemble:02d}")


def list_checkpoints(rundir: str) -> List[Tuple[int, int, str]]:
    """[(step, ensemble, path)] sorted by step."""
    if not os.path.isdir(rundir):
        return []
    out = []
    for name in sorted(os.listdir(rundir)):
        m = _CKPT_RE.match(name)
        if m:
            out.append((int(m.group(1)), int(m.group(2)), os.path.join(rundir, name)))
    return sorted(out)


def save_checkpoint(rundir: str, step: int, params: Any, opt_state: Any,
                    ensemble: int = 1) -> str:
    import orbax.checkpoint as ocp

    path = checkpoint_path(rundir, step, ensemble)
    ckptr = ocp.StandardCheckpointer()
    state = {
        "global_step": np.asarray(step),
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
    }
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    return path


def _filtered_merge(fresh: Any, loaded: Any) -> Any:
    """Reference-style tolerant merge: use loaded leaves where the path and
    shape match the fresh init; keep fresh leaves otherwise."""
    if isinstance(fresh, dict):
        out = {}
        for k, v in fresh.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = _filtered_merge(v, loaded[k])
            else:
                out[k] = v
        return out
    if loaded is None:
        return fresh
    fresh_arr = np.asarray(fresh)
    loaded_arr = np.asarray(loaded)
    if fresh_arr.shape == loaded_arr.shape:
        return loaded_arr.astype(fresh_arr.dtype)
    return fresh


def restore_checkpoint(
    path: str,
    fresh_params: Any,
) -> Tuple[Any, int]:
    """Restore params (filtered-merged into fresh_params) and global_step.
    Optimizer state is intentionally not returned (reference :360-361)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(os.path.abspath(path))
    step = int(np.asarray(raw.get("global_step", 0)))
    params = _filtered_merge(jax.device_get(fresh_params), raw.get("params", {}))
    return params, step


def find_resume_checkpoint(
    rundir: str,
    *,
    ft_path: Optional[str] = None,
    index_step: int = -1,
    ensemble: int = 1,
) -> Optional[str]:
    """Resolve which checkpoint to resume from (reference :346-355)."""
    if ft_path and ft_path != "None":
        return ft_path
    # only consider this ensemble member's checkpoints — the reference scans
    # all .tar files (:349) which makes later ensemble members silently
    # resume from earlier ones; filtering by index is the intended behavior
    ckpts = [c for c in list_checkpoints(rundir) if c[1] == ensemble]
    if not ckpts:
        return None
    if index_step == -1:
        return ckpts[-1][2]
    want = checkpoint_path(rundir, index_step, ensemble)
    return want if os.path.exists(want) else None
