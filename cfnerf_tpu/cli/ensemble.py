"""Ensemble training / evaluation.

The reference exposes ensembles only as checkpoint-name indices
(--index_ensembles / --index_step, run_nerf_uncertainty_NF.py:713-716,
:1086) with the member loop left to external launch scripts.  This module
makes the workflow first-class:

  train:  python -m cfnerf_tpu.cli.ensemble train --n_members 3 <flags...>
          trains members 1..N sequentially (distinct seeds + ckpt indices)
  eval:   python -m cfnerf_tpu.cli.ensemble eval --n_members 3 <flags...>
          renders each member's K draws per held-out view and aggregates:
          the predictive distribution is the MIXTURE over members
          (mean over M*K samples, std over M*K samples).
"""
from __future__ import annotations

import copy
import json
import os
import sys
from typing import List

import numpy as np

from cfnerf_tpu.utils.config import config_parser


def _member_args(args, member: int):
    a = copy.deepcopy(args)
    a.index_ensembles = member
    a.seed = args.seed + 1000 * member
    return a


def train_ensemble(args, n_members: int) -> None:
    from cfnerf_tpu.train.loop import train

    for m in range(1, n_members + 1):
        print(f"=== training ensemble member {m}/{n_members} ===")
        train(_member_args(args, m))


def train_ensemble_parallel(args, n_members: int) -> None:
    """All M members in ONE jit over an (ensemble, data) mesh — the
    TPU-native replacement for launching the reference script M times
    (parallel/ensemble.py has the design note).  Members keep exactly the
    serial workflow's semantics: member m trains with seed
    `args.seed + 1000*m`, its own shuffled ray stream, and checkpoints
    as ensemble index m in the shared run dir — `cli.ensemble eval`
    consumes the result identically either way.

    Covers the batching and single-image sampling paths, COLMAP depth
    supervision, --k_schedule stages, and the occ placement stage
    (per-member proposal distilled at the boundary).  Hierarchical
    N_importance and render cadences (i_img/i_video/i_testset) are left
    to the serial path — eval_ensemble is the rendering entry here.
    """
    import jax
    import jax.numpy as jnp

    from cfnerf_tpu.data.sampler import (
        DepthRayBatcher,
        RayBatcher,
        SingleImageSampler,
        precompute_depth_rays,
        precompute_rays,
    )
    from cfnerf_tpu.models.factory import create_nerf, loss_mode_for_model
    from cfnerf_tpu.parallel.ensemble import (
        create_ensemble_mesh,
        make_ensemble_train_loop,
        make_ensemble_train_step,
        member_keys,
        shard_member_batch,
        shard_member_stacked_batch,
        shard_members,
        stack_members,
        unstack_member,
    )
    from cfnerf_tpu.train import checkpoint as ckpt
    from cfnerf_tpu.train.logging import MetricsLogger
    from cfnerf_tpu.train.loop import (
        _snapshot_args,
        k_for_step,
        load_dataset,
        occ_floor_for_step,
        parse_k_schedule,
    )
    from cfnerf_tpu.train.step import TrainConfig
    from cfnerf_tpu.utils.config import warn_ignored_flags

    warn_ignored_flags(args)
    if args.N_importance > 0:
        raise ValueError(
            "--parallel ensemble training does not take the hierarchical "
            "coarse+fine path (it LOSES at matched iters on TPU anyway — "
            "PERF.md); train members serially if you need it"
        )
    if args.render_only:
        raise ValueError("--render_only has no parallel-ensemble mode; use "
                         "cli.ensemble eval")

    scene = load_dataset(args)
    H, W, focal = scene["H"], scene["W"], scene["focal"]
    rundir = ckpt.run_dir(args.basedir, args.dataname, args.type_flows, args.expname)
    _snapshot_args(args, rundir)

    mesh = create_ensemble_mesh(
        n_members, args.mesh_devices if args.mesh_devices > 0 else None
    )
    n_data = mesh.shape["data"]
    if args.N_rand % n_data != 0:
        raise ValueError(
            f"N_rand={args.N_rand} must be divisible by the mesh data axis "
            f"({n_data}; ensemble axis took {mesh.shape['ensemble']})"
        )

    # per-member build + resume (same seeds/ckpt indices the serial path uses)
    member_params, starts = [], []
    model = render_config = None
    for m in range(1, n_members + 1):
        margs = _member_args(args, m)
        model, _fine, render_config, p, start_m = create_nerf(margs)
        member_params.append(jax.device_get(p))
        starts.append(start_m)
    if len(set(starts)) > 1:
        raise ValueError(
            f"ensemble members resume at different steps {starts}; finish "
            "the stragglers serially (cli.ensemble train) or clear the run "
            "dir — the parallel trainer advances all members in lockstep"
        )
    start = starts[0]
    params = shard_members(mesh, stack_members(member_params))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"ensemble-parallel: {n_members} members x "
          f"{n_params // n_members:,} params over mesh {dict(mesh.shape)} "
          f"(resume step {start})")

    # per-member ray streams (each member sees the stream its serial run
    # would: precompute + batcher seeded with the member seed)
    use_batching = not args.no_batching
    member_batchers, member_depth = [], []
    for m in range(1, n_members + 1):
        seed_m = args.seed + 1000 * m
        if use_batching:
            rays_m = precompute_rays(
                scene["images"], scene["poses"], focal, scene["i_train"],
                seed=seed_m,
            )
            member_batchers.append(
                RayBatcher(rays_m, args.N_rand, seed=seed_m, mesh_divisor=n_data)
            )
        else:
            member_batchers.append(SingleImageSampler(
                scene["images"], scene["poses"], focal, scene["i_train"],
                args.N_rand, precrop_iters=args.precrop_iters,
                precrop_frac=args.precrop_frac, seed=seed_m,
            ))
        if args.colmap_depth:
            if not use_batching:
                raise ValueError("--colmap_depth requires the batching path")
            from cfnerf_tpu.train.loop import N_DEPTH

            rays_depth = precompute_depth_rays(
                scene["depth_gts"], scene["poses"], H, W, focal,
                scene["i_train"], seed=seed_m,
            )
            member_depth.append(DepthRayBatcher(rays_depth, N_DEPTH, seed=seed_m))

    tc = TrainConfig(
        H=H, W=W, focal=focal,
        ndc=(args.dataset_type == "llff" and not args.no_ndc),
        near=scene["near"], far=scene["far"],
        k_samples=args.K_samples,
        lrate=args.lrate, lrate_decay=args.lrate_decay, start_step=start,
        beta1=args.beta1,
        colmap_depth=args.colmap_depth, depth_lambda=args.depth_lambda,
        loss_mode=loss_mode_for_model(getattr(args, "model", None)),
    )

    # held-out internal-val stream, per member (the stream the reference
    # builds and never consumes, run_nerf_uncertainty_NF.py:877-885,
    # :954-963; the serial trainer logs val/mse+val/psnr — here each member
    # renders the SAME val ray batch in test mode so the per-member scalars
    # are a paired comparison, feeding the --gate_metric val_psnr/val_nll
    # autogate).  Val renders consume no training RNG: member trajectories
    # are bit-identical with or without this stream.
    val_batcher, val_fn = None, None
    if (use_batching and args.i_print > 0
            and len(scene["i_val_internal"]) > 0):
        rays_rgb_val = precompute_rays(
            scene["images"], scene["poses"], focal, scene["i_val_internal"],
            seed=args.seed + 1,
        )
        if rays_rgb_val.shape[0] >= args.N_rand:
            val_batcher = RayBatcher(
                rays_rgb_val, args.N_rand, seed=args.seed + 1,
                mesh_divisor=n_data,
            )
            from cfnerf_tpu.models.nerf_flows import make_fused_apply
            from cfnerf_tpu.ops.metrics import img2mse, mse2psnr
            from cfnerf_tpu.render.renderer import make_render_rays, prepare_rays
            from cfnerf_tpu.train.loss import kde_nll

            render_val = make_render_rays(
                lambda p, x, *, is_test, rng: model.apply(
                    {"params": p}, x, is_test=is_test, rng=rng),
                render_config, None,
                make_fused_apply(model, render_config.fused),
            )

            def _member_val(p, ro, rd, target):
                ro2, rd2, vd, near_v, far_v = prepare_rays(
                    ro, rd, H=H, W=W, focal=focal, ndc=tc.ndc,
                    use_viewdirs=args.use_viewdirs,
                    near=scene["near"], far=scene["far"],
                )
                out = render_val(params=p, rays_o=ro2, rays_d=rd2,
                                 viewdirs=vd, near=near_v, far=far_v,
                                 rng=None, is_test=True)
                mse = img2mse(out["rgb_map"].mean(-1), target)
                nll = kde_nll(out["rgb_map"], target, args.K_samples)
                return mse, mse2psnr(mse), nll

            @jax.jit
            def val_fn(ps, ro, rd, target):
                return jax.vmap(
                    _member_val, in_axes=(0, None, None, None)
                )(ps, ro, rd, target)

    # --- stage machinery (K-schedule / occ), ensemble-step flavored ---
    occ_n = int(getattr(args, "occ_train", 0) or 0)
    occ_from = int(getattr(args, "occ_train_from", 0) or 0)
    occ_until = int(getattr(args, "occ_train_until", 0) or 0)
    occ_anneal = int(getattr(args, "occ_floor_anneal", 0) or 0)
    occ_floor_start = float(getattr(args, "occ_floor_start", 1.0))
    occ_cfg = None
    if occ_n > 0:
        from cfnerf_tpu.ops.occupancy import aabb_from_scene
        from cfnerf_tpu.train.step import OccTrainConfig

        occ_lo, occ_hi = aabb_from_scene(scene, args)
        occ_cfg = OccTrainConfig(
            lo=tuple(float(x) for x in np.asarray(occ_lo)),
            hi=tuple(float(x) for x in np.asarray(occ_hi)),
            n_candidates=args.occ_candidates, floor=args.occ_floor,
        )
        if occ_until > 0 and occ_until <= occ_from:
            raise ValueError(f"--occ_train_until {occ_until} must be > "
                             f"--occ_train_from {occ_from}")
        print(f"occ training (ensemble-parallel): N={occ_n} placed "
              f"samples/ray from step {occ_from}"
              + (f" until {occ_until}" if occ_until > 0 else ""))

    k_stages = parse_k_schedule(args.k_schedule) if getattr(args, "k_schedule", "") else None
    n_inner = max(1, getattr(args, "n_inner", 1))
    _cache = {}

    def _stage(k, occ_on):
        import dataclasses

        key = (k, occ_on)
        if key not in _cache:
            m_k = model.clone(k_samples=k)
            tc_k = dataclasses.replace(tc, k_samples=k)
            rc_k = render_config
            occ_arg = None
            if occ_on:
                rc_k = dataclasses.replace(render_config, n_samples=occ_n)
                occ_arg = occ_cfg
            if n_inner > 1:
                fn, tx_k = make_ensemble_train_loop(
                    m_k, rc_k, tc_k, mesh, n_inner=n_inner, occ=occ_arg
                )
            else:
                fn, tx_k = make_ensemble_train_step(
                    m_k, rc_k, tc_k, mesh, occ=occ_arg
                )
            _cache[key] = (fn, tx_k)
        return _cache[key]

    k0 = k_for_step(k_stages, start + 1) if k_stages else args.K_samples
    step_fn, tx = _stage(k0, False)
    opt_state = jax.vmap(tx.init)(params)

    logger = MetricsLogger(args.basedir, args.dataname, args.expname)
    keys = member_keys([
        jax.random.PRNGKey(args.seed + 1000 * m + start)
        for m in range(1, n_members + 1)
    ])

    def _member_batch(m, step):
        b = (member_batchers[m].next(step) if not use_batching
             else member_batchers[m].next())
        if member_depth:
            b.update(member_depth[m].next())
            b.pop("ray_weights")
        return b

    def _stacked_batch(step, occ_on):
        bs = [_member_batch(m, step) for m in range(n_members)]
        out = {k: np.stack([b[k] for b in bs]) for k in bs[0]}
        if occ_on and occ_anneal > 0:
            f = occ_floor_for_step(step, occ_from, occ_anneal,
                                   occ_floor_start, args.occ_floor)
            out["occ_floor"] = np.full((n_members,), f, np.float32)
        return out

    occ_wrapped = False
    n_iters = args.n_iters + 1
    i = start
    import time
    while i < n_iters - 1:
        t0 = time.time()
        i_prev = i
        k_cur = k_for_step(k_stages, i + 1) if k_stages else args.K_samples
        occ_on = (occ_cfg is not None and (i + 1) >= occ_from
                  and (occ_until <= 0 or (i + 1) < occ_until))
        step_fn, _ = _stage(k_cur, occ_on)
        if not occ_on and occ_wrapped:
            opt_state = opt_state[0]
            occ_wrapped = False
            print(f"occ stage ended at step {i + 1}: dense cooldown")
        if occ_on and not occ_wrapped:
            # per-member proposal distillation at the boundary (each
            # member's proposal fits ITS OWN current field)
            from cfnerf_tpu.ops.occupancy import distill_proposal, make_density_fn

            t_d = time.time()
            props = []
            params_host = jax.device_get(params)
            for m in range(n_members):
                _, pp, dloss = distill_proposal(
                    make_density_fn(model, unstack_member(params_host, m),
                                    render_config),
                    jnp.asarray(occ_cfg.lo), jnp.asarray(occ_cfg.hi),
                    jax.random.PRNGKey(args.seed + 1000 * (m + 1) + 77),
                    width=occ_cfg.prop_width, depth=occ_cfg.prop_depth,
                    multires=occ_cfg.prop_multires,
                    n_points=1 << 18, epochs=2,
                )
                props.append(jax.device_get(pp))
            prop_params = shard_members(mesh, stack_members(props))
            opt_state = step_fn._wrap_state(opt_state, prop_params)
            occ_wrapped = True
            print(f"occ stage: {n_members} proposals distilled in "
                  f"{time.time() - t_d:.1f}s; training at N={occ_n}")

        if n_inner > 1:
            samples = [_stacked_batch(i + 1 + j, occ_on) for j in range(n_inner)]
            stacked = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            stacked = shard_member_stacked_batch(mesh, stacked)
            i += n_inner
            params, opt_state, metrics = step_fn(params, opt_state, stacked, keys)
            metrics = {k: v[-1] for k, v in metrics.items()}
        else:
            batch = shard_member_batch(mesh, _stacked_batch(i + 1, occ_on))
            i += 1
            kk = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
            keys, step_keys = kk[:, 0], kk[:, 1]
            params, opt_state, metrics = step_fn(params, opt_state, batch, step_keys)
        if n_inner > 1:
            # next dispatch gets a fresh per-member key chain (the scan
            # split its n_inner step keys from the current stack upfront)
            keys = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)

        if args.i_weights > 0 and (i_prev // args.i_weights) != (i // args.i_weights):
            params_host = jax.device_get(params)
            opt_host = jax.device_get(opt_state)
            for m in range(n_members):
                path = ckpt.save_checkpoint(
                    rundir, i, unstack_member(params_host, m),
                    unstack_member(opt_host, m), m + 1,
                )
            print(f"Saved {n_members} member checkpoints at step {i}")

        if args.i_print > 0 and (i_prev // args.i_print) != (i // args.i_print):
            metrics = jax.device_get(metrics)
            scalars = {
                "train/loss": float(np.mean(metrics["loss"])),
                "train/psnr": float(np.mean(metrics["psnr"])),
                "iter_time": time.time() - t0,
            }
            for m in range(n_members):
                scalars[f"train/psnr_m{m + 1:02d}"] = float(metrics["psnr"][m])
            if val_fn is not None:
                vb = val_batcher.next()
                v_mse, v_psnr, v_nll = jax.device_get(val_fn(
                    params, vb["rays_o"], vb["rays_d"], vb["target"]))
                scalars["val/mse"] = float(np.mean(v_mse))
                scalars["val/psnr"] = float(np.mean(v_psnr))
                for m in range(n_members):
                    scalars[f"val/psnr_m{m + 1:02d}"] = float(v_psnr[m])
                    scalars[f"val/nll_m{m + 1:02d}"] = float(v_nll[m])
            logger.scalars(i, scalars)
            print(f"[ensemble-parallel] step {i}: "
                  f"loss={scalars['train/loss']:.4f} "
                  f"psnr/member=" + "/".join(
                      f"{float(metrics['psnr'][m]):.2f}" for m in range(n_members)))

    logger.close()
    print("Ensemble-parallel training complete.")


def member_metric_medians(metrics_path: str, n_members: int,
                          metric: str = "train/psnr",
                          window: int = 10) -> dict:
    """Per-member medians of a logged scalar from a run's metrics.jsonl.

    Parallel-trained runs (train_ensemble_parallel) log a tagged
    `<metric>_mXX` scalar per member — read those directly.  Serial
    runs (train_ensemble) append each member's records into the same
    summaries file with no member tag; their step counters ascend per
    member and reset when the next member starts, so records are
    segmented on step resets and attributed to members 1..M in launch
    order.  Returns {member: median of the last `window` values}.

    `metric` is the logged scalar name: "train/psnr" (always present),
    or the held-out stream "val/psnr" / "val/nll" (logged at i_print
    cadence when the run had an internal-val split — the stream the
    reference builds and never consumes, run_nerf_uncertainty_NF.py
    :877-885, :954-963).
    """
    recs = []
    with open(metrics_path) as f:
        for line in f:
            line = line.strip()
            if line:
                recs.append(json.loads(line))

    tagged = {}
    for m in range(1, n_members + 1):
        key = f"{metric}_m{m:02d}"
        vals = [r[key] for r in recs if key in r]
        if vals:
            tagged[m] = float(np.median(vals[-window:]))
    if len(tagged) == n_members:
        return tagged
    if tagged:
        raise ValueError(
            f"{metrics_path}: found tagged {metric} for members "
            f"{sorted(tagged)} but n_members={n_members} — partial "
            "parallel-training log; pass an explicit --members subset"
        )

    # serial fallback: segment untagged records on step resets
    seq = [(r["step"], r[metric]) for r in recs
           if metric in r and "step" in r]
    if not seq:
        raise ValueError(
            f"{metrics_path}: no {metric} records"
            + (" — val scalars require an internal-val split (logged at "
               "i_print cadence); gate on train_psnr instead"
               if metric.startswith("val/") else ""))
    segments, cur = [], [seq[0]]
    for prev, nxt in zip(seq, seq[1:]):
        if nxt[0] <= prev[0]:
            segments.append(cur)
            cur = []
        cur.append(nxt)
    segments.append(cur)
    if len(segments) != n_members:
        raise ValueError(
            f"{metrics_path}: records segment into {len(segments)} serial "
            f"training runs but n_members={n_members} — resumed or mixed "
            "logs can't be attributed; pass an explicit --members subset"
        )
    return {m: float(np.median([p for _, p in seg][-window:]))
            for m, seg in enumerate(segments, 1)}


def member_train_psnrs(metrics_path: str, n_members: int,
                       window: int = 10) -> dict:
    """Back-compat wrapper: per-member train-side PSNR medians."""
    return member_metric_medians(metrics_path, n_members, "train/psnr",
                                 window=window)


# gate metric registry: logged scalar name, whether HIGHER is better, the
# unit label, and which threshold argument applies (dB for PSNR gates,
# nat for the NLL gate).
GATE_METRICS = {
    "train_psnr": ("train/psnr", True, "dB"),
    "val_psnr": ("val/psnr", True, "dB"),
    "val_nll": ("val/nll", False, "nat"),
}


def auto_member_subset(args, n_members: int,
                       threshold_db: float = 2.0,
                       gate_metric: str = "train_psnr",
                       threshold_nat: float = 1.0) -> List[int]:
    """The EVAL_r13 lesson, automated: a bad ensemble member is
    identifiable from the run's own logged scalars with no human in the
    loop.  Flags members whose per-member median sits more than the
    threshold on the wrong side of the member median and returns the
    surviving subset for the mixture.

    Gate metrics (--gate_metric):
      train_psnr  (default) — the EVAL_r13 failure mode: the weak seed
                  trained 5+ dB below its peers throughout.
      val_psnr    — same statistic on the held-out internal-val stream,
                  robust to train-side overfit (the EVAL_r11 100k overfit
                  trained fine but collapsed held-out).
      val_nll     — held-out calibration: EVAL_r18's member 2 matched its
                  peers on train PSNR (32.2 vs 32.5 dB median) but sat
                  ~1.8 nat worse on held-out NLL — invisible to the PSNR
                  gates, caught here.  Threshold is --members_auto_nat
                  ABOVE the member median (lower NLL is better).
    """
    if gate_metric not in GATE_METRICS:
        raise ValueError(f"--gate_metric {gate_metric!r} not in "
                         f"{sorted(GATE_METRICS)}")
    metric, higher_better, unit = GATE_METRICS[gate_metric]
    threshold = threshold_db if unit == "dB" else threshold_nat
    metrics_path = os.path.join(
        args.basedir, args.dataname, "summaries", args.expname,
        "metrics.jsonl",
    )
    meds = member_metric_medians(metrics_path, n_members, metric)
    med = float(np.median(list(meds.values())))
    if higher_better:
        keep = [m for m in sorted(meds) if meds[m] >= med - threshold]
    else:
        keep = [m for m in sorted(meds) if meds[m] <= med + threshold]
    dropped = [m for m in sorted(meds) if m not in keep]
    report = ", ".join(f"m{m:02d}={meds[m]:.2f} {unit}"
                       + (" [DROPPED]" if m in dropped else "")
                       for m in sorted(meds))
    sign = "-" if higher_better else "+"
    print(f"--members auto: {metric} medians {report} "
          f"(member median {med:.2f}, threshold {sign}{threshold:.1f} {unit})")
    if not keep:
        # degenerate (all members equally bad relative to a skewed median
        # can't happen, but guard anyway): gate nothing
        print("--members auto: no member survives the gate; keeping all")
        return list(range(1, n_members + 1))
    if dropped:
        print(f"--members auto: dropping {dropped} from the mixture "
              "(EVAL_r13: subset mixtures beat every member once the bad "
              "seed is gone)")
    return keep


def eval_ensemble(args, n_members: int, members=None) -> dict:
    """Mixture eval over ensemble members (M·K draws, equal weight).

    `members` (1-based indices, default all of 1..n_members) selects a
    SUBSET mixture — the production lever for a bad seed: a laggard member
    is identifiable from train-side PSNR alone (EVAL_r13: the weak member
    trained 5+ dB below its peers throughout, no val data needed), and
    dropping it recovers the mixture.  CLI: --members 1,3.
    """
    import jax.numpy as jnp

    from cfnerf_tpu.cli.eval import kde_nll_per_pixel
    from cfnerf_tpu.models.factory import create_nerf
    from cfnerf_tpu.ops.metrics import sparsification_plot, ssim, std_over_k, to8b
    from cfnerf_tpu.render.renderer import make_render_rays, render_image
    from cfnerf_tpu.train import checkpoint as ckpt
    from cfnerf_tpu.train.loop import load_dataset

    if members is None:
        members = list(range(1, n_members + 1))
    members = sorted(set(int(m) for m in members))
    if not members or any(m < 1 or m > n_members for m in members):
        raise ValueError(
            f"--members must pick from 1..{n_members}, got {members}"
        )

    scene = load_dataset(args)
    H, W, focal = scene["H"], scene["W"], scene["focal"]
    rf = args.render_factor
    He, We, fe = (H, W, focal) if rf == 0 else (H // rf, W // rf, focal / rf)

    from cfnerf_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(args.mesh_devices if args.mesh_devices > 0 else None)

    # per-member renders
    member_renders: List[dict] = []
    member_steps: List[int] = []
    start = 0
    for m in members:
        margs = _member_args(args, m)
        model, model_fine, render_config, params, start = create_nerf(margs)
        if start == 0:
            # a member without a checkpoint would mix FRESH RANDOM params
            # into the ensemble and silently poison every aggregate metric
            raise FileNotFoundError(
                f"ensemble member {m:02d}: no checkpoint found under the "
                f"run dir for expname={margs.expname!r} — train all "
                f"members first (cli.ensemble train)"
            )

        def model_apply(p, x, *, is_test, rng, _model=model):
            return _model.apply({"params": p}, x, is_test=is_test, rng=rng)

        fine_apply = None
        if model_fine is not None:
            def fine_apply(p, x, *, is_test, rng, _model=model_fine):
                return _model.apply({"params": p}, x, is_test=is_test, rng=rng)

        from cfnerf_tpu.models.nerf_flows import make_fused_apply

        rr = make_render_rays(
            model_apply, render_config, fine_apply,
            make_fused_apply(model, render_config.fused),
        )
        renders = {}
        for view in scene["i_val"]:
            out = render_image(
                rr, params, jnp.asarray(scene["poses"][view]),
                H=He, W=We, focal=fe,
                ndc=(args.dataset_type == "llff" and not args.no_ndc),
                use_viewdirs=args.use_viewdirs,
                near=scene["near"], far=scene["far"], tile=args.chunk,
                mesh=mesh,
            )
            renders[view] = np.asarray(out["rgb_map"])  # (H, W, 3, K)
        member_renders.append(renders)
        member_steps.append(start)
        print(f"member {m}: rendered {len(renders)} views @ step {start}")

    if len(set(member_steps)) > 1:
        print(f"WARNING: ensemble members restored at different steps "
              f"{member_steps}; the output dir is tagged with the last one")

    # aggregate: mixture over members -> (H, W, 3, M*K)
    rundir = ckpt.run_dir(args.basedir, args.dataname, args.type_flows, args.expname)
    tag = (f"eval_ensemble{n_members}" if len(members) == n_members
           else "eval_ensemble_m" + "-".join(str(m) for m in members))
    outdir = os.path.join(rundir, f"{tag}_{start:06d}")
    os.makedirs(outdir, exist_ok=True)

    import imageio.v2 as imageio

    per_view = []
    for view in scene["i_val"]:
        rgb_k = np.concatenate([mr[view] for mr in member_renders], axis=-1)
        MK = rgb_k.shape[-1]
        gt = scene["images"][view]
        if rf != 0:
            import cv2
            gt = cv2.resize(gt, (We, He), interpolation=cv2.INTER_AREA)
        rgb_mean = rgb_k.mean(-1)
        rgb_std = std_over_k(rgb_k)
        mse = float(((rgb_mean - gt) ** 2).mean())
        psnr = -10.0 * np.log10(mse)
        ssim_v = float(ssim(jnp.asarray(rgb_mean), jnp.asarray(gt)))
        nll = float(kde_nll_per_pixel(rgb_k, gt, MK).mean())
        err = ((rgb_mean - gt) ** 2).mean(-1).reshape(-1)
        var = (rgb_std ** 2).mean(-1).reshape(-1)
        oracle, by_var = sparsification_plot(var, err)
        ause = float(np.mean(by_var - oracle))
        per_view.append(dict(view=int(view), psnr=psnr, ssim=ssim_v, nll=nll, ause=ause))
        imageio.imwrite(os.path.join(outdir, f"{view:03d}_pred.png"), to8b(rgb_mean))
        imageio.imwrite(
            os.path.join(outdir, f"{view:03d}_std.png"),
            to8b(rgb_std / (rgb_std.max() + 1e-8)),
        )

    summary = {
        "n_members": len(members),
        "members": members,
        "psnr": float(np.mean([v["psnr"] for v in per_view])),
        "ssim": float(np.mean([v["ssim"] for v in per_view])),
        "nll": float(np.mean([v["nll"] for v in per_view])),
        "ause": float(np.mean([v["ause"] for v in per_view])),
        "views": per_view,
    }
    with open(os.path.join(outdir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "views"}))
    return summary


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("train", "eval"):
        print("usage: python -m cfnerf_tpu.cli.ensemble {train|eval} "
              "--n_members N <training flags...>")
        sys.exit(2)
    mode = argv.pop(0)
    parser = config_parser()
    parser.add_argument("--n_members", type=int, default=3)
    parser.add_argument(
        "--parallel", action="store_true",
        help="train all members simultaneously in one jit over an "
             "(ensemble, data) mesh (parallel/ensemble.py) instead of "
             "serially — M members in ~the wall-time of one when the mesh "
             "has >= M devices",
    )
    parser.add_argument(
        "--members", type=str, default="",
        help="eval only: comma-separated 1-based member subset for the "
             "mixture (e.g. 1,3) — drop a laggard member identified from "
             "its train-side PSNR (EVAL_r13: a weak seed trains 5+ dB "
             "below its peers and drags the mixture); 'auto' gates "
             "outlier members from the run's own metrics.jsonl "
             "(auto_member_subset); default all members",
    )
    parser.add_argument(
        "--members_auto_db", type=float, default=2.0,
        help="--members auto gate: drop members whose PSNR-gate median "
             "is more than this many dB below the member median "
             "(EVAL_r13's bad seed sat 3.5-5 dB low)",
    )
    parser.add_argument(
        "--gate_metric", type=str, default="train_psnr",
        choices=sorted(GATE_METRICS),
        help="--members auto gate signal: train_psnr (EVAL_r13 failure "
             "mode), or the held-out internal-val stream val_psnr / "
             "val_nll (robust to train-side overfit; val_nll catches "
             "calibration outliers the PSNR gates cannot see — EVAL_r18)",
    )
    parser.add_argument(
        "--members_auto_nat", type=float, default=1.0,
        help="--gate_metric val_nll threshold: drop members whose val NLL "
             "median is more than this many nat ABOVE the member median "
             "(EVAL_r18's calibration outlier sat ~1.8 nat high)",
    )
    args = parser.parse_args(argv)
    if mode == "train":
        if args.parallel:
            train_ensemble_parallel(args, args.n_members)
        else:
            train_ensemble(args, args.n_members)
    else:
        if args.members.strip().lower() == "auto":
            subset = auto_member_subset(
                args, args.n_members, threshold_db=args.members_auto_db,
                gate_metric=args.gate_metric,
                threshold_nat=args.members_auto_nat,
            )
        else:
            subset = ([int(s) for s in args.members.split(",") if s.strip()]
                      if args.members else None)
        eval_ensemble(args, args.n_members, members=subset)


if __name__ == "__main__":
    main()
