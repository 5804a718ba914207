"""Benchmark: CF-NeRF training + K-sample inference throughput, with MFU.

Runs the flagship configuration from the reference launch script
(/root/reference/train_NF.sh: D=8, W=512, N_samples=128 with the 96+32
schedule, K=32 Monte-Carlo draws, 4 triangular Sylvester flows,
h_alpha=h_rgb=64):

  * TRAIN: the device-resident scan trainer (n_inner steps per dispatch),
    sweeping ray batch size x remat — every combination is tried
    independently (an OOM at one point never hides a later config).
  * INFERENCE: the jitted test-mode renderer (fixed-eps K draws, no
    log-det, fwd only) over a ray-batch sweep — the "K-sample inference"
    half of the BASELINE.json metric.

MFU framing (the FLOP model is in flops_per_ray below): at D8/W512/N128/K32
the model forward is ~4.8 MFLOP/point of matmuls => ~0.62 GFLOP/ray fwd and
~1.9 GFLOP/ray train (fwd+bwd ~= 3x fwd).  On a 197-TFLOP/s (bf16) v5e
chip the TRAIN compute ceiling is ~106k rays/s/chip and the INFERENCE
ceiling ~320k rays/s/chip: the 1M rays/s north-star in BASELINE.json is
~9x beyond physics at this config — vs_baseline is reported against it
regardless, with achieved MFU as the honest utilization measure.

Timing methodology: a concrete loss VALUE is fetched after the timed
region — on remote-tunneled runtimes block_until_ready() can return before
execution finishes, so only a value fetch is an honest fence.

Prints the headline JSON line (train rays/s is the headline metric;
inference and MFU ride along) immediately after the flagship sweeps, then
RE-prints a progressively more complete line after each extended section
(operating/student/serving/occ-train points) — consume the LAST parseable
line.  Extended sections are gated by a wall-clock budget (BENCH_BUDGET_S,
default 1100 s) so the run always terminates inside the driver window with
a valid record (BENCH_r03 was rc=124/parsed:null because the single line
printed only at the very end).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

D, W = 8, 512
INPUT_CH, INPUT_CH_VIEWS = 63, 27
H_SIZE = 64
N_FLOWS = 4
N_SAMPLES = 128
K_SAMPLES = 32

# bf16 peak matmul throughput per chip, by device_kind substring
PEAK_TFLOPS = {
    "v5 lite": 197.0, "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6 lite": 918.0, "v6e": 918.0,
    "cpu": 0.5,  # nominal, so MFU stays defined in CI
}


def matmul_flops_per_point(w: int = W, d: int = D) -> float:
    """Matmul FLOPs (2*m*n per row) of one model forward for one 3D point,
    one K handled separately (flow stack is elementwise, not matmul).
    K-independent: the trunk+heads dominate and are computed once per
    point regardless of the Monte-Carlo draw count."""
    mm = lambda fi, fo: 2.0 * fi * fo
    f = mm(INPUT_CH, w)
    skips = (d // 2,)
    for i in range(1, d):
        fan_in = w + INPUT_CH if (i - 1) in skips else w
        f += mm(fan_in, w)
    f += mm(w, w)                        # feature_linear
    f += mm(w, H_SIZE)                   # h_alpha_linear
    f += mm(w + INPUT_CH_VIEWS, w // 2)  # views_linear
    f += mm(w // 2, H_SIZE)              # h_rgb_linear
    for z in (1, 3):                     # flow amortization heads
        f += mm(H_SIZE, N_FLOWS * z * z) + 3 * mm(H_SIZE, N_FLOWS * z)
    return f


def flops_per_ray(train: bool, n_samples: int = N_SAMPLES,
                  w: int = W, d: int = D) -> float:
    per_point = matmul_flops_per_point(w, d)
    mult = 3.0 if train else 1.0  # bwd ~= 2x fwd matmul FLOPs
    return per_point * n_samples * mult


def peak_tflops() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_TFLOPS.items():
        if key in kind:
            return val
    return 197.0  # assume v5e-class if unknown


def _build(compute_dtype="bfloat16", remat=True, fused=None,
           n_samples=N_SAMPLES, k_samples=K_SAMPLES,
           net_width=W, net_depth=D):
    import jax
    import jax.numpy as jnp

    from cfnerf_tpu.models.nerf_flows import NeRFFlows
    from cfnerf_tpu.render.renderer import RenderConfig
    from cfnerf_tpu.train.step import TrainConfig

    on_tpu = jax.default_backend() == "tpu"
    if fused is None:
        fused = "on" if on_tpu else "off"
    model = NeRFFlows(
        net_depth=net_depth, net_width=net_width,
        input_ch=INPUT_CH, input_ch_views=INPUT_CH_VIEWS,
        skips=(net_depth // 2,), h_alpha_size=H_SIZE, h_rgb_size=H_SIZE,
        n_flows=N_FLOWS,
        k_samples=k_samples, use_viewdirs=True, type_flows="triangular",
        compute_dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32,
        flow_impl="pallas" if on_tpu else "xla",
    )
    rc = RenderConfig(
        n_samples=n_samples, perturb=True, use_viewdirs=True, fused=fused
    )
    tc = TrainConfig(
        H=512, W=512, focal=500.0, ndc=False, near=0.5, far=4.0,
        k_samples=k_samples, beta1=0.01, remat=remat,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 90), jnp.float32), is_test=True
    )["params"]
    return model, rc, tc, params


def _ray_batch(R, rng):
    import jax.numpy as jnp

    return (
        jnp.asarray(rng.randn(R, 3), jnp.float32),
        jnp.asarray(
            np.concatenate([rng.randn(R, 2) * 0.05, -np.ones((R, 1))], -1), jnp.float32
        ),
    )


def bench_train(batch_size: int, *, n_inner: int = 10, rounds: int = 3,
                remat: bool = False, n_samples: int = N_SAMPLES,
                k_samples: int = K_SAMPLES, net_width: int = W,
                net_depth: int = D, occ_n: int = 0,
                occ_candidates: int = 128, return_all: bool = False):
    """occ_n > 0: the occ-stage step (proposal-placed sampling at occ_n
    samples/ray + in-step proposal co-training, train/step.py
    OccTrainConfig) — the real per-step cost including placement and the
    co-train tax."""
    import jax
    import jax.numpy as jnp

    from cfnerf_tpu.train.step import make_train_loop

    model, rc, tc, params = _build(remat=remat,
                                   n_samples=occ_n or n_samples,
                                   k_samples=k_samples, net_width=net_width,
                                   net_depth=net_depth)
    occ = None
    if occ_n:
        from cfnerf_tpu.ops.occupancy import ProposalMLP
        from cfnerf_tpu.train.step import OccTrainConfig

        occ = OccTrainConfig(lo=(-4.0, -4.0, -4.0), hi=(4.0, 4.0, 4.0),
                             n_candidates=occ_candidates)
    train_loop, tx = make_train_loop(model, rc, tc, mesh=None,
                                     n_inner=n_inner, occ=occ)
    opt_state = tx.init(params)
    if occ is not None:
        prop = ProposalMLP(width=occ.prop_width, depth=occ.prop_depth,
                           multires=occ.prop_multires)
        opt_state = train_loop._wrap_state(
            opt_state, prop.init(jax.random.PRNGKey(2))
        )

    rng = np.random.RandomState(0)
    ro, rd = _ray_batch(batch_size * n_inner, rng)
    batches = {
        "rays_o": ro.reshape(n_inner, batch_size, 3),
        "rays_d": rd.reshape(n_inner, batch_size, 3),
        "target": jnp.asarray(rng.rand(n_inner, batch_size, 3), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    params, opt_state, metrics = train_loop(params, opt_state, batches, key)
    _ = float(metrics["loss"][-1])  # compile + honest fence

    rates = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        params, opt_state, metrics = train_loop(params, opt_state, batches, key)
        _ = float(metrics["loss"][-1])
        rates.append(batch_size * n_inner / (time.perf_counter() - t0))
    return rates if return_all else max(rates)


def bench_inference(batch_size: int, *, rounds: int = 3, n_reps: int = 10,
                    n_samples: int = N_SAMPLES,
                    k_samples: int = K_SAMPLES, net_width: int = W,
                    net_depth: int = D, occ_n: int = 0, occ_res: int = 128,
                    occ_candidates: int = 192, occ_impl: str = "proposal",
                    return_all: bool = False):
    """Test-mode K-sample render throughput (fixed eps, no grad).

    occ_n > 0: occupancy-accelerated serving path (ops/occupancy.py) —
    render occ_n placement-guided samples per ray instead of the dense
    n_samples schedule.  occ_impl='proposal' uses the TPU path (tiny MLP
    proxy, pure matmuls) at its real architecture/candidate count;
    'grid' uses a random dense-positive voxel grid at the real occ_res^3
    footprint (worst case for the gather), so either way the measured
    placement overhead is honest."""
    import jax
    import jax.numpy as jnp

    from cfnerf_tpu.models.nerf_flows import make_fused_apply
    from cfnerf_tpu.render.renderer import make_render_rays

    model, rc, tc, params = _build(n_samples=occ_n or n_samples,
                                   k_samples=k_samples,
                                   net_width=net_width, net_depth=net_depth)

    def model_apply(p, x, *, is_test, rng):
        return model.apply({"params": p}, x, is_test=is_test, rng=rng)

    rr = make_render_rays(
        model_apply, rc, None, make_fused_apply(model, rc.fused)
    )
    if occ_n:
        lo = jnp.array([-4.0, -4.0, -4.0])
        hi = jnp.array([4.0, 4.0, 4.0])
        if occ_impl == "proposal":
            from cfnerf_tpu.ops.occupancy import (
                ProposalMLP,
                make_placed_render_rays,
                make_proposal_sigma_fn,
            )

            prop = ProposalMLP()
            pparams = prop.init(jax.random.PRNGKey(1))
            rr = make_placed_render_rays(
                rr, make_proposal_sigma_fn(prop, pparams, lo, hi),
                occ_n, n_candidates=occ_candidates,
            )
        else:
            from cfnerf_tpu.ops.occupancy import make_occ_render_rays

            grid = jnp.asarray(
                np.exp(np.random.RandomState(1).randn(occ_res, occ_res, occ_res)),
                jnp.float32,
            )
            rr = make_occ_render_rays(
                rr, grid, lo, hi, occ_n, n_candidates=occ_candidates,
            )
    rng = np.random.RandomState(0)
    ro, rd = _ray_batch(batch_size, rng)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    near = jnp.full((batch_size, 1), 0.5)
    far = jnp.full((batch_size, 1), 4.0)

    @jax.jit
    def run(params, ro, rd, vd, near, far):
        def body(_, carry):
            # the carry feeds the inputs so XLA cannot hoist the render out
            # of the loop as loop-invariant (which would fake a >1 MFU)
            out = rr(params, ro + carry * 1e-20, rd, vd, near, far, None,
                     is_test=True)
            return out["rgb_map"].mean()
        # n_reps sequential renders per dispatch amortize dispatch latency
        return jax.lax.fori_loop(0, n_reps, body, 0.0)

    _ = float(run(params, ro, rd, vd, near, far))  # compile
    rates = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _ = float(run(params, ro, rd, vd, near, far))
        rates.append(batch_size * n_reps / (time.perf_counter() - t0))
    return rates if return_all else max(rates)


def _spread_pct(rates) -> float:
    """(max-min)/mean of the per-round rates, in % — the within-process
    timing-noise bound for classifying round-over-round headline drift
    (VERDICT r02 weak-item 3: r01->r02 drifted -2.7% with no variance
    context)."""
    if not rates or len(rates) < 2:
        return 0.0
    return 100.0 * (max(rates) - min(rates)) / (sum(rates) / len(rates))


def _sweep(fn, combos, label):
    best, best_cfg, best_rates = 0.0, None, []
    for combo in combos:
        try:
            rates = fn(**combo, return_all=True)
            rps = max(rates)
            print(f"# {label} {combo}: {rps:,.0f} rays/s "
                  f"(spread {_spread_pct(rates):.1f}%)", file=sys.stderr)
            if rps > best:
                best, best_cfg, best_rates = rps, combo, rates
        except Exception as e:
            print(f"# {label} {combo}: failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
    return best, best_cfg, best_rates


def compact_bench_line(result: dict) -> str:
    """Headline-only JSON line for stdout (<= 1 KB).

    BENCH_r03/r04 regression fix (VERDICT r04 task 2, third attempt): the
    driver tail-captures stdout, and the old progressive re-emit's final
    line grew to ~6 KB — larger than the capture window, so the tail
    started MID-LINE and nothing parsed (parsed:null two rounds running).
    The full sectioned record goes to BENCH_full.json; stdout prints this
    compact headline each time, so whatever line the driver tails last is
    short and parseable.
    """
    compact = {k: result[k] for k in (
        "metric", "value", "unit", "vs_baseline", "spread_pct",
        "train_mfu", "inference_rays_per_sec", "inference_mfu",
        "sections_completed", "sections_skipped_budget") if k in result}
    for sec, keys in (("serving_point", ("inference_rays_per_sec",
                                         "train_rays_per_sec",
                                         "vs_north_star")),
                      ("operating_point", ("train_rays_per_sec",
                                           "inference_rays_per_sec")),
                      ("student_point", ("train_rays_per_sec",
                                         "inference_rays_per_sec"))):
        if sec in result:
            compact[sec] = {k: result[sec][k] for k in keys
                            if k in result[sec]}
    compact["full"] = "BENCH_full.json"
    line = json.dumps(compact)
    assert len(line) <= 1024, (
        f"compact bench line is {len(line)} bytes (> 1 KB driver "
        f"tail-capture budget) — trim fields")
    return line


def main():
    # BENCH_r03 regression fix (VERDICT r03 next-1): the single JSON line
    # used to print only after EVERY extended sweep; the driver's timeout
    # killed the run first (rc 124, parsed null).  Now the flagship
    # headline JSON prints IMMEDIATELY after the flagship sweeps, and a
    # progressively more complete line is re-printed after each extended
    # section — whatever line was printed last is a valid, parseable
    # record.  A wall-clock budget (BENCH_BUDGET_S, default 1100 s) gates
    # each extended section: when it's exhausted, remaining sections are
    # skipped with a note instead of overrunning the driver window.
    import os

    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1100"))

    def remaining() -> float:
        return budget_s - (time.perf_counter() - t_start)

    # combos trimmed to the per-section historical winners (full grids were
    # swept in rounds 1-5; see BENCH_r01-r03 tails) + one fallback for the
    # headline pair.
    peak = peak_tflops() * 1e12
    baseline = 1_000_000.0  # north-star rays/sec/chip (BASELINE.json)

    # headline TRAIN sweep first — its winner IS the metric, so the first
    # JSON line lands after it even if everything downstream is killed
    train_combos = [
        dict(batch_size=2048, remat=False, n_inner=40),
        dict(batch_size=4096, remat=False, n_inner=20),
    ]
    train_best, train_cfg, train_rates = _sweep(bench_train, train_combos, "train")

    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(train_best, 1),
        "unit": "rays/s",
        "vs_baseline": round(train_best / baseline, 4),
        "spread_pct": round(_spread_pct(train_rates), 2),
        "train_mfu": round(train_best * flops_per_ray(train=True) / peak, 4),
        "train_gflop_per_ray": round(flops_per_ray(True) / 1e9, 3),
        "compute_ceiling_rays_per_sec": round(peak / flops_per_ray(True), 0),
        "config": f"D8 W512 N128 K32 flows4 bf16 train={train_cfg}",
        "sections_completed": ["flagship_train"],
        "note": (
            "1M rays/s north-star is ~9x above the matmul-FLOP ceiling at "
            "the flagship config on v5e (see module docstring FLOP model); "
            "the serving point CLEARS it by reducing samples-per-ray at "
            "matched quality (proposal-guided placement, EVAL_r06.json)"
        ),
    }

    def emit():
        # full record to file, compact headline to stdout (see
        # compact_bench_line) — the driver tails stdout and must land on a
        # short parseable final line.
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_full.json"), "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
        print(compact_bench_line(result), flush=True)

    emit()  # headline lands even if a later section is killed

    infer_best, infer_cfg, infer_rates = _sweep(
        bench_inference, [dict(batch_size=32768)], "infer"
    )
    result.update(
        inference_rays_per_sec=round(infer_best, 1),
        inference_spread_pct=round(_spread_pct(infer_rates), 2),
        inference_mfu=round(infer_best * flops_per_ray(train=False) / peak, 4),
        config=(f"D8 W512 N128 K32 flows4 bf16 "
                f"train={train_cfg} infer={infer_cfg}"),
    )
    result["sections_completed"].append("flagship_infer")
    emit()

    def section_fits(label: str, est_s: float) -> bool:
        if remaining() >= est_s:
            return True
        print(f"# skipping {label}: {remaining():.0f}s left < ~{est_s:.0f}s "
              "needed (BENCH_BUDGET_S)", file=sys.stderr)
        result.setdefault("sections_skipped_budget", []).append(label)
        emit()
        return False

    # per-section wall estimates below are from the timestamped r04c run
    # (compile dominates: ~100-260 s per section on the tunnel); sections
    # are ordered by importance — the serving/occ-train points carry the
    # repo's flagship claims, operating/student ride behind them.

    # serving point (EVAL_r06: proposal-guided occupancy placement at the
    # W384 student — quality matched to the dense N48 eval at N=16 placed
    # samples, table + ablations in EVAL_r06.json).  This is the K-sample
    # inference path a deployment would run.
    # EVAL_r17+r23 (round 5): serving quality is FLAT across placement
    # candidates C in {32..192} (max |dPSNR| 0.024 dB on the same
    # checkpoint; the ~-0.25 dB offset vs dense is the occ-eval shift,
    # constant in C), and speed is monotonic in 1/C: C=32 is 1.20x the
    # C=128 rate — serving benches at C=32.  Train-side keeps C=128
    # (EVAL_r14/r15/r20: the coarser grid costs quality there).
    if section_fits("serving_point", 110):
        sv_best, sv_cfg, _ = _sweep(
            bench_inference,
            [dict(batch_size=32768, net_width=384, occ_n=16, occ_candidates=32)],
            "serving",
        )
        result["serving_point"] = {
            "n_samples_placed": 16, "n_candidates": 32, "net_width": 384,
            "impl": "proposal",
            "inference_rays_per_sec": round(sv_best, 1),
            "config": f"infer={sv_cfg}",
            "quality_evidence": (
                "EVAL_r06.json (matched PSNR/SSIM/AUSE vs dense N48); "
                "EVAL_r17.json + EVAL_r23.json (quality flat across C in "
                "{32..192}; C=32 fastest quality-equivalent)"),
            "vs_north_star": round(sv_best / 1_000_000.0, 4),
            # the serving CURVE (EVAL_r06 measurements, same checkpoint;
            # deltas vs its dense-N48 eval 30.46 dB / 0.9734 / -6.46 nat /
            # 0.0577): pick N by the metric that matters — N16 clears 1M
            # rays/s at matched PSNR/SSIM/AUSE but KDE-NLL tightens +0.51
            # nat (K-spread concentration; --occ_floor is the recovery
            # knob), N24/N32 BEAT dense on PSNR and hold AUSE at smaller
            # NLL shifts.
            # EVAL_r12: --occ_floor recovers the N16 NLL shift monotonically
            # (0.30/0.45/0.60 -> -5.96/-6.04/-6.12 vs dense -6.46) at
            # <=0.07 dB PSNR cost; N20 is DOMINATED by N24 (no lane-aligned
            # tile -> unfused fallback at 47% of the curve).  Serving S
            # stays in {16, 24, 32, 48}.
            "floor_recovery_r12": {
                "N16_f0.30_nll": -5.957, "N16_f0.45_nll": -6.045,
                "N16_f0.60_nll": -6.120, "dense_N48_nll": -6.463,
            },
            "curve_r06": {
                "N16_f0.30": {"rays_per_sec": 1372942, "psnr_delta": 0.011,
                              "ssim_delta": -0.0011, "ause_delta": 0.0,
                              "kde_nll_delta_nat": 0.506},
                "N24_f0.15": {"rays_per_sec": 973139, "psnr_delta": 0.225,
                              "ssim_delta": -0.0002, "ause_delta": -0.0016,
                              "kde_nll_delta_nat": 0.350},
                "N32_f0.15": {"rays_per_sec": 781568, "psnr_delta": 0.308,
                              "ssim_delta": 0.0002, "ause_delta": -0.0017,
                              "kde_nll_delta_nat": 0.216},
            },
        }
        result["sections_completed"].append("serving_point")
        emit()

    # occ-train point (EVAL_r07: proposal-placed TRAINING after a dense
    # warmup — beats the dense-trained baseline on PSNR/AUSE at these
    # throughputs; step cost includes placement + proposal co-training)
    if "serving_point" in result and section_fits("occ_train", 140):
        ot_best, ot_cfg, _ = _sweep(
            bench_train,
            [dict(batch_size=65536, remat=False, net_width=384, occ_n=12)],
            "occ_train",
        )
        sp = result["serving_point"]
        sp["train_rays_per_sec"] = round(ot_best, 1)
        sp["train_config"] = f"train={ot_cfg}"
        # EVAL_r09 3-seed paired verdict: occ_train=12 matches-or-beats
        # occ16 at every seed on PSNR (pool 30.08 vs 29.88 dB) and AUSE
        # (0.055 vs 0.058) at 615k rays/s device step rate; occ8 (878k)
        # LOSES ~1.4 dB pooled — N12 is the matched-quality train-side
        # frontier on this scene.
        sp["train_quality_evidence"] = (
            "EVAL_r07.json (occ16 beats dense on PSNR/AUSE, 3 paired seeds); "
            "EVAL_r09.json (occ12 matches occ16 quality at 1.25x its rate; "
            "occ8 loses 1.4 dB pooled — N12 is the matched-quality frontier); "
            "EVAL_r11.json (N8 stays dead at floor 0.45; occ12+cooldown is "
            "the calibration variant — every-seed NLL win for -0.63 dB mean "
            "PSNR)"
        )
        result["sections_completed"].append("occ_train")
        emit()

    # operating point (EVAL_r04: N_samples=48 + K-schedule — the best
    # quality-per-wall config in the r04 screen) — raw ray throughput
    # at N=48; the quality evidence incl. seed spread lives in EVAL_r04.json
    if section_fits("operating_point", 120):
        op_train_best, op_train_cfg, _ = _sweep(
            bench_train,
            [dict(batch_size=4096, remat=False, n_inner=20, n_samples=48)],
            "op_train",
        )
        op_infer_best, op_infer_cfg, _ = _sweep(
            bench_inference, [dict(batch_size=32768, n_samples=48)], "op_infer"
        )
        result["operating_point"] = {
            "n_samples": 48,
            "train_rays_per_sec": round(op_train_best, 1),
            "train_mfu": round(op_train_best * flops_per_ray(True, 48) / peak, 4),
            "inference_rays_per_sec": round(op_infer_best, 1),
            "inference_mfu": round(
                op_infer_best * flops_per_ray(False, 48) / peak, 4),
            "config": f"train={op_train_cfg} infer={op_infer_cfg}",
            "quality_evidence": "EVAL_r04.json (N48 screen + seed spread)",
        }
        result["sections_completed"].append("operating_point")
        emit()

    # student trunk (EVAL_r05: W384 at N48 — near-matched quality at
    # ~0.57x per-point FLOPs; quality deltas + seed spread in EVAL_r05.json)
    if section_fits("student_point", 260):
        st_train_best, st_train_cfg, _ = _sweep(
            bench_train,
            [dict(batch_size=16384, remat=False, n_samples=48, net_width=384)],
            "student_train",
        )
        st_infer_best, st_infer_cfg, _ = _sweep(
            bench_inference,
            [dict(batch_size=131072, n_samples=48, net_width=384)],
            "student_infer",
        )
        result["student_point"] = {
            "n_samples": 48, "net_width": 384,
            "train_rays_per_sec": round(st_train_best, 1),
            "train_mfu": round(
                st_train_best * flops_per_ray(True, 48, 384) / peak, 4),
            "inference_rays_per_sec": round(st_infer_best, 1),
            "inference_mfu": round(
                st_infer_best * flops_per_ray(False, 48, 384) / peak, 4),
            "config": f"train={st_train_cfg} infer={st_infer_cfg}",
            "quality_evidence": "EVAL_r05.json (W384 seed pool + 20k confirm)",
        }
        result["sections_completed"].append("student_point")
        emit()



if __name__ == "__main__":
    main()
