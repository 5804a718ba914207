"""Fused NeRF trunk (MLP + heads) as Pallas TPU kernels.

The trunk is where CF-NeRF's matmul FLOPs live (~4.8 MFLOP/point at
D8/W512).  The XLA formulation round-trips every layer's (B, 512)
activation through HBM (~270 MB per layer at the flagship batch) which
caps it at ~55% MFU; these kernels keep ALL weights (~4.7 MB bf16) and the
activation tile resident in VMEM, so HBM sees only the embedded inputs
once and the two conditioning-vector outputs.

Computes encode() exactly (models.py:165-186 semantics, same math as
cfnerf_tpu.models.nerf_flows.NeRFFlows.encode, use_viewdirs=True):

    h_0 = relu(x @ W0 + b0)
    h_i = relu(h @ Wi + bi)                       i = 1..D-1, where the
    h_s = relu(x @ Wsx + h @ Wsh + bs)            skip concat after D//2 is
                                                  folded into a split matmul
    h_alpha = h @ Wha + bha
    f       = h @ Wf + bf
    hv      = relu(f @ Wvf + v @ Wvv + bv)        (concat folded again)
    h_rgb   = hv @ Whr + bhr

All odd widths (input_ch=63, views=27, heads=64) are zero-padded to lane
multiples OUTSIDE the kernels with differentiable jnp ops, so the pad/slice
adjoints route the kernel's padded gradients back to the true parameter
shapes automatically.

Backward is TWO kernels (VMEM is ~16 MB/core: weights + f32 dW accumulators
+ activations for one tile don't all fit in one): `top` recomputes through
the skip and backprops heads -> layer D//2+1, emitting the gradient at the
skip boundary; `bottom` backprops layers D//2..0.  dW/db accumulate across
the sequential row-tile grid into constant-index output blocks
(initialized at program_id 0).

INPUTS ARE DATA: the custom VJP returns zero cotangents for x/v — the
embedded points are never differentiated in training.  Use the XLA encode
path if input gradients are ever needed.

MEASURED (v5e, flagship D8/W512/N128/K32, batch 2048 rays, 2026-08):
  train  trunk=pallas 41.2k rays/s  vs  trunk=xla 47.1k rays/s
  infer  trunk=pallas 131.8k rays/s vs  trunk=xla 135.4k rays/s (T swept
  256..2048, flat)
The kernels run ~30% more efficient per executed FLOP, but the backward's
VMEM-resident recompute adds ~50% matmul FLOPs over XLA's saved-activation
backward, and XLA's per-layer matmuls at 262k rows already overlap their
HBM traffic with compute (the pure-MLP roofline here is ~71% MFU).  Net:
XLA wins at this batch regime, so `trunk_impl` defaults to "xla" and this
kernel is kept as a measured, tested alternative — the tradeoff flips
where activations don't fit HBM comfortably (much larger K*N per dispatch)
or on parts with a different VMEM/HBM balance.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _relu(x):
    return jnp.maximum(x, 0.0)


def _dot(a, b):
    """(T, I) @ (I, O) in bf16 with f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _dot_t(g, w):
    """g @ w^T: (T, O) x (I, O) -> (T, I)."""
    return jax.lax.dot_general(
        g.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _outer(h, g):
    """h^T @ g: (T, I) x (T, O) -> (I, O) weight gradient."""
    return jax.lax.dot_general(
        h.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _mask(h):
    """relu' as a multiplier; the compare runs in f32 — Mosaic on v5e
    rejects bf16 vector comparisons ("Target does not support this
    comparison")."""
    return (h.astype(jnp.float32) > 0).astype(jnp.float32)


def _bias_rows(depth):
    rows = {f"b{i}": i for i in range(depth)}
    rows.update(bf=depth, bv=depth + 1, bha=depth + 2, bhr=depth + 3)
    return rows


def _n_bias_rows(depth):
    return max(8, depth + 4)


# ------------------------------------------------------------------ #
# kernels
# ------------------------------------------------------------------ #

def _ws_dict(depth, refs):
    """Weight ref order: w0, then layers 1..depth-1 (the skip+1 slot is
    wsh), then wsx, wf, wha, wvf, wvv, whr."""
    skip = depth // 2
    ws = {"w0": refs[0]}
    k = 1
    for i in range(1, depth):
        ws["wsh" if i == skip + 1 else f"w{i}"] = refs[k]
        k += 1
    for name in ("wsx", "wf", "wha", "wvf", "wvv", "whr"):
        ws[name] = refs[k]
        k += 1
    return ws


def _n_weights(depth):
    return depth + 6


def _fwd_mlp(x, v, ws, bias_ref, *, depth):
    """Forward on one tile.  Returns (hs, f, hv, ha, hr) with hs the list
    of post-relu trunk activations."""
    rows = _bias_rows(depth)
    b = lambda name: bias_ref[rows[name] : rows[name] + 1, :]
    skip = depth // 2

    # activations stored bf16: halves VMEM per tile; relu masks and the
    # bf16 matmul casts are unaffected
    hs = []
    h = _relu(_dot(x, ws["w0"][:]) + b("b0")).astype(jnp.bfloat16)
    hs.append(h)
    for i in range(1, depth):
        if i == skip + 1:
            z = _dot(x, ws["wsx"][:]) + _dot(h, ws["wsh"][:]) + b(f"b{i}")
        else:
            z = _dot(h, ws[f"w{i}"][:]) + b(f"b{i}")
        h = _relu(z).astype(jnp.bfloat16)
        hs.append(h)

    ha = _dot(h, ws["wha"][:]) + b("bha")[:, : ws["wha"].shape[1]]
    f = (_dot(h, ws["wf"][:]) + b("bf")).astype(jnp.bfloat16)
    hv = _relu(_dot(f, ws["wvf"][:]) + _dot(v, ws["wvv"][:])
               + b("bv")[:, : ws["wvf"].shape[1]]).astype(jnp.bfloat16)
    hr = _dot(hv, ws["whr"][:]) + b("bhr")[:, : ws["whr"].shape[1]]
    return hs, f, hv, ha, hr


def _fwd_kernel(x_ref, v_ref, *refs, depth):
    *w_refs, bias_ref, ha_ref, hr_ref = refs
    ws = _ws_dict(depth, w_refs)
    _, _, _, ha, hr = _fwd_mlp(
        x_ref[:], v_ref[:], ws, bias_ref, depth=depth
    )
    ha_ref[:] = ha
    hr_ref[:] = hr


def _bwd_top_kernel(x_ref, v_ref, *refs, depth):
    """Heads + upper trunk half: consumes g_ha/g_hr, emits the gradient at
    the skip boundary (wrt post-relu h_skip), accumulates upper dW/db."""
    n_w = _n_weights(depth)
    w_refs = refs[:n_w]
    bias_ref, gha_ref, ghr_ref = refs[n_w : n_w + 3]
    (gskip_ref, dwsx_ref, dwsh_ref, dwf_ref, dwha_ref, dwvf_ref, dwvv_ref,
     dwhr_ref, dbias_ref, *dwu_refs) = refs[n_w + 3 :]
    ws = _ws_dict(depth, w_refs)
    skip = depth // 2
    rows = _bias_rows(depth)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dwsx_ref, dwsh_ref, dwf_ref, dwha_ref, dwvf_ref, dwvv_ref,
                  dwhr_ref, dbias_ref, *dwu_refs):
            r[:] = jnp.zeros_like(r)

    x = x_ref[:]
    v = v_ref[:]
    hs, f, hv, _, _ = _fwd_mlp(x, v, ws, bias_ref, depth=depth)

    def add_b(name, g):
        r = rows[name]
        gsum = jnp.sum(g, axis=0, keepdims=True)
        pad = dbias_ref.shape[-1] - gsum.shape[-1]
        if pad:
            gsum = jnp.pad(gsum, ((0, 0), (0, pad)))
        dbias_ref[r : r + 1, :] += gsum

    g_hr = ghr_ref[:]
    g_ha = gha_ref[:]
    dwhr_ref[:] += _outer(hv, g_hr)
    add_b("bhr", g_hr)
    g_hv = _dot_t(g_hr, ws["whr"][:]) * _mask(hv)
    dwvf_ref[:] += _outer(f, g_hv)
    dwvv_ref[:] += _outer(v, g_hv)
    add_b("bv", g_hv)
    g_f = _dot_t(g_hv, ws["wvf"][:])
    h_last = hs[depth - 1]
    dwf_ref[:] += _outer(h_last, g_f)
    add_b("bf", g_f)
    dwha_ref[:] += _outer(h_last, g_ha)
    add_b("bha", g_ha)

    g = _dot_t(g_f, ws["wf"][:]) + _dot_t(g_ha, ws["wha"][:])
    for i in range(depth - 1, skip, -1):
        g = g * _mask(hs[i])
        add_b(f"b{i}", g)
        if i == skip + 1:
            dwsh_ref[:] += _outer(hs[i - 1], g)
            dwsx_ref[:] += _outer(x, g)
            g = _dot_t(g, ws["wsh"][:])
        else:
            dwu_refs[i - skip - 2][:] += _outer(hs[i - 1], g)
            g = _dot_t(g, ws[f"w{i}"][:])
    gskip_ref[:] = g


def _bwd_bottom_kernel(x_ref, *refs, depth):
    """Layers skip..0 given the gradient at the skip boundary."""
    skip = depth // 2
    n_low = skip + 1  # w0..w{skip}
    w_refs = refs[:n_low]
    bias_ref, gskip_ref = refs[n_low : n_low + 2]
    dbias_ref = refs[n_low + 2]
    dw_refs = refs[n_low + 3 :]  # dw0..dw{skip}
    rows = _bias_rows(depth)
    b = lambda name: bias_ref[rows[name] : rows[name] + 1, :]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        for r in dw_refs:
            r[:] = jnp.zeros_like(r)

    x = x_ref[:]
    hs = []
    h = _relu(_dot(x, w_refs[0][:]) + b("b0"))
    hs.append(h)
    for i in range(1, skip + 1):
        h = _relu(_dot(h, w_refs[i][:]) + b(f"b{i}"))
        hs.append(h)

    g = gskip_ref[:]
    for i in range(skip, -1, -1):
        g = g * _mask(hs[i])
        gsum = jnp.sum(g, axis=0, keepdims=True)
        dbias_ref[rows[f"b{i}"] : rows[f"b{i}"] + 1, :] += gsum
        h_in = x if i == 0 else hs[i - 1]
        dw_refs[i][:] += _outer(h_in, g)
        if i > 0:
            g = _dot_t(g, w_refs[i][:])


# ------------------------------------------------------------------ #
# custom-VJP wrapper
# ------------------------------------------------------------------ #

TILE_ROWS = 256  # rows per grid step; callers pad B up to a multiple


def _tile(B):
    """Fixed tile: pallas_encode pads the row count to a TILE_ROWS multiple
    (a divisor search here would silently fall back to one full-batch VMEM
    tile for awkward batch sizes, e.g. large primes, and overflow VMEM)."""
    if B % TILE_ROWS != 0:
        raise ValueError(f"internal: B={B} not padded to {TILE_ROWS}")
    return TILE_ROWS


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _row_spec(t, cols):
    return pl.BlockSpec((t, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _trunk_call(cfg, xp, xv, bias, *flat_w):
    """cfg = (depth, width, interpret).  xp/xv: (B, 128) bf16 padded
    inputs; bias: (rows, width) f32; flat_w: padded bf16 weights in
    _ws_dict order.  Returns (ha (B, wha_cols) f32, hr (B, whr_cols))."""
    return _trunk_fwd_impl(cfg, xp, xv, bias, flat_w)


def _trunk_fwd_impl(cfg, xp, xv, bias, flat_w):
    depth, width, interpret = cfg
    B = xp.shape[0]
    T = _tile(B)
    # weights enter the custom-VJP boundary in f32 (so dW cotangents stay
    # f32); the bf16 cast for the kernels happens here, outside the VJP
    flat_w = tuple(w.astype(jnp.bfloat16) for w in flat_w)
    wha_cols = flat_w[-4].shape[1]
    whr_cols = flat_w[-1].shape[1]

    kernel = functools.partial(_fwd_kernel, depth=depth)
    ha, hr = pl.pallas_call(
        kernel,
        grid=(B // T,),
        in_specs=[_row_spec(T, xp.shape[1]), _row_spec(T, xv.shape[1])]
        + [_full_spec(w.shape) for w in flat_w]
        + [_full_spec(bias.shape)],
        out_specs=[_row_spec(T, wha_cols), _row_spec(T, whr_cols)],
        out_shape=[
            jax.ShapeDtypeStruct((B, wha_cols), jnp.float32),
            jax.ShapeDtypeStruct((B, whr_cols), jnp.float32),
        ],
        interpret=interpret,
    )(xp, xv, *flat_w, bias)
    return ha, hr


def _trunk_fwd(cfg, xp, xv, bias, *flat_w):
    out = _trunk_fwd_impl(cfg, xp, xv, bias, flat_w)
    return out, (xp, xv, bias, flat_w)


def _trunk_bwd(cfg, res, cotangents):
    depth, width, interpret = cfg
    xp, xv, bias, flat_w = res
    g_ha, g_hr = cotangents
    B = xp.shape[0]
    T = _tile(B)
    skip = depth // 2
    n_w = _n_weights(depth)
    names = _weight_names(depth)
    shapes = {n: w.shape for n, w in zip(names, flat_w)}
    flat_w = tuple(w.astype(jnp.bfloat16) for w in flat_w)

    # ---- top: heads + layers depth-1..skip+1 ----
    up_names = [f"w{i}" for i in range(skip + 2, depth)]
    top_out_shape = (
        [jax.ShapeDtypeStruct((B, width), jnp.float32)]  # g_skip
        + [jax.ShapeDtypeStruct(shapes[n], jnp.float32)
           for n in ("wsx", "wsh", "wf", "wha", "wvf", "wvv", "whr")]
        + [jax.ShapeDtypeStruct(bias.shape, jnp.float32)]
        + [jax.ShapeDtypeStruct(shapes[n], jnp.float32) for n in up_names]
    )
    top_out_specs = (
        [_row_spec(T, width)]
        + [_full_spec(s.shape) for s in top_out_shape[1:]]
    )
    kernel_top = functools.partial(_bwd_top_kernel, depth=depth)
    top_outs = pl.pallas_call(
        kernel_top,
        grid=(B // T,),
        in_specs=[_row_spec(T, xp.shape[1]), _row_spec(T, xv.shape[1])]
        + [_full_spec(w.shape) for w in flat_w]
        + [_full_spec(bias.shape),
           _row_spec(T, g_ha.shape[1]), _row_spec(T, g_hr.shape[1])],
        out_specs=top_out_specs,
        out_shape=top_out_shape,
        interpret=interpret,
    )(xp, xv, *flat_w, bias, g_ha, g_hr)
    (g_skip, dwsx, dwsh, dwf, dwha, dwvf, dwvv, dwhr, dbias_top,
     *dwu) = top_outs

    # ---- bottom: layers skip..0 ----
    low_names = ["w0"] + [f"w{i}" for i in range(1, skip + 1)]
    low_w = [flat_w[names.index(n)] for n in low_names]
    bot_out_shape = (
        [jax.ShapeDtypeStruct(bias.shape, jnp.float32)]
        + [jax.ShapeDtypeStruct(shapes[n], jnp.float32) for n in low_names]
    )
    kernel_bot = functools.partial(_bwd_bottom_kernel, depth=depth)
    bot_outs = pl.pallas_call(
        kernel_bot,
        grid=(B // T,),
        in_specs=[_row_spec(T, xp.shape[1])]
        + [_full_spec(w.shape) for w in low_w]
        + [_full_spec(bias.shape), _row_spec(T, width)],
        out_specs=[_full_spec(s.shape) for s in bot_out_shape],
        out_shape=bot_out_shape,
        interpret=interpret,
    )(xp, *low_w, bias, g_skip)
    dbias_bot, *dwl = bot_outs

    grads = {n: None for n in names}
    for n, g in zip(low_names, dwl):
        grads[n] = g
    for n, g in zip(up_names, dwu):
        grads[n] = g
    grads.update(wsx=dwsx, wsh=dwsh, wf=dwf, wha=dwha, wvf=dwvf,
                 wvv=dwvv, whr=dwhr)
    flat_grads = tuple(grads[n] for n in names)  # f32, matching the primals
    dbias = dbias_top + dbias_bot
    # inputs are data — zero cotangents by design (see module docstring)
    return (jnp.zeros_like(xp), jnp.zeros_like(xv), dbias) + flat_grads


_trunk_call.defvjp(_trunk_fwd, _trunk_bwd)


def _weight_names(depth):
    skip = depth // 2
    names = ["w0"]
    for i in range(1, depth):
        names.append("wsh" if i == skip + 1 else f"w{i}")
    names += ["wsx", "wf", "wha", "wvf", "wvv", "whr"]
    return names


# ------------------------------------------------------------------ #
# public entry
# ------------------------------------------------------------------ #

def supported(depth: int, width: int, use_viewdirs: bool) -> bool:
    """The kernels require lane-aligned widths, the viewdirs topology, and
    depth >= 3 (at depth 2 the skip layer index skip+1 == depth, so no
    split-matmul slot exists — the weight packing would KeyError)."""
    return (use_viewdirs and width % LANE == 0 and (width // 2) % LANE == 0
            and depth >= 3)


def _pad_cols(a, n):
    return jnp.pad(a, ((0, 0), (0, n - a.shape[1]))) if a.shape[1] < n else a


def _pad_rows(a, n):
    return jnp.pad(a, ((0, n - a.shape[0]), (0, 0))) if a.shape[0] < n else a


def pallas_encode(
    params: dict,
    x: jnp.ndarray,
    *,
    depth: int,
    width: int,
    input_ch: int,
    views_ch: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused encode(): x (B, input_ch + views_ch) -> (h_alpha, h_rgb) f32.

    params: the NeRFFlows "params" subtree (pts_linear_i / feature_linear /
    views_linear / h_alpha_linear / h_rgb_linear).  All padding/packing is
    differentiable jnp, so parameter gradients flow back to the pytree.
    """
    skip = depth // 2
    in_pad = ((input_ch + LANE - 1) // LANE) * LANE
    v_pad = ((views_ch + LANE - 1) // LANE) * LANE

    B = x.shape[0]
    B_pad = ((B + TILE_ROWS - 1) // TILE_ROWS) * TILE_ROWS

    xp = _pad_cols(x[:, :input_ch], in_pad)
    xv = _pad_cols(x[:, input_ch:], v_pad)
    if B_pad != B:
        xp = _pad_rows(xp, B_pad)
        xv = _pad_rows(xv, B_pad)
    xp = xp.astype(jnp.bfloat16)
    xv = xv.astype(jnp.bfloat16)

    k = lambda n: params[n]["kernel"]
    bvec = lambda n: params[n]["bias"]
    ha_size = k("h_alpha_linear").shape[1]
    hr_size = k("h_rgb_linear").shape[1]
    ha_pad = ((ha_size + LANE - 1) // LANE) * LANE
    hr_pad = ((hr_size + LANE - 1) // LANE) * LANE

    w = {"w0": _pad_rows(k("pts_linear_0"), in_pad)}
    for i in range(1, depth):
        ki = k(f"pts_linear_{i}")
        if i == skip + 1:
            w["wsx"] = _pad_rows(ki[:input_ch], in_pad)
            w["wsh"] = ki[input_ch:]
        else:
            w[f"w{i}"] = ki
    w["wf"] = k("feature_linear")
    w["wha"] = _pad_cols(k("h_alpha_linear"), ha_pad)
    kv = k("views_linear")  # rows: feature (width) then views (views_ch)
    w["wvf"] = kv[:width]
    w["wvv"] = _pad_rows(kv[width:], v_pad)
    w["whr"] = _pad_cols(k("h_rgb_linear"), hr_pad)

    names = _weight_names(depth)
    flat_w = tuple(w[n].astype(jnp.float32) for n in names)

    rows = _bias_rows(depth)
    bias = jnp.zeros((_n_bias_rows(depth), width), jnp.float32)
    for i in range(depth):
        bias = bias.at[rows[f"b{i}"]].set(bvec(f"pts_linear_{i}"))
    bias = bias.at[rows["bf"]].set(bvec("feature_linear"))
    bias = bias.at[rows["bv"], : width // 2].set(bvec("views_linear"))
    bias = bias.at[rows["bha"], :ha_size].set(bvec("h_alpha_linear"))
    bias = bias.at[rows["bhr"], :hr_size].set(bvec("h_rgb_linear"))

    cfg = (depth, width, interpret)
    ha, hr = _trunk_call(cfg, xp, xv, bias, *flat_w)
    return ha[:B, :ha_size], hr[:B, :hr_size]
