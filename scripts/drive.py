"""Drive cfnerf_tpu end-to-end through its public package boundary:
build the flagship NeRFFlows model, train on rays from a tiny synthetic
scene (one emissive blob) over an 8-device CPU mesh, then render a full
image with K-sample uncertainty. Observes: loss falls, PSNR rises,
uncertainty map produced.
"""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from cfnerf_tpu.models import NeRFFlows
from cfnerf_tpu.render import RenderConfig, make_render_rays, render_image
from cfnerf_tpu.ops import get_rays_np
from cfnerf_tpu.train.step import TrainConfig, make_train_step
from cfnerf_tpu.parallel import create_mesh, shard_batch

print("devices:", jax.devices())

# --- tiny synthetic scene: a camera at origin looking down -z at a
# gaussian-emissive plane; target image is a blob.
H, W, focal = 16, 16, 20.0
c2w = np.eye(4, dtype=np.float32)[:3]
yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
target_img = np.exp(-(((xx - W / 2) ** 2 + (yy - H / 2) ** 2) / 20.0)).astype(np.float32)
target_img = np.stack([target_img, 0.5 * target_img, 1 - target_img], -1)  # (H, W, 3)

rays_o, rays_d = get_rays_np(H, W, focal, c2w)
rays_o = rays_o.reshape(-1, 3)
rays_d = rays_d.reshape(-1, 3)
targets = target_img.reshape(-1, 3)

# --- model + renderer (small so CPU is quick) ---
N_SAMPLES, K = 32, 8
model = NeRFFlows(
    net_depth=4, net_width=64, input_ch=63, input_ch_views=27,
    skips=(2,), h_alpha_size=16, h_rgb_size=16, n_flows=4, k_samples=K,
)
rc = RenderConfig(n_samples=N_SAMPLES, perturb=True, use_viewdirs=True)
tc = TrainConfig(H=H, W=W, focal=focal, ndc=False, near=0.5, far=3.0,
                 k_samples=K, lrate=5e-3, beta1=0.01)

x_dummy = jnp.zeros((4, 63 + 27))
params = model.init(jax.random.PRNGKey(0), x_dummy, is_test=True)["params"]
n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
print(f"params: {n_params:,}")

mesh = create_mesh()
train_step, tx = make_train_step(model, rc, tc, mesh=mesh)
opt_state = tx.init(params)

rng = jax.random.PRNGKey(1)
B = 64  # rays per step, divisible by 8 devices
first_loss = last = None
for i in range(300):
    rng, krng, brng = jax.random.split(rng, 3)
    idx = jax.random.choice(brng, rays_o.shape[0], (B,), replace=False)
    batch = {
        "rays_o": jnp.asarray(rays_o)[idx],
        "rays_d": jnp.asarray(rays_d)[idx],
        "target": jnp.asarray(targets)[idx],
    }
    batch = shard_batch(mesh, batch)
    params, opt_state, metrics = train_step(params, opt_state, batch, krng)
    if i == 0:
        first_loss = float(metrics["loss"])
    if i % 100 == 0 or i == 299:
        print(f"step {i:4d} loss={float(metrics['loss']):+.4f} "
              f"nll={float(metrics['loss_nll']):+.4f} psnr={float(metrics['psnr']):.2f} "
              f"entropy={float(metrics['loss_entropy']):+.4f}")
    last = metrics

# --- full-image eval render with uncertainty ---
def model_apply(p, x, *, is_test, rng):
    return model.apply({"params": p}, x, is_test=is_test, rng=rng)

render_rays_fn = make_render_rays(model_apply, rc)
out = render_image(
    render_rays_fn, params, jnp.asarray(c2w),
    H=H, W=W, focal=focal, ndc=False, use_viewdirs=True,
    near=0.5, far=3.0, tile=64,
)
rgb_k = np.asarray(out["rgb_map"])       # (H, W, 3, K)
rgb_mean = rgb_k.mean(-1)
rgb_std = rgb_k.std(-1) * K / (K - 1)
mse = float(((rgb_mean - target_img) ** 2).mean())
psnr = -10 * np.log10(mse)
print(f"eval: rgb_k {rgb_k.shape} disp {out['disp_map'].shape} depth {out['depth_map'].shape}")
print(f"eval PSNR: {psnr:.2f} dB | uncertainty map: mean={rgb_std.mean():.4f} max={rgb_std.max():.4f}")
assert float(last["loss"]) < first_loss, "loss did not decrease"
assert np.isfinite(rgb_k).all(), "non-finite render"
assert rgb_std.max() > 0, "no uncertainty signal"
print("OK: loss fell from %.4f to %.4f; end-to-end train+render works" % (first_loss, float(last["loss"])))
