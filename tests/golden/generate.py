import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/fit_tpu_jax_cache")
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), "..", ".."))
import numpy as np, jax.numpy as jnp
from fit_tpu.models import FiT
from fit_tpu.core.pos_embed import rope_freqs_2d
from fit_tpu.diffusion import create_diffusion, ddim_sample_loop, p_sample_loop

# deterministic tiny model + inputs
B, T, P, C, HID, HEADS, DEPTH = 2, 64, 2, 4, 96, 6, 2
model = FiT(patch_size=P, in_channels=C, hidden_size=HID, depth=DEPTH, num_heads=HEADS,
            num_classes=10, class_dropout_prob=0.0, attn_backend="xla")
rng = np.random.default_rng(1234)
tokens = rng.normal(size=(B, T, P*P*C)).astype(np.float32); tokens[:, 48:] = 0
pos = np.zeros((T, 16), np.float32); pos[:48] = rope_freqs_2d(16, 6, 8)[:48]
pos_b = np.broadcast_to(pos, (B, T, 16)).copy()
mask = np.zeros((B, T), bool); mask[:, :48] = True
tvec = np.array([17, 801], np.int32); y = np.array([3, 7], np.int32)

params = model.init({"params": jax.random.PRNGKey(42)},
                    jnp.asarray(tokens), jnp.asarray(tvec), jnp.asarray(y),
                    jnp.asarray(pos_b), jnp.asarray(mask), train=True)
leaves, td = jax.tree.flatten(params)
keys = jax.random.split(jax.random.PRNGKey(77), len(leaves))
params = jax.tree.unflatten(td, [0.05*jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)])

fwd = np.asarray(model.apply(params, jnp.asarray(tokens), jnp.asarray(tvec), jnp.asarray(y),
                             jnp.asarray(pos_b), jnp.asarray(mask), train=True))

# sampler goldens on a fixed fake model (no params needed)
diff = create_diffusion("10")
def fake_model(x, t):
    return 0.1 * x
x_T = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
ddim = np.asarray(ddim_sample_loop(diff, fake_model, jnp.asarray(x_T), clip_denoised=False))
step_noise = rng.normal(size=(10, 2, 4, 8, 8)).astype(np.float32)
ddpm = np.asarray(p_sample_loop(diff, fake_model, jnp.asarray(x_T),
                                step_noise=jnp.asarray(step_noise), clip_denoised=True))

flat_params = {"/".join(map(str, [getattr(k, 'key', k) for k in path])): np.asarray(v)
               for path, v in jax.tree_util.tree_flatten_with_path(params)[0]}
np.savez_compressed(
    __import__("os").path.join(__import__("os").path.dirname(__file__), "golden_v1.npz"),
    tokens=tokens, pos=pos_b, mask=mask, t=tvec, y=y,
    fwd=fwd, x_T=x_T, ddim=ddim, step_noise=step_noise, ddpm=ddpm,
    **{f"param::{k}": v for k, v in flat_params.items()},
)
print("saved", fwd.shape, float(np.abs(fwd).max()), float(np.abs(ddim).max()))
