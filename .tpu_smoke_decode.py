import numpy as np, jax, jax.numpy as jnp
from pytorch_quantize_impls_tpu.kernels.decode_attention import decode_attention
b, h, cl, hd = 32, 8, 1024, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(b, h, hd)), jnp.float32)
kc = jnp.asarray(rng.integers(-127, 128, (b, h, cl, hd)), jnp.int8)
vc = jnp.asarray(rng.integers(-127, 128, (b, h, cl, hd)), jnp.int8)
ks = jnp.asarray(rng.uniform(0.01, 0.1, (b, h, cl)), jnp.float32)
vs = jnp.asarray(rng.uniform(0.01, 0.1, (b, h, cl)), jnp.float32)
bias = jnp.where(jnp.arange(cl)[None, :] < 700, 0.0, -1e30).astype(jnp.float32)
bias = jnp.broadcast_to(bias, (b, cl))
out = decode_attention(q, kc, ks, vc, vs, bias)
kf = kc.astype(jnp.float32) * ks[..., None]
vf = vc.astype(jnp.float32) * vs[..., None]
s = jnp.einsum("bhd,bhkd->bhk", q, kf) / np.sqrt(hd) + bias[:, None, :]
ref = jnp.einsum("bhk,bhkd->bhd", jax.nn.softmax(s, -1), vf)
err = float(jnp.abs(out - ref).max())
print("TPU decode_attention max err:", err)
assert err < 1e-3
print("TPU KERNEL SMOKE OK")
