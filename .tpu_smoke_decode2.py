# Diagnostic smoke: kernel (HIGHEST-precision dots) vs HIGHEST-precision
# reference (should be ~f32-exact) AND vs the default-precision reference
# (bf16-pass noise floor the fake-quant model itself carries).
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from pytorch_quantize_impls_tpu.kernels.decode_attention import decode_attention
b, h, cl, hd = 32, 8, 1024, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(b, h, hd)), jnp.float32)
kc = jnp.asarray(rng.integers(-127, 128, (b, h, cl, hd)), jnp.int8)
vc = jnp.asarray(rng.integers(-127, 128, (b, h, cl, hd)), jnp.int8)
ks = jnp.asarray(rng.uniform(0.01, 0.1, (b, h, cl)), jnp.float32)
vs = jnp.asarray(rng.uniform(0.01, 0.1, (b, h, cl)), jnp.float32)
bias = jnp.broadcast_to(
    jnp.where(jnp.arange(cl)[None, :] < 700, 0.0, -1e30).astype(jnp.float32), (b, cl))
out = decode_attention(q, kc, ks, vc, vs, bias)

def ref(prec):
    kf = kc.astype(jnp.float32) * ks[..., None]
    vf = vc.astype(jnp.float32) * vs[..., None]
    s = jnp.einsum("bhd,bhkd->bhk", q, kf, precision=prec) / np.sqrt(hd) + bias[:, None, :]
    a = jax.nn.softmax(s, -1)
    return jnp.einsum("bhk,bhkd->bhd", a, vf, precision=prec)

r_hi = ref(jax.lax.Precision.HIGHEST)
r_def = ref(None)
scale = float(jnp.abs(r_hi).max())
e_hi = float(jnp.abs(out - r_hi).max()) / scale
e_def = float(jnp.abs(out - r_def).max()) / scale
e_refs = float(jnp.abs(r_hi - r_def).max()) / scale
print(f"rel err kernel-vs-HIGHEST {e_hi:.2e} | kernel-vs-default {e_def:.2e} | refs-vs-each-other {e_refs:.2e}")
assert e_hi < 2e-3, "kernel deviates from the exact reference beyond fp tolerance"
print("TPU KERNEL SMOKE2 OK")
