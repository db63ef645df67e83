import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from det_sam2_tpu.ops.attention import flash_attention_banked

rng = np.random.default_rng(0)
B, Nq, D, Cm, S, Ktot, T, L, layer = 2, 256, 128, 32, 128, 6, 4, 3, 1
q = jnp.asarray(rng.standard_normal((B, 1, Nq, D)), jnp.float32)
mem_k = jnp.asarray(rng.standard_normal((Ktot, B, L, S, D)), jnp.float32)
mem_v = jnp.asarray(rng.standard_normal((Ktot, B, S, Cm)), jnp.float32)
slots = jnp.asarray([3, 0, 5, 2], jnp.int32)
w = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
w = w.at[-1].set(0.0)  # staging tile unroped
cos = jnp.asarray(rng.standard_normal((S, D // 2)), jnp.float32)
sin = jnp.asarray(rng.standard_normal((S, D // 2)), jnp.float32)
valid = rng.random((B, T, S)) > 0.2
valid[:, 1] = False  # a fully-dead tile
bias = jnp.asarray(np.where(valid, 0.0, -1e30).reshape(B, T * S), jnp.float32)

out = flash_attention_banked(q, mem_k, mem_v, slots, w, bias, cos, sin,
                             layer, block_q=128, block_k=64)

# reference
cosd = jnp.concatenate([cos, cos], -1); sind = jnp.concatenate([sin, sin], -1)
half = D // 2
wr = jnp.concatenate([-w[:, half:], w[:, :half]], -1)
ks = []
vs = []
for t in range(T):
    k_t = mem_k[slots[t], :, layer] + (cosd * w[t] + sind * wr[t])[None]
    ks.append(k_t); vs.append(mem_v[slots[t]])
k = jnp.concatenate(ks, axis=1)  # [B, T*S, D]
v = jnp.concatenate(vs, axis=1)
s = jnp.einsum("bqd,bkd->bqk", q[:, 0], k) / np.sqrt(D) + bias[:, None, :]
p = jax.nn.softmax(s, axis=-1)
ref = jnp.einsum("bqk,bkc->bqc", p, v)[:, None]
d = float(jnp.abs(out - ref).max())
print("max abs diff", d)
assert d < 2e-5, d
print("OK")
