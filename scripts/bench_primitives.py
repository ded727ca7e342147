"""Calibrate raw TPU op throughput at multifrontal level shapes.

Times the primitive ops the extend-add decomposes into, separately, so the
slow stage is identifiable: elementwise copy, transpose, row gather, block
(slice) gather, one-hot dot at HIGHEST vs bf16.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REPS = int(os.environ.get("REPS", 5))


def sync(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timed(name, fn, *args, nbytes=0, flops=0):
    t0 = time.time()
    out = fn(*args)
    sync(out)
    t1 = time.time()
    per = []
    for _ in range(REPS):
        t = time.time()
        sync(fn(*args))
        per.append(time.time() - t)
    ms = sorted(per)[len(per) // 2] * 1e3
    extra = ""
    if nbytes:
        extra += f"  {nbytes / (ms * 1e-3) / 1e9:7.0f} GB/s"
    if flops:
        extra += f"  {flops / (ms * 1e-3) / 1e12:6.2f} TF/s"
    print(f"  {name:26s} compile {t1-t0:5.1f}s  {ms:8.2f} ms{extra}",
          flush=True)
    return ms


N, Bc, F = 1024, 395, 613
TE = 256
rng = np.random.default_rng(0)
upd = jnp.asarray(rng.normal(size=(N, 2, Bc, Bc)).astype(np.float32))
nb = upd.size * 4
print(f"backend={jax.default_backend()} shape N={N} Bc={Bc} F={F} "
      f"({nb/1e9:.2f} GB operand)")

timed("copy (x+1)", jax.jit(lambda u: u + 1.0), upd, nbytes=2 * nb)
timed("transpose", jax.jit(lambda u: jnp.swapaxes(u, -1, -2) + 0.0), upd,
      nbytes=2 * nb)
timed("reduce sum(-1)", jax.jit(lambda u: jnp.sum(u, -1)), upd, nbytes=nb)

# row gather: (N*2*Bc_rows) -> F rows each
gidx = jnp.asarray(
    np.sort(rng.integers(0, Bc, size=(N, 2, F)), axis=-1).astype(np.int32))
ar = jnp.arange(N)[:, None]


def rowgather(u, g):
    return u[:, 0][ar, g[:, 0]] + u[:, 1][ar, g[:, 1]]


timed("row gather 2x(N,F)", jax.jit(rowgather), upd, gidx,
      nbytes=(2 * N * F * Bc + nb) * 4 // 1)

# block gather: N*2*T slices of (TE, Bc)
T = -(-F // TE)
starts = np.minimum(np.sort(rng.integers(0, Bc, size=(N * 2 * T,))),
                    max(Bc - TE, 0)).astype(np.int32)
ns = np.repeat(np.arange(N * 2), T).astype(np.int32)
idx = jnp.asarray(np.stack([ns, starts], 1))
u2 = upd.reshape(N * 2, Bc, Bc)
dnums = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2), collapsed_slice_dims=(0,), start_index_map=(0, 1))


def blockgather(u, i):
    return jax.lax.gather(u, i, dnums, (1, TE, Bc), mode="clip")


timed("block gather (TE,Bc)", jax.jit(blockgather), u2, idx,
      nbytes=N * 2 * T * TE * Bc * 4 * 2)

# dots: batched one-hot (X, TE, TE) @ (X, TE, Bc)
X = N * 2 * T
oh = jnp.asarray((rng.integers(0, TE, size=(X, TE, 1))
                  == np.arange(TE)).astype(np.float32))
bl = jnp.asarray(rng.normal(size=(X, TE, Bc)).astype(np.float32))
fl = X * TE * TE * Bc * 2


def dot_hi(o, b):
    return jax.lax.dot_general(o, b, (((2,), (1,)), ((0,), (0,))),
                               precision=jax.lax.Precision.HIGHEST)


def dot_bf(o, b):
    return jax.lax.dot_general(o.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


timed("onehot dot HIGHEST", jax.jit(dot_hi), oh, bl, flops=fl)
timed("onehot dot bf16", jax.jit(dot_bf), oh, bl, flops=fl)

# big plain matmul reference
A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
timed("matmul 4096^3 HIGHEST",
      jax.jit(lambda a: jax.lax.dot_general(
          a, a, (((1,), (0,)), ((), ())),
          precision=jax.lax.Precision.HIGHEST)), A, flops=2 * 4096**3)
timed("matmul 4096^3 bf16",
      jax.jit(lambda a: jax.lax.dot_general(
          a.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
          (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32)), A, flops=2 * 4096**3)

# fused chain: gather+dot in ONE jit (does fusion change the picture?)
rel = jnp.asarray(rng.integers(0, TE, size=(X, TE)).astype(np.int32))


def chain(u, i, r):
    b = jax.lax.gather(u, i, dnums, (1, TE, Bc), mode="clip")
    o = (r[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, TE), 2)
         ).astype(jnp.bfloat16)
    return jax.lax.dot_general(o, b.astype(jnp.bfloat16),
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


timed("gather+bf16dot chain", jax.jit(chain), u2, idx, rel)
