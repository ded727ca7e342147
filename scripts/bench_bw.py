"""Pin down read vs write HBM bandwidth and MXU rates on this chip."""

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


def timed(name, fn, *args, nbytes=0, flops=0, donate=None):
    jfn = jax.jit(fn, donate_argnums=donate) if donate else jax.jit(fn)
    t0 = time.time()
    out = jfn(*args)
    sync(out)
    t1 = time.time()
    per = []
    for _ in range(REPS):
        if donate:
            args = (jfn(*args),) if len(args) == 1 else args
            t = time.time()
            sync(args[0])
        else:
            t = time.time()
            sync(jfn(*args))
        per.append(time.time() - t)
    ms = sorted(per)[len(per) // 2] * 1e3
    msr = ms - 25.0  # RTT
    extra = ""
    if nbytes:
        extra += f"  {nbytes / (max(msr, 0.1) * 1e-3) / 1e9:7.0f} GB/s(net)"
    if flops:
        extra += f"  {flops / (max(msr, 0.1) * 1e-3) / 1e12:6.2f} TF/s(net)"
    print(f"  {name:30s} {ms:8.2f} ms{extra}", flush=True)
    return ms


rng = np.random.default_rng(0)
GB = 2_000_000_000
x = jnp.asarray(rng.normal(size=(GB // 4,)).astype(np.float32))  # 2 GB
print(f"backend={jax.default_backend()} 2GB vector")


timed("read2-write1 (a+b)", lambda u: u[:GB // 8] + u[GB // 8:], x,
      nbytes=GB + GB // 2)
timed("bf16 copy", lambda u: (u.astype(jnp.bfloat16) + 1), x,
      nbytes=GB + GB // 2)

A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
timed("matmul 4096 HIGHEST",
      lambda a: jax.lax.dot_general(a, a, (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST),
      A, flops=2 * 4096**3)
timed("matmul 4096 bf16",
      lambda a: jax.lax.dot_general(
          a.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
          (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32),
      A, flops=2 * 4096**3)
B = jnp.asarray(rng.normal(size=(8192, 8192)).astype(np.float32))
timed("matmul 8192 HIGHEST",
      lambda a: jax.lax.dot_general(a, a, (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST),
      B, flops=2 * 8192**3)
timed("matmul 8192 bf16",
      lambda a: jax.lax.dot_general(
          a.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
          (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32),
      B, flops=2 * 8192**3)

# batched small one-hot dots (the tiled-eadd inner op), modest size
X, TE, Bc = 1536, 256, 395
oh = jnp.asarray((rng.integers(0, TE, size=(X, TE, 1))
                  == np.arange(TE)).astype(np.float32))
bl = jnp.asarray(rng.normal(size=(X, TE, Bc)).astype(np.float32))
fl = X * TE * TE * Bc * 2
timed("onehot dots HIGHEST",
      lambda o, b: jax.lax.dot_general(o, b, (((2,), (1,)), ((0,), (0,))),
                                       precision=jax.lax.Precision.HIGHEST),
      oh, bl, flops=fl,
      nbytes=(oh.size + bl.size * 2) * 4)
timed("onehot dots bf16",
      lambda o, b: jax.lax.dot_general(
          o.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
          (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32),
      oh, bl, flops=fl, nbytes=(oh.size + bl.size * 2) * 4)
