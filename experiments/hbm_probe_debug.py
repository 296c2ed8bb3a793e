"""Debug: what does block_until_ready actually await on the axon relay?

Times the same 1 GiB read+write program under three completion signals:
  a) jax.block_until_ready(y)
  b) np.asarray(y[0, 0, :1]) — fetch one element (forces real completion)
  c) chained: y_{k+1} = f(y_k) for 8 links, then fetch (dependency chain,
     per-link time = true program time once the pipeline fills)
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices())

key = jax.random.PRNGKey(0)
big = jax.random.normal(key, (256, 1024, 1024), jnp.float32)  # 1 GiB, non-constant
jax.block_until_ready(big)
gib = big.nbytes


@jax.jit
def bump(x, s):
    return x + s


# a) block_until_ready
for i in range(4):
    t0 = time.perf_counter()
    y = bump(big, jnp.float32(i))
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0
    print(f"a block_until_ready call {i}: {dt*1e3:8.2f} ms  -> {2*gib/dt/1e9:9.1f} GB/s")

# b) fetch one element
for i in range(4):
    t0 = time.perf_counter()
    y = bump(big, jnp.float32(10 + i))
    v = np.asarray(y[0, 0, :1])
    dt = time.perf_counter() - t0
    print(f"b fetch-element   call {i}: {dt*1e3:8.2f} ms  -> {2*gib/dt/1e9:9.1f} GB/s  v={v[0]:.1f}")

# c) dependency chain
t0 = time.perf_counter()
y = big
for i in range(8):
    y = bump(y, jnp.float32(1.0))
v = np.asarray(y[0, 0, :1])
dt = time.perf_counter() - t0
print(f"c chain x8 + fetch: {dt*1e3:8.2f} ms -> per-link {2*gib/(dt/8)/1e9:9.1f} GB/s  v={v[0]:.1f}")
