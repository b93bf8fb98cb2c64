"""Validate MXU-matmul cumsum exactness+speed and sort-payload variants."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fence(o):
    l = [x for x in jax.tree.leaves(o) if hasattr(x, "reshape")][0]
    _ = np.asarray(l.reshape(-1)[0])


def timeit(name, f, *a, n=20):
    jf = jax.jit(f)
    o = jf(*a); fence(o)
    t0 = time.time()
    for _ in range(n):
        o = jf(*a)
    fence(o)
    print(f"{name:34s} run {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return o


N = 262144
CAPI = 655360
rng = np.random.RandomState(0)
counts = jnp.asarray(rng.randint(0, 12, N).astype(np.int32))


def cumsum_mm(x, B=512):
    L = x.shape[0]
    A = L // B
    X = x.reshape(A, B).astype(jnp.float32)
    i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    M = (i <= jj).astype(jnp.float32)
    row_cs = jax.lax.dot_general(X, M, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    tot = row_cs[:, -1]
    i2 = jax.lax.broadcasted_iota(jnp.int32, (A, A), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (A, A), 1)
    M2 = (i2 < j2).astype(jnp.float32)  # strictly-lower: exclusive
    offs = jax.lax.dot_general(tot[None, :], M2, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)[0]
    return (row_cs + offs[:, None]).reshape(L).astype(x.dtype)


ref = np.cumsum(np.asarray(counts))
got = np.asarray(timeit("cumsum_mm [262k]", cumsum_mm, counts))
print("exact:", bool((ref == got).all()), flush=True)
timeit("jnp.cumsum [262k]", jnp.cumsum, counts)

markers = jnp.asarray((rng.rand(CAPI) < 0.4).astype(np.int32))
got2 = np.asarray(timeit("cumsum_mm [655k]", cumsum_mm, markers))
print("exact:", bool((np.cumsum(np.asarray(markers)) == got2).all()), flush=True)

# sort payload variants
cap = CAPI
tile = jnp.asarray(np.sort(rng.randint(0, 351, cap)).astype(np.int32))
depth = jnp.asarray(rng.rand(cap).astype(np.float32) * 5)
j32 = jnp.arange(cap, dtype=jnp.int32)
g = jnp.asarray(rng.randint(0, N, cap).astype(np.int32))

timeit("sort 2key+1payload", lambda t, d: jax.lax.sort(
    (t, d, j32), num_keys=2, is_stable=True), tile, depth)
timeit("sort 2key+2payload", lambda t, d, gg: jax.lax.sort(
    (t, d, j32, gg), num_keys=2, is_stable=True), tile, depth, g)
timeit("1d gather cap<-cap", lambda gg, pm: gg[pm], g, j32)

# cumsum [cap, 21] axis0 variants
rows = jnp.asarray(rng.rand(CAPI, 21).astype(np.float32))
timeit("jnp.cumsum [655k,21] ax0", lambda r: jnp.cumsum(r, axis=0), rows)


def cumsum_mm2d(x, B=512):
    L, D = x.shape
    A = L // B
    X = x.reshape(A, B, D)
    i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    M = (i <= jj).astype(jnp.float32)
    # [A,B,D] x [B,B] contracting B -> [A,D,B] -> transpose
    row_cs = jax.lax.dot_general(X, M, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    row_cs = row_cs.transpose(0, 2, 1)  # [A, B, D]
    tot = row_cs[:, -1, :]  # [A, D]
    i2 = jax.lax.broadcasted_iota(jnp.int32, (A, A), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (A, A), 1)
    M2 = (i2 < j2).astype(jnp.float32)
    offs = jax.lax.dot_general(M2, tot, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)  # [A, D]
    return (row_cs + offs[:, None, :]).reshape(L, D)


got3 = timeit("cumsum_mm2d [655k,21]", cumsum_mm2d, rows)
ref3 = np.cumsum(np.asarray(rows, dtype=np.float64), axis=0)
err = np.abs(np.asarray(got3) - ref3) / np.maximum(np.abs(ref3), 1)
print("2d rel err max:", float(err.max()), flush=True)
