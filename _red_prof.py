"""Micro-bench the per-gaussian gradient reduction variants."""
import sys, time, numpy as np, jax, jax.numpy as jnp

CAP = 983040  # 15 * 2^16, the bench bucket
N = 262144
D = 21
rng = np.random.RandomState(0)
g_sorted = jnp.asarray(rng.rand(CAP, D).astype(np.float32))
inv_perm = jnp.asarray(rng.permutation(CAP).astype(np.int32))
cnt = rng.randint(0, 9, N)
cnt = (cnt * (CAP / cnt.sum())).astype(np.int64)
off = np.concatenate([[0], np.cumsum(cnt)]).clip(0, CAP).astype(np.int32)
offsets = jnp.asarray(off)
ids_sorted = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))


def fence(o):
    l = jax.tree.leaves(o)[0]
    _ = np.asarray(l.reshape(-1)[0])


def timeit(name, f, *a, n=5):
    jf = jax.jit(f)
    t0 = time.time(); o = jf(*a); fence(o)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o = jf(*a)
    fence(o)
    print(f"{name:36s} compile {c:6.1f}s   run {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return o


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "cur"):
    def current(g, ip, offs):
        go = g[ip]
        cs = jnp.cumsum(go, axis=0, dtype=jnp.float32)
        cs = jnp.concatenate([jnp.zeros((1, D), cs.dtype), cs], axis=0)
        return cs[offs[1:]] - cs[offs[:-1]]
    timeit("current (gather+cumsum+diff)", current, g_sorted, inv_perm, offsets)

    timeit("gather only", lambda g, ip: g[ip], g_sorted, inv_perm)
    timeit("cumsum only", lambda g: jnp.cumsum(g, axis=0), g_sorted)

if which in ("all", "two"):
    B = 256
    R = CAP // B
    def twolevel(g, ip, offs):
        go = g[ip].reshape(R, B, D)
        bs = go.sum(1)
        bcum = jnp.concatenate([jnp.zeros((1, D), g.dtype),
                                jnp.cumsum(bs, 0)], axis=0)       # [R+1, D]
        inner = jnp.concatenate([jnp.zeros((R, 1, D), g.dtype),
                                 jnp.cumsum(go, 1)], axis=1)      # [R, B+1, D]
        def at(k):
            kb = k // B
            kr = k - kb * B
            kb2 = jnp.minimum(kb, R - 1)
            return bcum[kb2] + inner[kb2, kr]
        return at(offs[1:]) - at(offs[:-1])
    timeit("two-level cumsum B=256", twolevel, g_sorted, inv_perm, offsets)

if which in ("all", "seg"):
    def seg(g, ids):
        return jax.ops.segment_sum(g, ids, num_segments=N,
                                   indices_are_sorted=False)
    timeit("segment_sum scatter-add", seg, g_sorted, ids_sorted)

if which in ("all", "pad128"):
    g128 = jnp.pad(g_sorted, ((0, 0), (0, 128 - D)))
    def current128(g, ip, offs):
        go = g[ip]
        cs = jnp.cumsum(go, axis=0, dtype=jnp.float32)
        cs = jnp.concatenate([jnp.zeros((1, 128), cs.dtype), cs], axis=0)
        return cs[offs[1:]] - cs[offs[:-1]]
    timeit("current on 128-wide rows", current128, g128, inv_perm, offsets)
