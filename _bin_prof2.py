import sys, time, numpy as np, jax, jax.numpy as jnp
which = sys.argv[1]
CAP = 1 << 20
rng = np.random.RandomState(0)
num_tiles = 700
tile = jnp.asarray(rng.randint(0, num_tiles+1, CAP).astype(np.int32))
depth = jnp.asarray(rng.rand(CAP).astype(np.float32) * 5)
j = jnp.arange(CAP, dtype=jnp.int32)
perm = jnp.asarray(rng.permutation(CAP).astype(np.int32))

def timeit(name, f, *a):
    jf = jax.jit(f)
    t0=time.time(); o = jf(*a); _ = np.asarray(jax.tree.leaves(o)[0][:1]); print(f"{name} compile {time.time()-t0:.1f}s", flush=True)
    t0=time.time()
    for _ in range(5):
        o = jf(*a); _ = np.asarray(jax.tree.leaves(o)[0][:1])
    print(f"{name}: {(time.time()-t0)/5*1000:.1f} ms", flush=True)

if which == "sort3":
    timeit("sort3op_2key", lambda t, d, jj: jax.lax.sort((t, d, jj), num_keys=2, is_stable=True), tile, depth, j)
elif which == "sort2":
    timeit("sort2op_1key", lambda t, jj: jax.lax.sort((t, jj), num_keys=1, is_stable=True), tile, j)
elif which == "scatter":
    timeit("inv_perm_scatter", lambda p: jnp.zeros((CAP,), jnp.int32).at[p].set(jnp.arange(CAP, dtype=jnp.int32), unique_indices=True), perm)
elif which == "cumsum":
    g = jnp.asarray(rng.rand(CAP, 21).astype(np.float32))
    timeit("cumsum21", lambda x: jnp.cumsum(x, axis=0), g)
elif which == "gather":
    g = jnp.asarray(rng.rand(CAP, 24).astype(np.float32))
    timeit("gather_rows", lambda x, p: x[p], g, perm)
