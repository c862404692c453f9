import time, numpy as np, jax, jax.numpy as jnp
from cl_ops_tpu.ops import sort as sort_mod
n = 1 << 24
x = jnp.asarray(np.random.RandomState(7).randint(0, 1<<31, size=n, dtype=np.int64).astype(np.uint32))
sync = jax.jit(lambda r: r[:8].astype(jnp.float32).sum())
for opts in ("block_rows=512,merge_rows=4096", "block_rows=512,merge_rows=8192",
             "block_rows=1024,merge_rows=4096"):
    try:
        s = sort_mod.sort_new("abitonic", opts)
        t0 = time.perf_counter()
        out = s.sort_with_device_data(x); _ = float(sync(out))
        tc = time.perf_counter() - t0
        ok = np.array_equal(np.asarray(out), np.sort(np.asarray(x)))
        t0 = time.perf_counter()
        for _ in range(10): out = s.sort_with_device_data(x)
        _ = float(sync(out)); dt = (time.perf_counter()-t0)/10
        print(f"{opts}: ok={ok} c={tc:.0f}s {dt*1e3:.1f}ms = {n/dt/1e6:.0f} Mkeys/s", flush=True)
    except Exception as e:
        print(f"{opts}: FAIL {str(e)[:100]}", flush=True)
