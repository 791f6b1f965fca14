"""Microbench: marginal cost of extra f32 payload operands on the [P]-sized
pair sort — decides whether carrying the 9 attribute columns through the
sort (killing the 16.8 ms random pack gather, scripts/trace_report.py) is a
win. Compare the current viewer sort (tile, depth, gid = 3-array 2-key) to
the same sort with +9 f32 payloads (12-array)."""
import jax
import jax.numpy as jnp

from tpugs.utils.profiling import device_time


def bench(name, n_payload, n):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    tile = jax.random.randint(k1, (n,), 0, 1020, jnp.int32).astype(jnp.float32)
    depth = jax.random.uniform(k2, (n,), jnp.float32)
    gid = jnp.arange(n, dtype=jnp.float32)
    pays = tuple(
        jax.random.uniform(jax.random.PRNGKey(i + 7), (n,), jnp.float32)
        for i in range(n_payload)
    )
    arrs = (tile, depth, gid) + pays

    def step(c, it):
        z, a = c
        perturbed = tuple([a[0] + z] + list(a[1:]))
        out = jax.lax.sort(perturbed, num_keys=2, is_stable=True)
        probe = out[0].reshape(-1)[0]
        return (z + probe * 0, a)

    ms = device_time(step, (jnp.zeros(()), arrs), k=8, rounds=2) * 1e3
    print(f"{name:40s} n={n:>9,}: {ms:8.2f} ms", flush=True)


for n in (2_400_000,):
    bench("3-array 2-key stable (current viewer)", 0, n)
    bench("+4 f32 payloads (7-array)", 4, n)
    bench("+9 f32 payloads (12-array)", 9, n)
    bench("+10 f32 payloads (13-array, meta case)", 10, n)
