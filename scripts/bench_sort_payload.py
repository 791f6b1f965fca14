"""Microbench: marginal cost of extra f32 payload operands on the [P]-sized
pair sort — decides whether carrying the 9 attribute columns through the
sort (killing the 16.8 ms random pack gather, scripts/trace_report.py) is a
win. Compare the current viewer sort (tile, depth, gid = 3-array 2-key) to
the same sort with +9 f32 payloads (12-array).

r4 rewrite (ADVICE r3 medium): the round-3 probe read only out[0], and
XLA's sort simplifier strips unused payload operands — it timed the 3-array
sort no matter how many payloads were requested. Every output operand is
now folded into the scan carry. Payloads are also built in ONE op (each
jax.random call is a separate ~20 s tunneled compile)."""
import jax
import jax.numpy as jnp

from tpugs.utils.profiling import device_time

N = 2_400_000
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
TILE = jax.random.randint(k1, (N,), 0, 1020, jnp.int32).astype(jnp.float32)
GID = jnp.arange(N, dtype=jnp.float32)
PAYS = jax.random.uniform(k2, (11, N), jnp.float32)  # row 0 = depth


def bench(name, n_payload):
    arrs = (TILE, PAYS[0], GID) + tuple(PAYS[1 + i] for i in range(n_payload))

    def step(c, it):
        z, a = c
        perturbed = tuple([a[0] + z] + list(a[1:]))
        out = jax.lax.sort(perturbed, num_keys=2, is_stable=True)
        # Probe EVERY output operand or the sort simplifier DCEs the unused
        # payloads (ADVICE r3). tanh keeps the sum from constant-folding.
        probe = jnp.tanh(sum(o.reshape(-1)[0] for o in out)) * 1e-20
        return (z + probe, a)

    ms = device_time(step, (jnp.zeros(()), arrs), k=8, rounds=2) * 1e3
    print(f"{name:40s} n={N:>9,}: {ms:8.2f} ms", flush=True)


bench("3-array 2-key stable (no payload)", 0)
bench("+9 f32 payloads (12-array, carry_attrs)", 9)
bench("+10 f32 payloads (13-array, meta case)", 10)
