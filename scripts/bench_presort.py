"""Decompose presort_by_depth's in-context cost at N=1M: the e2e viewer
profile charges +101 ms to the presort stage, but lax.sort((f32,i32),
stable) alone measures 5.4 ms (scripts/bench_sort.py). Suspects: the [N,12]
row-table gather by perm, the concatenate, or a fusion/layout artifact."""
import jax
import jax.numpy as jnp

from tpugs.ops.binning import presort_by_depth
from tpugs.ops.projection import ProjectionOutput
from tpugs.utils.profiling import device_time

N = 1_000_000
rng = jax.random.PRNGKey(0)
ks = jax.random.split(rng, 8)
proj = ProjectionOutput(
    means2d=jax.random.uniform(ks[0], (N, 2), jnp.float32, 0, 1900),
    depths=jax.random.uniform(ks[1], (N,), jnp.float32, 0.2, 50.0),
    conic=jax.random.uniform(ks[2], (N, 3), jnp.float32, 0.01, 0.2),
    radii=jax.random.randint(ks[3], (N,), 1, 30, jnp.int32),
    rgb=jax.random.uniform(ks[4], (N, 3), jnp.float32),
    opac=jax.random.uniform(ks[5], (N,), jnp.float32),
    visible=jax.random.uniform(ks[6], (N,), jnp.float32) > 0.1,
)


def run(name, fn):
    def step(c, it):
        z, p = c
        out = fn(p.replace(depths=p.depths + z))
        probe = sum(jnp.sum(x[:8]).astype(jnp.float32) * 0.0
                    for x in jax.tree.leaves(out)
                    if x.dtype in (jnp.float32,))
        return (z + probe, p)

    ms = device_time(step, (jnp.zeros(()), proj), k=8, rounds=2) * 1e3
    print(f"{name:40s}: {ms:8.2f} ms", flush=True)


def exact(p):
    _, out = presort_by_depth(p)
    return out


def fast(p):
    _, out = presort_by_depth(p, quant_bits=12)
    return out


def sort_only(p):
    n = p.depths.shape[0]
    key = jnp.where(p.visible, p.depths, jnp.inf)
    _, perm = jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)),
                           num_keys=1, is_stable=True)
    return (perm.astype(jnp.float32),)


def gather_only(p):
    # random perm stand-in: bit-mix iota so XLA can't see it's a shuffle
    n = p.depths.shape[0]
    perm = (jnp.arange(n, dtype=jnp.uint32) * 2654435761 % n).astype(jnp.int32)
    f32 = jnp.float32
    table = jnp.concatenate(
        [p.means2d, p.conic, p.rgb, p.opac[:, None], p.depths[:, None],
         p.radii.astype(f32)[:, None], p.visible.astype(f32)[:, None]],
        axis=1)
    return (table[perm],)


run("exact presort (sort + [N,12] gather)", exact)
run("fast presort (u32 sort + gather)", fast)
run("sort only (f32,i32 stable)", sort_only)
run("[N,12] row gather only", gather_only)
