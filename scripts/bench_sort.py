"""Microbench: XLA TPU lax.sort cost by formulation (array count, dtype,
stability) at the two sizes that matter (N=1M gaussian presort, P=2.6M pair
sort). Round-3 finding: the e2e viewer profile shows the (f32, i32) stable
presort at 1M costs ~100 ms while the single-u32 pair sort at 2.6M costs
~6 ms — single-array sorts appear to hit a fast path. Quantify before
redesigning the presort."""
import jax
import jax.numpy as jnp

from tpugs.utils.profiling import device_time


def bench(name, make_arrays, num_keys, stable, n):
    key = jax.random.PRNGKey(0)
    arrs = make_arrays(key, n)


    def step2(c, it):
        z, a = c
        perturbed = tuple([a[0] + z.astype(a[0].dtype)] + list(a[1:]))
        out = jax.lax.sort(perturbed, num_keys=num_keys, is_stable=stable)
        probe = out[0].reshape(-1)[0]
        return (z + probe.astype(z.dtype) * 0, a)

    ms = device_time(step2, (jnp.zeros((), arrs[0].dtype), arrs),
                     k=8, rounds=2) * 1e3
    print(f"{name:44s} n={n:>9,}: {ms:8.2f} ms", flush=True)


def u32(key, n):
    return (jax.random.randint(key, (n,), 0, 1 << 30, jnp.uint32),)


def u32_u32(key, n):
    k1, k2 = jax.random.split(key)
    return (jax.random.randint(k1, (n,), 0, 1 << 30, jnp.uint32),
            jax.random.randint(k2, (n,), 0, 1 << 30, jnp.uint32))


def f32_i32(key, n):
    return (jax.random.uniform(key, (n,), jnp.float32),
            jnp.arange(n, dtype=jnp.int32))


def f32_i32_i32(key, n):
    return f32_i32(key, n) + (jnp.arange(n, dtype=jnp.int32),)


for n in (1_000_000, 2_621_440):
    bench("u32 1-array unstable", u32, 1, False, n)
    bench("u32,u32 2-array (1 key) unstable", u32_u32, 1, False, n)
    bench("f32,i32 2-array (1 key) STABLE (presort)", f32_i32, 1, True, n)
    bench("f32,i32 2-array (1 key) unstable", f32_i32, 1, False, n)
    bench("f32,i32,i32 3-array (2 key) stable", f32_i32_i32, 2, True, n)
