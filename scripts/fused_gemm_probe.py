"""Probe: fused QKV / gate-up int8 GEMMs vs the per-projection form.

The remaining quant-class + GEMM-gap slack (BENCHMARKS.md round-4 table)
could come from GEMM granularity: per layer the model runs q/k/v as three
w8a8 GEMMs off the SAME activation and gate/up as two.  Fusing them into
one GEMM each (weights concatenated along the output axis — per-channel
scales make this numerically IDENTICAL to the separate form) would:
  a) guarantee ONE activation absmax/convert per site (vs trusting CSE),
  b) amortize GEMM prologue/epilogue over a wider N,
  c) in the w8a8g8 backward, quantize ONE concatenated dy instead of 2-3.

Measures, at the production geometry (M=12288, K=4096):
  1. qkv  separate (N=4096,1024,1024) vs fused (N=6144), fwd and fwd+vjp
  2. gate/up separate (2xN=14336)     vs fused (N=28672), fwd and fwd+vjp

Run on the real chip; device-varied first operand per iteration.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from phantom_vlb_tpu.ops.quant import int8_matmul_w8a8g8


def timeit(f, *args, n=10):
    x0 = args[0]
    variants = [
        (x0 + jnp.asarray(i, x0.dtype) * 1e-3).block_until_ready()
        for i in range(n)
    ]

    def sync(o):
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    sync(f(*args))
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = f(variants[i], *args[1:])
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def make_w(rng, k, n):
    q = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
    s = jnp.asarray(rng.random((n,), np.float32) * 0.01 + 0.001)
    return q, s


def probe(name, M, K, Ns):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    ws = [make_w(rng, K, n) for n in Ns]
    qf = jnp.concatenate([q for q, _ in ws], axis=1)
    sf = jnp.concatenate([s for _, s in ws], axis=0)

    @jax.jit
    def sep(x):
        return [int8_matmul_w8a8g8(x, q, s) for q, s in ws]

    @jax.jit
    def fused(x):
        return int8_matmul_w8a8g8(x, qf, sf)

    @jax.jit
    def sep_vjp(x):
        def f(x):
            outs = sep(x)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

        return jax.value_and_grad(f)(x)

    @jax.jit
    def fused_vjp(x):
        def f(x):
            return jnp.sum(fused(x).astype(jnp.float32) ** 2)

        return jax.value_and_grad(f)(x)

    for label, f in [
        ("fwd sep  ", sep),
        ("fwd fused", fused),
        ("vjp sep  ", sep_vjp),
        ("vjp fused", fused_vjp),
    ]:
        ms = timeit(f, x)
        print(f"{name} {label}: {ms:7.2f} ms", flush=True)

    # numerics: fused == sep exactly (per-channel scales commute)
    outs = sep(x)
    outf = fused(x)
    off = 0
    for o, n in zip(outs, Ns):
        sl = outf[:, off : off + n]
        err = float(jnp.max(jnp.abs(sl.astype(jnp.float32) - o.astype(jnp.float32))))
        print(f"{name} slice@{off}: max|fused-sep| = {err:.3e}")
        off += n


def main():
    M, K = 12288, 4096
    probe("qkv    ", M, K, [4096, 1024, 1024])
    probe("gate/up", M, K, [14336, 14336])


if __name__ == "__main__":
    main()
