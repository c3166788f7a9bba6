"""Probe: does the w8a8 dequant epilogue fuse into the int8 GEMM on TPU?

The round-4 trace shows big fusions consuming %convolution... (the int8
dot) as SEPARATE fusions at (6,2048,14336).  If the s32->bf16 dequant is
not output-fused, every large projection materializes an s32 accumulator
(4 B/elem = 1.4 GB at the MLP width) to HBM and reads it back — pure
dtype-of-transport waste, same genus as the round-4 f32-cotangent find.

Measures, at the production MLP shape (12288x4096 @ 4096x14336):
  a) int8 dot alone, s32 out            (the GEMM floor + s32 write)
  b) int8 dot + dequant chain to bf16   (the production _w8a8_core path)
  c) int8 dot with preferred f32 + dequant to bf16 (alternative accum type)
  d) bf16 dot (control: the non-quant rate)

and dumps optimized HLO for (b) to /tmp/quant_epilogue_hlo for fusion
inspection.
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=10):
    """Times a device loop with a varied first operand each iteration (the
    tunnel memoizes repeated identical executions, so a fixed-input loop
    measures dispatch only)."""
    x0 = args[0]
    variants = [
        (x0 + jnp.asarray(i, x0.dtype)).block_until_ready() for i in range(n)
    ]
    def sync(o):
        # The tunneled backend's block_until_ready returns early; a host
        # fetch of one element is the reliable fence (same as bench.py's
        # float(metrics[...]) sync).
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0][0, 0])

    sync(f(*args))
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = f(variants[i], *args[1:])
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    M, K, N = 12288, 4096, 14336
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 128, (M, K), dtype=np.int8))
    q = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    s_x = jnp.asarray(rng.random((M, 1), np.float32))
    s_w = jnp.asarray(rng.random((N,), np.float32))
    xb = x8.astype(jnp.bfloat16)
    qb = q.astype(jnp.bfloat16)

    @jax.jit
    def dot_s32(x8, q):
        return jax.lax.dot_general(
            x8, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    @jax.jit
    def dot_dequant(x8, q, s_x, s_w):
        y = jax.lax.dot_general(
            x8, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (y.astype(jnp.float32) * s_x * s_w).astype(jnp.bfloat16)

    @jax.jit
    def dot_dequant_f32(x8, q, s_x, s_w):
        y = jax.lax.dot_general(
            x8, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return (y * s_x * s_w).astype(jnp.bfloat16)

    @jax.jit
    def dot_bf16(x, q):
        return jax.lax.dot_general(x, q, (((1,), (0,)), ((), ())))

    flops = 2 * M * K * N / 1e12
    for name, f, args in [
        ("a) s32 out      ", dot_s32, (x8, q)),
        ("b) s32->dequant ", dot_dequant, (x8, q, s_x, s_w)),
        ("c) f32 accum    ", dot_dequant_f32, (x8, q, s_x, s_w)),
        ("d) bf16 control ", dot_bf16, (xb, qb)),
    ]:
        ms = timeit(f, *args)
        print(f"{name}: {ms:7.2f} ms  {flops / (ms / 1e3):6.0f} TOP/s", flush=True)

    dump = "/tmp/quant_epilogue_hlo"
    os.system(f"rm -rf {dump}")
    lowered = jax.jit(dot_dequant).lower(x8, q, s_x, s_w)
    compiled = lowered.compile(
        compiler_options={"xla_dump_to": dump, "xla_dump_hlo_as_text": "true"}
    )
    del compiled
    print(f"HLO dumped to {dump}")


if __name__ == "__main__":
    main()
