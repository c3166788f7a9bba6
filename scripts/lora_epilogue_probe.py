"""On-chip probe: Pallas rank-r epilogue vs XLA's K=16/M=16 GEMMs.

Round-5 trace (BENCHMARKS.md gemm_rate_report): at the production geometry
the XLA z@B forward at N=14336 runs ~17 ms/exec and the dz/dW_B backward
~15 ms each — 10-30x off bandwidth floors.  This times, device-varied
first operand (the quant_epilogue_probe methodology):

  fwd:  y + s*(z@B)   XLA expression vs ops/lora_epilogue kernel
  bwd:  full vjp      XLA vs kernel (dy pass-through + dz + dB)

at both production widths N=14336 (gate/up) and N=4096 (q/o/down out).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/lora_epilogue_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from phantom_vlb_tpu.ops.lora_epilogue import lora_epilogue  # noqa: E402

M, R = 12288, 16
SCALING = 2.0


def timeit(f, *args, n=10):
    variants = [
        (args[0] + jnp.asarray(i, args[0].dtype)).block_until_ready()
        for i in range(n)
    ]

    def sync(o):
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    sync(f(*args))
    out = None
    t0 = time.perf_counter()
    for i in range(n):
        out = f(variants[i], *args[1:])
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    for n in (14336, 4096):
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.standard_normal((M, n)), jnp.bfloat16)
        z = jnp.asarray(rng.standard_normal((M, R)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((R, n)) * 0.1, jnp.bfloat16)

        xla = jax.jit(lambda y, z, b: y + jnp.bfloat16(SCALING) * (z @ b))
        ker = jax.jit(lambda y, z, b: lora_epilogue(y, z, b, SCALING))

        def mk_loss(f):
            def loss(y, z, b):
                return jnp.sum(f(y, z, b).astype(jnp.float32) ** 2)
            return loss

        xla_g = jax.jit(jax.grad(mk_loss(xla), argnums=(0, 1, 2)))
        ker_g = jax.jit(jax.grad(mk_loss(ker), argnums=(0, 1, 2)))

        # parity first
        np.testing.assert_allclose(
            np.asarray(ker(y, z, b), np.float32),
            np.asarray(xla(y, z, b), np.float32), atol=3e-2, rtol=3e-2,
        )
        gk, gx = ker_g(y, z, b), xla_g(y, z, b)
        for a_, b_, nm in zip(gk, gx, ("dy", "dz", "db")):
            np.testing.assert_allclose(
                np.asarray(a_, np.float32), np.asarray(b_, np.float32),
                atol=1.0, rtol=3e-2, err_msg=nm,
            )
        print(f"N={n}: parity ok", flush=True)
        print(f"N={n} fwd : xla {timeit(xla, y, z, b):7.2f} ms  "
              f"kernel {timeit(ker, y, z, b):7.2f} ms", flush=True)
        print(f"N={n} vjp : xla {timeit(xla_g, y, z, b):7.2f} ms  "
              f"kernel {timeit(ker_g, y, z, b):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
