"""Round-2 perf probe: where does the 4.5 s train step go?

Measures, on the real chip, at the production geometry (B=6, S=2048,
H=32/8, D=128, 32 layers, w8a8g8):
  1. flash-attention fwd / fwd+bwd TFLOP/s (standalone, batched layout);
  2. LLM-only forward and forward+backward (isolates head/CLIP);
  3. optional xplane trace of the full train step (--trace).

Usage:  python scripts/perf_probe.py [attn] [llm] [step] [trace]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def log(msg):
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


_first = jax.jit(lambda o: jax.tree.leaves(o)[0].ravel()[0])


def timeit(fn, *args, n=10, warmup=2):
    # block_until_ready is unreliable through the axon tunnel (verify skill
    # gotchas); a host scalar fetch is the only trustworthy sync.
    for _ in range(warmup):
        out = fn(*args)
    _ = float(_first(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(_first(out))
    return (time.perf_counter() - t0) / n


def probe_attn():
    from phantom_vlb_tpu.ops.flash_attention import attention

    B, Hq, Hkv, S, D = 6, 32, 8, 2048, 128
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, Hq, S, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, Hkv, S, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, Hkv, S, D), jnp.bfloat16)
    kv_mask = jnp.ones((B, S), jnp.int32)

    # causal fwd FLOPs (0.5 factor for the causal triangle)
    fwd_flops = 2 * 2 * B * Hq * S * S * D * 0.5
    fwd = jax.jit(lambda q, k, v, m: attention(q, k, v, causal=True, kv_mask=m))
    dt = timeit(fwd, q, k, v, kv_mask)
    log(f"attn fwd: {dt*1e3:.2f} ms  {fwd_flops/dt/1e12:.1f} TFLOP/s")

    def loss(q, k, v, m):
        return jnp.sum(attention(q, k, v, causal=True, kv_mask=m).astype(jnp.float32))

    train = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    dt2 = timeit(train, q, k, v, kv_mask)
    # bwd = dq kernel (~2x fwd matmul flops) + dkv kernel (~2.5x)
    log(f"attn fwd+bwd: {dt2*1e3:.2f} ms  (total {3.5*fwd_flops/dt2/1e12:.1f} "
        f"TFLOP/s equiv; bwd-only ~{(dt2-dt)*1e3:.1f} ms)")


def probe_mm():
    """Matmul ceilings at the production GEMM shape (M=12288, K=4096, N=14336)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K, N = 12288, 4096, 14336
    key = jax.random.key(0)
    xb = jax.random.normal(key, (M, K), jnp.bfloat16)
    x8 = jax.random.randint(key, (M, K), -127, 128, jnp.int8)
    w8 = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
    wb = w8.astype(jnp.bfloat16)
    flops = 2 * M * K * N

    f_bf16 = jax.jit(lambda a, b: a @ b)
    dt = timeit(f_bf16, xb, wb, n=6)
    log(f"mm bf16 XLA: {dt*1e3:.2f} ms  {flops/dt/1e12:.0f} TFLOP/s")

    f_i8 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    dt = timeit(f_i8, x8, w8, n=6)
    log(f"mm int8 XLA: {dt*1e3:.2f} ms  {flops/dt/1e12:.0f} TFLOP/s")

    def mm_kernel(x_ref, w_ref, o_ref, acc, *, nk):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        acc[...] += jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(ki == nk - 1)
        def _():
            o_ref[...] = acc[...]

    def pallas_i8(a, b, bm=512, bn=2048, bk=1024):
        nk = K // bk
        return pl.pallas_call(
            functools.partial(mm_kernel, nk=nk),
            grid=(M // bm, N // bn, nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(a, b)

    for bm, bn, bk in ((512, 2048, 1024), (256, 2048, 2048), (1024, 1024, 1024)):
        f_p = jax.jit(functools.partial(pallas_i8, bm=bm, bn=bn, bk=bk))
        try:
            dt = timeit(f_p, x8, w8, n=6)
            log(f"mm int8 pallas ({bm},{bn},{bk}): {dt*1e3:.2f} ms  "
                f"{flops/dt/1e12:.0f} TFLOP/s")
        except Exception as e:  # noqa: BLE001
            log(f"mm int8 pallas ({bm},{bn},{bk}): failed {type(e).__name__}: {e}")


def build_llm(quant="w8a8g8", layers=32, scan=True, group=1):
    from phantom_vlb_tpu.models.lora import LoRAConfig
    from phantom_vlb_tpu.models.mistral import MistralConfig, MistralModel

    kw = dict(
        num_hidden_layers=layers,
        param_dtype=jnp.bfloat16,
        lora=LoRAConfig(),
        scan_layers=scan,
        base_quant=quant,
    )
    if group != 1:
        kw["scan_group"] = group
    cfg = MistralConfig(**kw)
    model = MistralModel(cfg)
    B, S = 6, 2048
    x = jax.random.normal(jax.random.key(0), (B, S, cfg.hidden_size), jnp.bfloat16)
    kv_mask = jnp.ones((B, S), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(1), x, kv_mask=kv_mask)["params"]
    jax.block_until_ready(params)
    return model, cfg, params, x, kv_mask


def probe_llm(group=1, dropout=False, rng_impl="threefry2x32"):
    model, cfg, params, x, kv_mask = build_llm(group=group)
    tag = f"group={group} dropout={dropout} rng={rng_impl}"
    drng = jax.random.key(9, impl=rng_impl)
    det = not dropout

    fwd = jax.jit(
        lambda p, x: model.apply(
            {"params": p}, x, kv_mask=kv_mask, deterministic=det,
            rngs={"dropout": drng} if dropout else {},
        )
    )
    dt = timeit(fwd, params, x, n=5)
    log(f"llm fwd [{tag}]: {dt*1e3:.1f} ms")

    # split trainable (lora) from frozen, grad wrt trainable only
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    lora = {k: v for k, v in flat.items() if "lora_a" in k or "lora_b" in k}
    frozen = {k: v for k, v in flat.items() if not ("lora_a" in k or "lora_b" in k)}

    def loss(lora_p, frozen_p, x):
        p = tu.unflatten_dict({**frozen_p, **lora_p})
        out = model.apply(
            {"params": p}, x, kv_mask=kv_mask, deterministic=det,
            rngs={"dropout": drng} if dropout else {},
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    dt2 = timeit(g, lora, frozen, x, n=5)
    log(f"llm fwd+bwd [{tag}]: {dt2*1e3:.1f} ms  (bwd ~{(dt2-dt)*1e3:.1f} ms)")
    return dt, dt2


def probe_quant():
    """Quant-class bandwidth bar (VERDICT r3 ask 3, 240 ms class).

    Device-loop (fori_loop) timing of the exact w8a8g8 activation-quant
    chains at the two production shapes, against (a) a pure elementwise
    control loop that measures this chip's ACHIEVED elementwise HBM rate and
    (b) the analytic byte count of each chain.  Differential timing: the
    control loop's carry update (x *= c, read+write bf16) is present in
    every variant, so (variant - control) isolates the quant chain itself.

    The quant chain per site is absmax-reduce(read) + round/clip/convert
    (read + s8 write); the consumer sum adds one s8 read (accounted).
    """
    from functools import partial

    from phantom_vlb_tpu.ops.quant import _act_quant, _act_quant_scaled

    K = 30

    def run(shape, label):
        M, N = shape
        x = jax.random.normal(jax.random.key(0), (M, N), jnp.bfloat16)
        wscale = jax.random.uniform(jax.random.key(1), (N,), jnp.float32)
        c = jnp.bfloat16(1.0 + 1e-6)

        def ctrl_body(i, carry):
            x, acc = carry
            x = x * c
            return x, acc + x[0, 0].astype(jnp.float32)

        def quant_body(i, carry):
            x, acc = carry
            x = x * c
            x8, s = _act_quant(x)
            # consume both outputs fully so nothing is dead-code eliminated
            return x, acc + jnp.sum(jnp.abs(x8).astype(jnp.int32)).astype(
                jnp.float32
            ) + jnp.sum(s)

        def gquant_body(i, carry):
            x, acc = carry
            x = x * c
            g8, s = _act_quant_scaled(x, wscale)
            return x, acc + jnp.sum(jnp.abs(g8).astype(jnp.int32)).astype(
                jnp.float32
            ) + jnp.sum(s)

        def loop(body, x):
            _, acc = jax.lax.fori_loop(0, K, body, (x, jnp.float32(0)))
            return acc

        t = {}
        for name, body in (("ctrl", ctrl_body), ("act_quant", quant_body),
                           ("grad_quant", gquant_body)):
            f = jax.jit(partial(loop, body))
            _ = float(f(x))  # compile + warm
            t0 = time.perf_counter()
            _ = float(f(x))
            t[name] = (time.perf_counter() - t0) / K

        bf16_mb = M * N * 2 / 1e6
        s8_mb = M * N / 1e6
        ctrl_bytes = 2 * bf16_mb  # read + write bf16
        bw = ctrl_bytes / 1e3 / t["ctrl"]  # GB/s achieved elementwise
        log(f"[{label}] ctrl (x*=c): {t['ctrl']*1e3:.2f} ms "
            f"-> achieved elementwise BW {bw:.0f} GB/s")
        for name in ("act_quant", "grad_quant"):
            dt = t[name] - t["ctrl"]
            # chain bytes: absmax read + convert read + s8 write + consumer
            # s8 read (the sum that keeps it alive); grad_quant reads f32
            # scale (N*4, negligible).
            chain_mb = 2 * bf16_mb + 2 * s8_mb
            floor_ms = chain_mb / 1e3 / bw * 1e3
            one_pass_mb = bf16_mb + 2 * s8_mb  # single-read kernel bar
            one_pass_ms = one_pass_mb / 1e3 / bw * 1e3
            log(f"[{label}] {name}: +{dt*1e3:.2f} ms over ctrl | "
                f"two-pass floor at achieved BW {floor_ms:.2f} ms, "
                f"one-pass floor {one_pass_ms:.2f} ms")

    run((12288, 4096), "12288x4096")
    run((12288, 14336), "12288x14336")


def probe_step(trace=False):
    sys.path.insert(0, "/root/repo")
    import bench

    config, state, frozen, step, batch = bench.build(32, 6, "w8a8g8")
    rng = jax.random.key(1, impl="rbg")  # match the trainer/bench PRNG
    state, metrics = step(state, frozen, batch, rng)
    _ = float(metrics["brain_loss"])
    dt = None
    t0 = time.perf_counter()
    for i in range(5):
        state, metrics = step(state, frozen, batch, jax.random.fold_in(rng, i))
    _ = float(metrics["brain_loss"])
    dt = (time.perf_counter() - t0) / 5
    log(f"full step: {dt*1e3:.1f} ms")
    if trace:
        trace_dir = "/tmp/vlb_trace"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            for i in range(2):
                state, metrics = step(state, frozen, batch, jax.random.fold_in(rng, 100 + i))
            _ = float(metrics["brain_loss"])
        from phantom_vlb_tpu.utils.xplane import summarize

        log("top device ops (2 steps):")
        for name, ms, n in summarize(trace_dir)[:40]:
            print(f"  {ms:9.2f} ms  x{n:<6d} {name[:120]}", flush=True)


if __name__ == "__main__":
    what = set(sys.argv[1:]) or {"attn", "llm"}
    if "attn" in what:
        probe_attn()
    if "mm" in what:
        probe_mm()
    if "quant" in what:
        probe_quant()
    if "llm" in what:
        probe_llm()
    if "dropout" in what:
        probe_llm(dropout=True)
    if "dropout_rbg" in what:
        probe_llm(dropout=True, rng_impl="rbg")
    for w in sorted(what):
        if w.startswith("group"):
            probe_llm(group=int(w.split("=")[1]))
    if "step" in what or "trace" in what:
        probe_step(trace="trace" in what)
