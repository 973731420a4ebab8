"""Dev-only: VPU/MXU primitive throughput probes for the TP kernel redesign.

Times isolated Pallas kernels doing the elemental operations the TP mid
stage is built from, at bench-like sizes, to find where the 3.5 ms fwd /
8.4 ms bwd per pipeline call actually goes:

  p1: d1 x (dot[te,25]x[25,Kmul] + repeat(x_i,K) + multiply + add)  (current)
  p2: same but fused a+b*c form (does Mosaic emit FMA?)
  p3: one multiply over the whole (te, d1*Kmul) slab + tree-halving i-sum
  p4: fp32 vs bf16 elementwise multiply throughput on a wide slab
  p5: pltpu.repeat cost alone
  p6: MXU dot [te,25]x[25,W] cost alone
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hamgnn_tpu.utils.profiling import device_time_ms, enable_persistent_compile_cache

enable_persistent_compile_cache()

E = 19968
TE = 256
S = 25
D1 = 5          # representative l1=2
MUL = 24
K = 40          # K*MUL ~ 960 per chunk; x41 sweeps/row overall in real kernel
KM = K * MUL


def timeit(name, fn, *args):
    t = device_time_ms(fn, args, n=8, warmup=2)
    print(f"{name:40s} {t:8.3f} ms")
    return t


def run_kernel(body, inputs, out_shape, te=TE):
    specs = [pl.BlockSpec((te, a.shape[1]), lambda i: (i, 0)) for a in inputs]

    @jax.jit
    def f(*args):
        return pl.pallas_call(
            body,
            grid=(E // te,),
            in_specs=specs,
            out_specs=pl.BlockSpec((te, out_shape[1]), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(out_shape, args[0].dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(*args)

    return f


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(E, D1 * MUL)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(E, S)), jnp.float32)
    crep = jnp.asarray(rng.normal(size=(S, D1 * KM)), jnp.float32)
    slab = jnp.asarray(rng.normal(size=(E, D1 * KM)), jnp.float32)
    slab2 = jnp.asarray(rng.normal(size=(E, D1 * KM)), jnp.float32)

    # p1: current structure, one chunk
    def p1(x_ref, sh_ref, crep_ref, o_ref):
        shv = sh_ref[:]
        midf = None
        for i in range(D1):
            W = jnp.dot(shv, crep_ref[i * KM:(i + 1) * KM].T if False else
                        crep_ref[:, i * KM:(i + 1) * KM],
                        preferred_element_type=jnp.float32)
            B = pltpu.repeat(x_ref[:, i * MUL:(i + 1) * MUL], K, axis=1)
            term = W * B
            midf = term if midf is None else midf + term
        o_ref[:] = midf

    f1 = run_kernel(p1, [x, sh, crep], (E, KM))
    # crep passed whole (constant spec) — use padded per-tile spec instead:
    specs = [pl.BlockSpec((TE, x.shape[1]), lambda i: (i, 0)),
             pl.BlockSpec((TE, S), lambda i: (i, 0)),
             pl.BlockSpec(crep.shape, lambda i: (0, 0))]

    @jax.jit
    def f1(xx, ss, cc):
        return pl.pallas_call(
            p1, grid=(E // TE,), in_specs=specs,
            out_specs=pl.BlockSpec((TE, KM), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((E, KM), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(xx, ss, cc)

    timeit("p1 current per-i dot+repeat+mul+add", f1, x, sh, crep)

    # p3: one big dot, one multiply, tree sum
    def p3(x_ref, sh_ref, crep_ref, o_ref):
        W = jnp.dot(sh_ref[:], crep_ref[:], preferred_element_type=jnp.float32)
        Bs = [pltpu.repeat(x_ref[:, i * MUL:(i + 1) * MUL], K, axis=1)
              for i in range(D1)]
        B = jnp.concatenate(Bs, axis=1)
        prod = W * B
        # tree sum over D1 blocks of KM lanes
        n = D1
        while n > 1:
            h = n // 2
            prod = prod[:, :h * KM] + prod[:, (n - h) * KM:(n - h) * KM + h * KM] \
                if False else prod[:, :h * KM] + prod[:, h * KM:2 * h * KM] if n % 2 == 0 \
                else jnp.concatenate([prod[:, :h * KM] + prod[:, h * KM:2 * h * KM],
                                      prod[:, 2 * h * KM:]], axis=1)
            n = n - h
        o_ref[:] = prod[:, :KM]

    @jax.jit
    def f3(xx, ss, cc):
        return pl.pallas_call(
            p3, grid=(E // TE,), in_specs=specs,
            out_specs=pl.BlockSpec((TE, KM), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((E, KM), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(xx, ss, cc)

    timeit("p3 slab dot+mul+tree", f3, x, sh, crep)

    # p4: raw elementwise multiply throughput (N sweeps over the slab)
    NS = 8

    def p4(a_ref, b_ref, o_ref):
        acc = a_ref[:]
        for _ in range(NS):
            acc = acc * b_ref[:]
        o_ref[:] = acc

    sp2 = [pl.BlockSpec((TE, D1 * KM), lambda i: (i, 0))] * 2

    @jax.jit
    def f4(aa, bb):
        return pl.pallas_call(
            p4, grid=(E // TE,), in_specs=sp2,
            out_specs=pl.BlockSpec((TE, D1 * KM), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((E, D1 * KM), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(aa, bb)

    t = timeit(f"p4 fp32 multiply x{NS} sweeps slab", f4, slab, slab2)
    vol = E * D1 * KM * NS
    print(f"   -> {vol / (t * 1e-3) / 1e12:.2f} T lane-ops/s fp32")

    # p4b: bf16
    slab_h = slab.astype(jnp.bfloat16)
    slab2_h = slab2.astype(jnp.bfloat16)

    @jax.jit
    def f4b(aa, bb):
        return pl.pallas_call(
            p4, grid=(E // TE,), in_specs=sp2,
            out_specs=pl.BlockSpec((TE, D1 * KM), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((E, D1 * KM), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(aa, bb)

    t = timeit(f"p4b bf16 multiply x{NS} sweeps slab", f4b, slab_h, slab2_h)
    print(f"   -> {vol / (t * 1e-3) / 1e12:.2f} T lane-ops/s bf16")

    # p4c: fused a*b+c fp32 (FMA?)
    def p4c(a_ref, b_ref, o_ref):
        acc = a_ref[:]
        for _ in range(NS):
            acc = acc + a_ref[:] * b_ref[:]
        o_ref[:] = acc

    @jax.jit
    def f4c(aa, bb):
        return pl.pallas_call(
            p4c, grid=(E // TE,), in_specs=sp2,
            out_specs=pl.BlockSpec((TE, D1 * KM), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((E, D1 * KM), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(aa, bb)

    t = timeit(f"p4c fp32 a+a*b x{NS} sweeps (FMA?)", f4c, slab, slab2)
    print(f"   -> {2 * vol / (t * 1e-3) / 1e12:.2f} T flop-ops/s if 2ops")

    # p5: repeat cost alone
    def p5(x_ref, o_ref):
        outs = [pltpu.repeat(x_ref[:, i * MUL:(i + 1) * MUL], K, axis=1)
                for i in range(D1)]
        o_ref[:] = jnp.concatenate(outs, axis=1)

    @jax.jit
    def f5(xx):
        return pl.pallas_call(
            p5, grid=(E // TE,),
            in_specs=[pl.BlockSpec((TE, D1 * MUL), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((TE, D1 * KM), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((E, D1 * KM), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(xx)

    timeit("p5 repeat x D1 (+concat out)", f5, x)

    # p6: the sh@crep dot alone (full width)
    def p6(sh_ref, crep_ref, o_ref):
        o_ref[:] = jnp.dot(sh_ref[:], crep_ref[:],
                           preferred_element_type=jnp.float32)

    @jax.jit
    def f6(ss, cc):
        return pl.pallas_call(
            p6, grid=(E // TE,),
            in_specs=[pl.BlockSpec((TE, S), lambda i: (i, 0)),
                      pl.BlockSpec(crep.shape, lambda i: (0, 0))],
            out_specs=pl.BlockSpec((TE, D1 * KM), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((E, D1 * KM), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(ss, cc)

    timeit("p6 sh@crep full-width dot", f6, sh, crep)

    # p7: the out-stage style dot [te, 2048] x [2048, 64]
    FAN, V = 2048, 64
    blk = jnp.asarray(rng.normal(size=(E, FAN)), jnp.float32)
    wr = jnp.asarray(rng.normal(size=(FAN, V)), jnp.float32)

    def p7(b_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(b_ref[:], w_ref[:],
                           preferred_element_type=jnp.float32)

    @jax.jit
    def f7(bb, ww):
        return pl.pallas_call(
            p7, grid=(E // TE,),
            in_specs=[pl.BlockSpec((TE, FAN), lambda i: (i, 0)),
                      pl.BlockSpec(wr.shape, lambda i: (0, 0))],
            out_specs=pl.BlockSpec((TE, V), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((E, V), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(bb, ww)

    timeit("p7 [te,2048]x[2048,64] out-style dot", f7, blk, wr)


if __name__ == "__main__":
    main()
