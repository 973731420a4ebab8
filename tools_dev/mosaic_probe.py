"""Dev-only: probe Mosaic support for the ops the fused TP kernel needs."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.block_until_ready(jax.jit(f)(*args))
        print(f"{name}: OK {r.shape}")
        return np.asarray(r)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:150]
        print(f"{name}: FAIL {msg}")
        return None


def main():
    TE, K, MUL = 128, 16, 64
    x = jnp.asarray(np.random.default_rng(0).normal(size=(TE, K * MUL)),
                    jnp.float32)
    small = jnp.asarray(np.arange(TE * K, dtype=np.float32).reshape(TE, K))
    xm = jnp.asarray(np.arange(TE * MUL, dtype=np.float32).reshape(TE, MUL))

    # 1. pltpu.repeat semantics along lanes
    def k_repeat(a_ref, o_ref):
        o_ref[:] = pltpu.repeat(a_ref[:], 4, axis=1)

    r = run("pltpu.repeat axis=1 x4 (TE,K)->(TE,4K)", k_repeat, (TE, 4 * K),
            small)
    if r is not None:
        row = r[0, : 8]
        print("   row0[:8] =", row, " (elementwise-repeat => 0,0,0,0,1,1,1,1;"
              " tile => 0..7|0..7)")

    # 2. unit-dim squeeze from sublane slice
    def k_squeeze(a_ref, o_ref):
        a3 = a_ref[:].reshape(TE, K, MUL)
        o_ref[:] = a3[:, 3:4, :].reshape(TE, MUL)

    run("reshape(TE,K*MUL)->(TE,K,MUL), row slice, squeeze", k_squeeze,
        (TE, MUL), x)

    # 3. full-lane merge reshape (mul==128)
    def k_merge128(a_ref, o_ref):
        a3 = a_ref[:].reshape(TE, 8, 128)
        o_ref[:] = (a3 + 1.0).reshape(TE, 8 * 128)

    run("(TE,8,128)->(TE,1024) merge", k_merge128, (TE, 1024),
        x[:, : 8 * 128])

    # 4. non-128 merge (known fail)
    def k_merge64(a_ref, o_ref):
        a3 = a_ref[:].reshape(TE, K, MUL)
        o_ref[:] = (a3 + 1.0).reshape(TE, K * MUL)

    run("(TE,16,64)->(TE,1024) merge", k_merge64, (TE, K * MUL), x)

    # 5. broadcast outer product 3D (construction op)
    def k_outer(a_ref, b_ref, o_ref):
        t = a_ref[:][:, :, None] * b_ref[:][:, None, :]
        o_ref[:] = jnp.sum(t, axis=1)

    run("outer (TE,K,1)x(TE,1,MUL) + sum axis1", k_outer, (TE, MUL),
        small, xm)

    # 6. lane reduce
    def k_lred(a_ref, o_ref):
        a3 = a_ref[:].reshape(TE, K, MUL)
        o_ref[:] = jnp.sum(a3, axis=2)

    run("3D lane-reduce (TE,K,MUL)->(TE,K)", k_lred, (TE, K), x)

    # 7. value .at[].add on 2D value
    def k_atadd(a_ref, o_ref):
        v = jnp.zeros((TE, K * MUL), jnp.float32)
        v = v.at[:, 64 : 64 + 128].add(a_ref[:][:, :128])
        o_ref[:] = v

    run("value .at[lane slice].add", k_atadd, (TE, K * MUL), x)

    # 8. strided lane gather with static indices (de-interleave in-kernel)
    def k_gather(a_ref, o_ref):
        idx = jnp.asarray(np.arange(0, K * MUL, K, dtype=np.int32))
        o_ref[:] = a_ref[:][:, idx]

    run("static lane gather stride K", k_gather, (TE, MUL), x)

    # 9. dot with small N
    def k_dot(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)

    wsub = jnp.asarray(np.random.default_rng(1).normal(size=(MUL, 24)),
                       jnp.float32)
    run("dot (TE,MUL)@(MUL,24)", k_dot, (TE, 24), xm, wsub)

    # 10. sublane-slice of 3D then dot
    def k_slice_dot(a_ref, b_ref, o_ref):
        a3 = a_ref[:].reshape(TE, K, MUL)
        blk = a3[:, 2:4, :]  # (TE,2,MUL)
        s = blk[:, 0:1, :].reshape(TE, MUL) + blk[:, 1:2, :].reshape(TE, MUL)
        o_ref[:] = jnp.dot(s, b_ref[:], preferred_element_type=jnp.float32)

    run("3D sublane slice + squeeze + dot", k_slice_dot, (TE, 24), x, wsub)


if __name__ == "__main__":
    main()
