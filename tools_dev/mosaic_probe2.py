"""Dev-only probe round 2: ops for the flat k-major kernel formulation."""
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
        print(f"{name}: FAIL {str(e).splitlines()[0][:130]}")
        return None


TE, K, MUL = 128, 25, 48
rng = np.random.default_rng(0)
xi = jnp.asarray(rng.normal(size=(TE, MUL)), jnp.float32)
Wi = jnp.asarray(rng.normal(size=(TE, K)), jnp.float32)
flat = jnp.asarray(rng.normal(size=(TE, K * MUL)), jnp.float32)


# a. tile xi by K (odd factor) via pltpu.repeat
def k_tile(a_ref, o_ref):
    o_ref[:] = pltpu.repeat(a_ref[:], K, axis=1)


r = run(f"pltpu.repeat tile x{K} (TE,{MUL})->(TE,{K*MUL})", k_tile,
        (TE, K * MUL), xi)
if r is not None:
    ok = np.allclose(r, np.tile(np.asarray(xi), (1, K)))
    print("   tile semantics:", ok)

# b. jnp.repeat element-repeat along lanes
def k_erep(a_ref, o_ref):
    o_ref[:] = jnp.repeat(a_ref[:], MUL, axis=1)


r = run(f"jnp.repeat elem x{MUL} (TE,{K})->(TE,{K*MUL})", k_erep,
        (TE, K * MUL), Wi)
if r is not None:
    ok = np.allclose(r, np.repeat(np.asarray(Wi), MUL, axis=1))
    print("   elem-repeat semantics:", ok)

# c. split reshape + sublane sum (the dx op)
def k_split_sum(a_ref, o_ref):
    a3 = a_ref[:].reshape(TE, K, MUL)
    o_ref[:] = jnp.sum(a3, axis=1)


r = run(f"(TE,{K*MUL})->(TE,{K},{MUL}) split + sum axis1", k_split_sum,
        (TE, MUL), flat)
if r is not None:
    ok = np.allclose(r, np.asarray(flat).reshape(TE, K, MUL).sum(1), atol=1e-4)
    print("   split+sum correct:", ok)

# d. broadcast_in_dim (TE,K,1)->(TE,K,MUL) then merge
def k_bc_merge(a_ref, o_ref):
    a3 = a_ref[:][:, :, None]
    b = jnp.broadcast_to(a3, (TE, K, MUL))
    o_ref[:] = b.reshape(TE, K * MUL)


run("bcast (TE,K,1)->(TE,K,MUL) + merge", k_bc_merge, (TE, K * MUL), Wi)

# e. pltpu.repeat on slice of ref (w broadcast per group over m3)
def k_rep_slice(a_ref, o_ref):
    o_ref[:] = pltpu.repeat(a_ref[:][:, 3 : 3 + 7], 5, axis=1)


run("pltpu.repeat of lane slice x5", k_rep_slice, (TE, 35), Wi)

# f. concat many lane blocks (dmid assembly)
def k_concat(a_ref, o_ref):
    parts = [a_ref[:][:, i * MUL : (i + 1) * MUL] * float(i) for i in range(K)]
    o_ref[:] = jnp.concatenate(parts, axis=1)


run(f"concat {K} lane blocks", k_concat, (TE, K * MUL), flat)

# g. dot with non-aligned K dim (ncm=120) and N=24
def k_dot_odd(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:][:, 7 : 7 + 120], b_ref[:],
                       preferred_element_type=jnp.float32)


w120 = jnp.asarray(rng.normal(size=(120, 24)), jnp.float32)
run("dot (TE,120 @ lane ofs 7)@(120,24)", k_dot_odd, (TE, 24), flat, w120)

# h. dot_general transposed-lhs (dWcat op): (ncm,TE)@(TE,V) via dimension_numbers
def k_dot_t(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


gv = jnp.asarray(rng.normal(size=(TE, 24)), jnp.float32)
run("dot_general contract axis0 (TE,MUL)x(TE,24)->(MUL,24)", k_dot_t,
    (MUL, 24), xi, gv)

# i. output ref slice accumulation at odd sublane offset
def k_acc(a_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[3 : 3 + MUL, :24] += jax.lax.dot_general(
        a_ref[:], a_ref[:][:, :24], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


try:
    f = pl.pallas_call(
        k_acc,
        grid=(4,),
        out_shape=jax.ShapeDtypeStruct((64, 32), jnp.float32),
        in_specs=[pl.BlockSpec((TE, MUL), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((64, 32), lambda i: (0, 0)),
    )
    big = jnp.asarray(rng.normal(size=(4 * TE, MUL)), jnp.float32)
    r = jax.block_until_ready(jax.jit(f)(big))
    print("grid-accumulated ref slice +=: OK", r.shape)
except Exception as e:  # noqa: BLE001
    print("grid-accumulated ref slice +=: FAIL", str(e).splitlines()[0][:130])
