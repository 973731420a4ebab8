"""Dev-only: compile + time the Pallas TP kernels on the real chip vs the
packed XLA path, at production sizes (node pipeline of the bench config)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools_dev"))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from device_time import device_time_ms

from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.packed_tp import get_plan
from hamgnn_tpu.e3.pallas_tp import pallas_apply


def main(E=10240):
    node = "64x0e+32x0o+24x1o+12x1e+12x2e+6x2o+4x3o+4x3e+2x4e"
    comb = repr(Irreps([(2 * mi.mul, mi.ir) for mi in Irreps(node)]))
    sh = "1x0e+1x1o+1x2e+1x3o+1x4e"
    plan = get_plan(comb, sh, node, node)
    print(f"plan: n_ch={plan.weight_numel} linear={plan.linear_numel}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(E, Irreps(comb).dim)), jnp.float32)
    shv = jnp.asarray(rng.normal(size=(E, Irreps(sh).dim)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(E, plan.weight_numel)), jnp.float32)
    fw = jnp.asarray(rng.normal(size=(plan.linear_numel,)), jnp.float32)

    @jax.jit
    def fwd_p(x, shv, w, fw):
        return pallas_apply(plan, x, shv, w, fw, interpret=False)

    @jax.jit
    def fwd_x(x, shv, w, fw):
        return plan._apply(x, shv, w, fw)

    a = jax.block_until_ready(fwd_x(x, shv, w, fw))
    b = jax.block_until_ready(fwd_p(x, shv, w, fw))
    err = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
    print(f"fwd rel err: {err:.2e}")

    @jax.jit
    def vjp_p(x, shv, w, fw):
        def f(*args):
            return jnp.sum(jnp.sin(pallas_apply(plan, *args, interpret=False)))
        return jax.value_and_grad(f, argnums=(0, 1, 2, 3))(x, shv, w, fw)

    @jax.jit
    def vjp_x(x, shv, w, fw):
        def f(*args):
            return jnp.sum(jnp.sin(plan._apply(*args)))
        return jax.value_and_grad(f, argnums=(0, 1, 2, 3))(x, shv, w, fw)

    va, ga = jax.block_until_ready(vjp_x(x, shv, w, fw))
    vb, gb = jax.block_until_ready(vjp_p(x, shv, w, fw))
    for aa, bb, n in zip(ga, gb, ["dx", "dsh", "dw", "dfw"]):
        e = float(jnp.abs(aa - bb).max() / (jnp.abs(aa).max() + 1e-9))
        print(f"  {n} rel err: {e:.2e}")

    t = device_time_ms(fwd_x, (x, shv, w, fw), n=5, verbose=True)
    print(f"fwd  XLA    : {t:8.3f} ms")
    t = device_time_ms(fwd_p, (x, shv, w, fw), n=5, verbose=True)
    print(f"fwd  PALLAS : {t:8.3f} ms")
    @jax.jit
    def vjp_p_nodsh(x, shv, w, fw):
        def f(xx, ww, fww):
            return jnp.sum(jnp.sin(pallas_apply(
                plan, xx, shv, ww, fww, interpret=False,
                sh_needs_grad=False)))
        return jax.value_and_grad(f, argnums=(0, 1, 2))(x, w, fw)

    t = device_time_ms(vjp_x, (x, shv, w, fw), n=5, verbose=True)
    print(f"fbwd XLA    : {t:8.3f} ms")
    t = device_time_ms(vjp_p, (x, shv, w, fw), n=5, verbose=True)
    print(f"fbwd PALLAS : {t:8.3f} ms")
    t = device_time_ms(vjp_p_nodsh, (x, shv, w, fw), n=5, verbose=True)
    print(f"fbwd PALLAS (no dsh): {t:8.3f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10240)
