"""Dev-only: single TP-pipeline microbenchmark (the bench node/edge plans).

Times pallas fwd and fwd+bwd for the production node pipeline at E=19968,
so kernel experiments iterate in ~1 min instead of the 10-min full bench.
Env: HAMGNN_TP_TILE_FWD / HAMGNN_TP_TILE_BWD / HAMGNN_TP_BF16 as usual.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hamgnn_tpu.utils.profiling import device_time_ms, enable_persistent_compile_cache

enable_persistent_compile_cache()

from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.packed_tp import get_plan
from hamgnn_tpu.e3.pallas_tp import PallasSpec, pallas_apply

FEAT = "64x0e+32x0o+24x1o+12x1e+12x2e+6x2o+4x3o+4x3e+2x4e"
SH = "0e + 1o + 2e + 3o + 4e"


def bench_plan(label, irreps_in, E=19968):
    feat = Irreps(FEAT)
    plan = get_plan(irreps_in, SH, repr(feat), repr(feat))
    spec = PallasSpec(plan)
    print(f"{label}: d_in={spec.d_in} midw={sum(K*m for (_o,m,_d,K,_c) in spec.chunks)} "
          f"n_ch={spec.n_ch} tile_fwd={spec.tile_fwd} tile_bwd={spec.tile_bwd}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(E, Irreps(irreps_in).dim)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(E, Irreps(SH).dim)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(E, plan.weight_numel)), jnp.float32)
    fw = jnp.asarray(rng.normal(size=(plan.linear_numel,)), jnp.float32)

    @jax.jit
    def fwd(x, sh, w, fw):
        return pallas_apply(plan, x, sh, w, fw, sh_needs_grad=False)

    @jax.jit
    def fwdbwd(x, sh, w, fw):
        def loss(x, w, fw):
            return jnp.sum(pallas_apply(plan, x, sh, w, fw,
                                        sh_needs_grad=False) ** 2)
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w, fw)
        return l, g

    t_f = device_time_ms(fwd, (x, sh, w, fw), n=8, warmup=2)
    t_fb = device_time_ms(fwdbwd, (x, sh, w, fw), n=8, warmup=2)
    print(f"  fwd {t_f:7.3f} ms   fwd+bwd {t_fb:7.3f} ms")
    return t_f, t_fb


def main():
    feat = Irreps(FEAT)
    combined = Irreps([(2 * m, ir) for m, ir in feat])
    bench_plan("node (combined 736)", repr(combined))
    bench_plan("edge (368)", repr(feat))


if __name__ == "__main__":
    main()
