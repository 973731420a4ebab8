"""Reference-checkpoint import via the e3nn-compat execution path.

Builds a synthetic reference-format Lightning ``state_dict`` whose keys and
shapes follow the reference module tree exactly
(/root/reference/hamgnn/models/hamgnn_conv.py attribute names,
nn/message_passing.py internals, e3nn flat weight numels), imports it with
:func:`map_reference_state`, and checks FULL coverage: every reference key is
consumed, every compat-model parameter is assigned, and the forward runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamgnn_tpu.data.graph import pad_and_batch
from hamgnn_tpu.e3.irreps import Irreps
from hamgnn_tpu.e3.tensor_product import (
    TensorProductPlan,
    tp_out_irreps_with_instructions,
)
from hamgnn_tpu.interfaces.e3nn_compat import (
    HamGNNConvE3Compat,
    map_reference_state,
)
from hamgnn_tpu.interfaces.torch_ckpt import assign_params, flatten_params
from hamgnn_tpu.models.basis import get_basis_set, hamiltonian_irreps
from hamgnn_tpu.models.output import HamGNNPlusPlusOut
from util_fixtures import add_random_hamiltonian_targets, make_crystal

NUM_TYPES = 20
FEAT = "8x0e+4x0o+6x1o+4x1e+4x2e+2x2o+2x3o+2x3e+2x4e"
SH = "0e + 1o + 2e + 3o + 4e"
NUM_LAYERS = 2
NUM_RADIAL = 8
RADIAL_MLP = (16,)


def _e3nn_linear_numel(ir_in, ir_out):
    ir_in, ir_out = Irreps(ir_in), Irreps(ir_out)
    return sum(mi.mul * mo.mul for mi in ir_in for mo in ir_out
               if mi.ir == mo.ir)


def _tp_numel(i1, i2, io, ins):
    plan = TensorProductPlan(i1, i2, io, ins)
    return sum(int(np.prod(s)) for s in plan.weight_shapes if s is not None)


def _fcn_keys(prefix, numel_out, rng, state):
    hs = [NUM_RADIAL, *RADIAL_MLP, numel_out]
    for i in range(len(hs) - 1):
        state[f"{prefix}.layers.{i}.weight"] = rng.normal(
            size=(hs[i], hs[i + 1]))


def _build_reference_state(rng):
    """Synthetic state_dict with the reference's exact key tree and shapes."""
    from hamgnn_tpu.e3.gate import make_gate

    feat = Irreps(FEAT)
    sh = Irreps(SH)
    onehot = Irreps(f"{NUM_TYPES}x0e")
    combined = Irreps([(2 * m, ir) for m, ir in feat])
    gate, gate_in = make_gate(feat)
    gate_out = Irreps(gate.irreps_out)
    ham = hamiltonian_irreps(get_basis_set("openmx", 14))

    state = {}

    def lin(key, ir_in, ir_out):
        state[key] = rng.normal(size=(_e3nn_linear_numel(ir_in, ir_out),))

    def msgpack(base, irreps_edge_in):
        mid_n, ins_n = tp_out_irreps_with_instructions(combined, sh, feat)
        mid_e, ins_e = tp_out_irreps_with_instructions(irreps_edge_in, sh, feat)
        state[f"{base}.node_tensor_product.weight"] = rng.normal(
            size=(_tp_numel(combined, sh, mid_n, ins_n),))
        state[f"{base}.edge_tensor_product.weight"] = rng.normal(
            size=(_tp_numel(irreps_edge_in, sh, mid_e, ins_e),))
        lin(f"{base}.node_linear_scaler.linear_out.weight", mid_n.simplify(), feat)
        lin(f"{base}.edge_linear_scaler.linear_out.weight", mid_e.simplify(), feat)
        lin(f"{base}.node_linear_out.weight", feat, feat)
        lin(f"{base}.edge_linear_out.weight", feat, feat)
        _fcn_keys(f"{base}.node_weight_generator", mid_n.simplify().num_irreps,
                  rng, state)
        _fcn_keys(f"{base}.edge_weight_generator", mid_e.simplify().num_irreps,
                  rng, state)

    R = "representation."
    state[R + "radial_basis.basis.bessel_weights"] = rng.normal(size=(NUM_RADIAL,))
    lin(R + "chemical_embedding.linear.weight", onehot, feat)
    lin(R + "pair_embedding.linear_up_src.weight", onehot, onehot)
    lin(R + "pair_embedding.linear_up_dst.weight", onehot, onehot)
    mid_pe, ins_pe = tp_out_irreps_with_instructions(onehot, sh, feat)
    state[R + "pair_embedding.conv_tp.tensor_product.weight"] = rng.normal(
        size=(_tp_numel(onehot, sh, mid_pe, ins_pe),))
    lin(R + "pair_embedding.conv_tp.linear_scaler.linear_out.weight",
        mid_pe.simplify(), feat)
    _fcn_keys(R + "pair_embedding.conv_tp.weight_generator",
              mid_pe.simplify().num_irreps, rng, state)

    for i in range(NUM_LAYERS):
        lin(R + f"convolutions.{i}.skip_linear.weight", feat, feat)
        lin(R + f"convolutions.{i}.residual.linear1.weight", feat, gate_in)
        lin(R + f"convolutions.{i}.residual.linear2.weight", gate_out, feat)
        msgpack(R + f"convolutions.{i}.conv_tp", feat)
        lin(R + f"pair_interactions.{i}.linear_up_src.weight", feat, feat)
        lin(R + f"pair_interactions.{i}.linear_up_tar.weight", feat, feat)
        lin(R + f"pair_interactions.{i}.skip_linear.weight", feat, feat)
        msgpack(R + f"pair_interactions.{i}.conv_tp", feat)

    O = "output_module."
    for head in ("onsite_hamiltonian", "offsite_hamiltonian"):
        lin(O + f"{head}_network.residual_block.linear1.weight", feat, gate_in)
        lin(O + f"{head}_network.residual_block.linear2.weight", gate_out, feat)
        lin(O + f"{head}_network.linear_transform.weight", feat, ham)
    return state


@pytest.mark.slow


def test_reference_checkpoint_imports_end_to_end():
    rng = np.random.default_rng(0)
    state = _build_reference_state(rng)

    rep = HamGNNConvE3Compat(
        num_types=NUM_TYPES, irreps_edge_sh=SH, irreps_node_features=FEAT,
        num_layers=NUM_LAYERS, num_radial=NUM_RADIAL, cutoff=4.0,
        radial_mlp=RADIAL_MLP)
    head = HamGNNPlusPlusOut(
        irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
        ham_type="openmx", ham_only=True, add_H0=False,
        zero_point_shift=False)

    c = make_crystal(rng, n_atoms=4, species=(6, 14))
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    graph = pad_and_batch([c], bucket_multiple=8)

    key = jax.random.PRNGKey(0)
    p_rep = rep.init(key, graph)
    feats0 = rep.apply(p_rep, graph)
    p_head = head.init(key, graph, feats0)
    params = {"params": {"representation": p_rep["params"],
                         "output": p_head["params"]}}

    ham = hamiltonian_irreps(get_basis_set("openmx", 14))
    assignments = map_reference_state(
        state, num_types=NUM_TYPES, irreps_node_features=FEAT,
        irreps_edge_sh=SH, num_layers=NUM_LAYERS, irreps_ham=ham)

    # full bidirectional coverage
    new_inner, untouched = assign_params(params["params"], assignments)
    assert untouched == [], untouched[:10]
    flat_model = flatten_params(params["params"])
    assert set(assignments) == set(flat_model)

    # imported parameters drive a working forward
    new_params = {"params": new_inner}
    feats = rep.apply({"params": new_inner["representation"]}, graph)
    out = head.apply({"params": new_inner["output"]}, graph, feats)
    assert np.isfinite(np.asarray(out["hamiltonian_on"])).all()
    assert np.isfinite(np.asarray(out["hamiltonian_off"])).all()
    # and differ from the random init (weights actually moved)
    out0 = head.apply({"params": p_head["params"]}, graph, feats0)
    assert not np.allclose(np.asarray(out["hamiltonian_on"]),
                           np.asarray(out0["hamiltonian_on"]))


def _add_corr_doping_overlap_state(rng, state):
    """Extend the synthetic state with corr_products, charge-doping mlp_q,
    and overlap-head keys (+ representative buffers that must be skipped)."""
    from hamgnn_tpu.e3.gate import make_gate
    from hamgnn_tpu.nn.symmetric_contraction import u_matrix_real

    feat = Irreps(FEAT).simplify()
    gate, gate_in = make_gate(Irreps(FEAT))
    gate_out = Irreps(gate.irreps_out)
    ham = hamiltonian_irreps(get_basis_set("openmx", 14))
    NH = 4  # num_hidden_features
    hidden = Irreps([(NH, ir) for _, ir in feat])
    coupling = Irreps([(1, ir) for _, ir in feat])

    def lin(key, ir_in, ir_out):
        state[key] = rng.normal(size=(_e3nn_linear_numel(ir_in, ir_out),))

    R = "representation."
    # charge doping (Embedding_block_q, denseRegression n_h=2, no BN)
    NQ = 4
    state[R + "atomic_embedding.mlp_q.fcs.0.0.weight"] = rng.normal(size=(NQ, NQ))
    state[R + "atomic_embedding.mlp_q.fcs.0.0.bias"] = rng.normal(size=(NQ,))
    state[R + "atomic_embedding.mlp_q.fc_out.weight"] = rng.normal(size=(NUM_TYPES, NQ))
    state[R + "atomic_embedding.mlp_q.fc_out.bias"] = rng.normal(size=(NUM_TYPES,))
    state[R + "atomic_embedding.charge_centers"] = np.linspace(-8, 8, NQ)
    state[R + "atomic_embedding.charge_gamma"] = np.asarray(1.0)
    state[R + "atomic_embedding.neutral_charge_attrs"] = rng.normal(size=(1, NQ))

    for i in range(NUM_LAYERS):
        cp = R + f"corr_products.{i}"
        lin(cp + ".linear_pre.weight", feat, hidden)
        lin(cp + ".linear_sc.weight", feat, feat)
        lin(cp + ".prod.linear.weight", hidden, hidden)
        lin(cp + ".linear_out.weight", hidden, feat)
        for j, (_, ir) in enumerate(hidden):
            for nu in (2, 1):
                U = u_matrix_real(repr(coupling), repr(ir), nu)
                npar = U.shape[-1]
                state[cp + f".prod.symmetric_contractions.contractions.{j}.U_matrix_{nu}"] = \
                    np.zeros((2, 2))
                key = (f".prod.symmetric_contractions.contractions.{j}."
                       + ("weights_max" if nu == 2 else "weights.0"))
                state[cp + key] = rng.normal(size=(NUM_TYPES, npar, NH))

    O = "output_module."
    for head in ("onsite_overlap", "offsite_overlap"):
        lin(O + f"{head}_network.residual_block.linear1.weight", Irreps(FEAT), gate_in)
        lin(O + f"{head}_network.residual_block.linear2.weight", gate_out, Irreps(FEAT))
        lin(O + f"{head}_network.linear_transform.weight", Irreps(FEAT), ham)
    return state


@pytest.mark.slow
def test_extended_import_corr_doping_overlap():
    """corr_prod + charge-doping + overlap-head checkpoint import: full
    bidirectional key coverage and a working forward."""
    rng = np.random.default_rng(1)
    state = _build_reference_state(rng)
    state = _add_corr_doping_overlap_state(rng, state)

    rep = HamGNNConvE3Compat(
        num_types=NUM_TYPES, irreps_edge_sh=SH, irreps_node_features=FEAT,
        num_layers=NUM_LAYERS, num_radial=NUM_RADIAL, cutoff=4.0,
        radial_mlp=RADIAL_MLP, use_corr_prod=True, correlation=2,
        num_hidden_features=4, apply_charge_doping=True,
        num_charge_attr_feas=4)
    head = HamGNNPlusPlusOut(
        irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
        ham_type="openmx", ham_only=False, add_H0=False,
        zero_point_shift=False)

    c = make_crystal(rng, n_atoms=4, species=(6, 14))
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    c["doping_charge"] = np.asarray([0.3], np.float32)
    graph = pad_and_batch([c], bucket_multiple=8)

    key = jax.random.PRNGKey(0)
    p_rep = rep.init(key, graph)
    feats0 = rep.apply(p_rep, graph)
    p_head = head.init(key, graph, feats0)
    params = {"representation": p_rep["params"], "output": p_head["params"]}

    ham = hamiltonian_irreps(get_basis_set("openmx", 14))
    assignments = map_reference_state(
        state, num_types=NUM_TYPES, irreps_node_features=FEAT,
        irreps_edge_sh=SH, num_layers=NUM_LAYERS, irreps_ham=ham,
        use_corr_prod=True, correlation=2, num_hidden_features=4,
        apply_charge_doping=True, ham_only=False)

    new_inner, untouched = assign_params(params, assignments)
    assert untouched == [], untouched[:10]
    assert set(assignments) == set(flatten_params(params))

    feats = rep.apply({"params": new_inner["representation"]}, graph)
    out = head.apply({"params": new_inner["output"]}, graph, feats)
    for k in ("hamiltonian_on", "hamiltonian_off", "overlap_on", "overlap_off"):
        assert np.isfinite(np.asarray(out[k])).all(), k


@pytest.mark.slow
def test_soc_head_import_su2_and_so3():
    """SOC su2 (doubled spinor irreps) and so3 (ksi) head import: full key
    coverage into HamGNNSOCOut and a working spinor forward."""
    from hamgnn_tpu.e3.gate import make_gate
    from hamgnn_tpu.models.soc import HamGNNSOCOut, su2_base_irreps

    rng = np.random.default_rng(2)
    gate, gate_in = make_gate(Irreps(FEAT))
    gate_out = Irreps(gate.irreps_out)
    basis = get_basis_set("openmx", 14)
    ham = hamiltonian_irreps(basis)
    su2 = su2_base_irreps(basis)
    doubled = su2 + su2

    def lin(state, key, ir_in, ir_out):
        state[key] = rng.normal(size=(_e3nn_linear_numel(ir_in, ir_out),))

    c = make_crystal(rng, n_atoms=4, species=(6, 14))
    c = add_random_hamiltonian_targets(rng, c, nao_max=14)
    graph = pad_and_batch([c], bucket_multiple=8)
    rep = HamGNNConvE3Compat(
        num_types=NUM_TYPES, irreps_edge_sh=SH, irreps_node_features=FEAT,
        num_layers=1, num_radial=NUM_RADIAL, cutoff=4.0,
        radial_mlp=RADIAL_MLP)
    p_rep = rep.init(jax.random.PRNGKey(0), graph)
    feats = rep.apply(p_rep, graph)

    # --- su2 -----------------------------------------------------------
    state = {}
    O = "output_module."
    for head in ("onsite_hamiltonian", "offsite_hamiltonian"):
        lin(state, O + f"{head}_network.residual_block.linear1.weight",
            Irreps(FEAT), gate_in)
        lin(state, O + f"{head}_network.residual_block.linear2.weight",
            gate_out, Irreps(FEAT))
        lin(state, O + f"{head}_network.linear_transform.weight",
            Irreps(FEAT), doubled)
    soc = HamGNNSOCOut(
        irreps_in_node=FEAT, irreps_in_edge=FEAT, nao_max=14,
        ham_type="openmx", soc_basis="su2", add_H0=False, symmetrize=True,
        zero_point_shift=False)
    p_soc = soc.init(jax.random.PRNGKey(1), graph, feats)
    assignments = map_reference_state(
        state, num_types=NUM_TYPES, irreps_node_features=FEAT,
        irreps_edge_sh=SH, num_layers=0, irreps_ham=ham,
        rep_prefix="\x00never", soc_basis="su2", irreps_ham_su2=su2)
    new_out, untouched = assign_params({"output": p_soc["params"]}, assignments)
    assert untouched == [], untouched[:10]
    out = soc.apply({"params": new_out["output"]}, graph, feats)
    finite = [np.isfinite(np.asarray(v)).all()
              for k, v in out.items() if hasattr(v, "dtype")]
    assert all(finite)
