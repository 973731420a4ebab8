"""Torch-free import of the reference's pickled Uni-HamGNN predictors.

The reference publishes its universal models as pickled live
``HamiltonianPredictor`` objects whose module tree references
``HamGNN_v_2_1.*`` / e3nn / Lightning classes
(/root/reference/Uni-HamGNN/Uni-HamiltonianPredictor.py:80-137).  None of
those packages exist here, so :func:`stub_unpickle` loads such pickles with a
permissive Unpickler: every class that cannot be imported is replaced by a
generated stub that records its state — torch tensors themselves reconstruct
natively (torch-cpu is available; for a fully torch-free environment the
tensor rebuild hooks are stubbed too and raw numpy arrays are produced).

:func:`extract_state_dicts` then walks the stubbed ``torch.nn.Module`` tree
(``_modules`` / ``_parameters`` / ``_buffers``) into flat numpy state_dicts,
and :func:`convert_predictor_pickle` maps the non-SOC model through
:func:`hamgnn_tpu.interfaces.e3nn_compat.map_reference_state` into this
framework's parameter tree, saving a Uni-HamGNN package directory.
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

_STUB_CACHE: Dict[Tuple[str, str], type] = {}


class StubBase:
    """Generic stand-in for an unimportable pickled class."""

    _stub_module = "?"
    _stub_name = "?"

    def __new__(cls, *args, **kwargs):
        obj = object.__new__(cls)
        obj.__dict__["_stub_new_args"] = args
        return obj

    def __init__(self, *args, **kwargs):
        self.__dict__.setdefault("_stub_init_args", args)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif (isinstance(state, tuple) and len(state) == 2
              and isinstance(state[0], (dict, type(None)))):
            if state[0]:
                self.__dict__.update(state[0])
            if isinstance(state[1], dict):
                self.__dict__.update(state[1])
        else:
            self.__dict__["_stub_state"] = state

    def __call__(self, *args, **kwargs):  # reduce-style factories
        return self

    def __repr__(self):
        return f"<stub {self._stub_module}.{self._stub_name}>"


def _make_stub(module: str, name: str) -> type:
    key = (module, name)
    if key not in _STUB_CACHE:
        _STUB_CACHE[key] = type(
            f"Stub_{name}", (StubBase,),
            {"_stub_module": module, "_stub_name": name})
    return _STUB_CACHE[key]


class _PermissiveUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except Exception:  # noqa: BLE001 — any unimportable class gets a stub
            return _make_stub(module, name)

    def persistent_load(self, pid):  # torch.save legacy persistent ids
        return pid


def stub_unpickle(path_or_bytes) -> Any:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        f = io.BytesIO(path_or_bytes)
        return _PermissiveUnpickler(f).load()
    with open(path_or_bytes, "rb") as f:
        return _PermissiveUnpickler(f).load()


def _to_numpy(v):
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def extract_state_dicts(module_obj, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a (possibly stubbed) torch module tree into {name: ndarray}."""
    out: Dict[str, np.ndarray] = {}
    d = getattr(module_obj, "__dict__", {})
    for bag in ("_parameters", "_buffers"):
        for name, value in (d.get(bag) or {}).items():
            if value is None:
                continue
            out[f"{prefix}{name}"] = _to_numpy(value)
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            out.update(extract_state_dicts(child, f"{prefix}{name}."))
    return out


def predictor_state_dicts(predictor) -> Dict[str, Dict[str, np.ndarray]]:
    """non_soc / soc state dicts from a stub-unpickled HamiltonianPredictor.

    The reference predictor wraps each model in the Lightning ``Model`` whose
    attributes are ``representation`` and ``output_module``
    (/root/reference/hamgnn/models/Model.py:63).
    """
    out = {}
    non_soc = getattr(predictor, "non_soc_model", None)
    if non_soc is not None:
        out["non_soc"] = extract_state_dicts(non_soc)
    soc = getattr(predictor, "soc_model", None)
    if soc is not None:
        out["soc"] = extract_state_dicts(soc)
    if not out:
        raise ValueError("pickle holds no non_soc_model/soc_model attributes")
    return out


def convert_predictor_pickle(pickle_path: str, config, out_dir: str,
                             example_graph=None) -> Dict[str, int]:
    """Reference predictor pickle -> Uni-HamGNN package directory.

    ``config`` is a resolved reference-schema config (hyperparameters of the
    published model); the non-SOC model is mapped onto the e3nn-compat
    representation + Hamiltonian head and saved as an orbax package the
    :mod:`hamgnn_tpu.tools.uni_hamgnn` predictor can load.  Returns counts of
    converted parameters per model.
    """
    import os

    import jax
    import orbax.checkpoint as ocp

    from ..models.basis import get_basis_set, hamiltonian_irreps
    from ..models.output import HamGNNPlusPlusOut
    from ..train.config import config_to_dict
    from .e3nn_compat import HamGNNConvE3Compat, map_reference_state
    from .torch_ckpt import assign_params

    states = predictor_state_dicts(stub_unpickle(pickle_path))
    state = states["non_soc"]

    pre = config.representation_nets.HamGNN_pre
    out_cfg = config.output_nets.HamGNN_out
    rep = HamGNNConvE3Compat(
        num_types=pre.num_types, irreps_edge_sh=pre.irreps_edge_sh,
        irreps_node_features=pre.irreps_node_features,
        num_layers=pre.num_layers, num_radial=pre.num_radial,
        rbf_func=pre.rbf_func.lower(), cutoff=pre.cutoff,
        radial_mlp=tuple(pre.radial_MLP))
    head = HamGNNPlusPlusOut(
        irreps_in_node=pre.irreps_node_features,
        irreps_in_edge=pre.irreps_node_features,
        nao_max=out_cfg.nao_max, ham_type=out_cfg.ham_type.lower(),
        ham_only=True, add_H0=out_cfg.add_H0,
        zero_point_shift=out_cfg.get("zero_point_shift", True))

    if example_graph is None:
        raise ValueError("example_graph required to shape the parameter tree")
    key = jax.random.PRNGKey(0)
    p_rep = rep.init(key, example_graph)
    feats = rep.apply(p_rep, example_graph)
    p_head = head.init(key, example_graph, feats)
    params = {"representation": p_rep["params"], "output": p_head["params"]}

    ham = hamiltonian_irreps(get_basis_set(out_cfg.ham_type.lower(),
                                           out_cfg.nao_max))
    # drop keys of heads we do not map (overlap heads absent for ham_only)
    state = {k: v for k, v in state.items()
             if not k.startswith("output_module.")
             or "hamiltonian_network" in k}
    assignments = map_reference_state(
        state, num_types=pre.num_types,
        irreps_node_features=pre.irreps_node_features,
        irreps_edge_sh=pre.irreps_edge_sh, num_layers=pre.num_layers,
        irreps_ham=ham)
    new_params, untouched = assign_params(params, assignments)
    if untouched:
        raise ValueError(f"unmapped model parameters: {untouched[:10]}")

    os.makedirs(out_dir, exist_ok=True)
    import yaml

    with open(os.path.join(out_dir, "nonsoc.yaml"), "w") as f:
        yaml.safe_dump(config_to_dict(config), f)
    with open(os.path.join(out_dir, "compat.yaml"), "w") as f:
        yaml.safe_dump({"execution_path": "e3nn_compat"}, f)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(out_dir, "nonsoc_params")),
               {"params": new_params}, force=True)
    ckptr.wait_until_finished()
    return {"non_soc": len(assignments)}
