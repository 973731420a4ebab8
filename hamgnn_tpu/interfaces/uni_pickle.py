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


_STORAGE_DTYPES = {
    "FloatStorage": np.float32, "DoubleStorage": np.float64,
    "HalfStorage": np.float16, "BFloat16Storage": np.uint16,  # raw bits
    "LongStorage": np.int64, "IntStorage": np.int32,
    "ShortStorage": np.int16, "CharStorage": np.int8,
    "ByteStorage": np.uint8, "BoolStorage": np.bool_,
    "ComplexFloatStorage": np.complex64,
    "ComplexDoubleStorage": np.complex128,
}


def _storage_dtype(storage_type) -> np.dtype:
    name = getattr(storage_type, "_stub_name", None) or getattr(
        storage_type, "__name__", str(storage_type))
    if name in _STORAGE_DTYPES:
        return np.dtype(_STORAGE_DTYPES[name])
    # torch.storage.TypedStorage path: pid carries a dtype object instead
    dt = getattr(storage_type, "dtype", None)
    if dt is not None:
        return np.dtype(str(dt).replace("torch.", ""))
    raise ValueError(f"unknown torch storage type {name!r}")


def _np_rebuild_tensor_v2(storage, storage_offset, size, stride,
                          requires_grad=False, backward_hooks=None,
                          metadata=None):
    """torch._utils._rebuild_tensor_v2 equivalent producing numpy arrays
    from the flat storage buffer (stride is in elements, torch-style)."""
    a = np.asarray(storage)
    if not size:
        return a[storage_offset].copy() if a.size else a
    itemsize = a.dtype.itemsize
    return np.lib.stride_tricks.as_strided(
        a[storage_offset:], shape=tuple(size),
        strides=tuple(s * itemsize for s in stride)).copy()


class _PermissiveUnpickler(pickle.Unpickler):
    """Unpickler that stubs unimportable classes; with ``storage_loader`` set
    (torch.save zip format) it also reconstructs tensor payloads as numpy
    arrays without importing torch."""

    storage_loader = None  # callable (dtype, key, numel) -> np.ndarray

    def find_class(self, module, name):
        if self.storage_loader is not None and module == "torch._utils":
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                return _np_rebuild_tensor_v2
            if name in ("_rebuild_parameter", "_rebuild_parameter_with_state"):
                return lambda data, requires_grad=True, *a: data
        try:
            return super().find_class(module, name)
        except Exception:  # noqa: BLE001 — any unimportable class gets a stub
            return _make_stub(module, name)

    def persistent_load(self, pid):
        if self.storage_loader is not None and isinstance(pid, tuple) \
                and len(pid) >= 4 and pid[0] == "storage":
            _, storage_type, key, _location, *rest = pid
            numel = rest[0] if rest else None
            return self.storage_loader(_storage_dtype(storage_type),
                                       str(key), numel)
        return pid  # plain-pickle persistent ids pass through


def _unpickle_torch_zip(path_or_bytes) -> Any:
    """torch.save (zipfile format, torch>=1.6): ``<name>/data.pkl`` +
    ``<name>/data/<key>`` raw little-endian storages."""
    import zipfile

    zf = zipfile.ZipFile(io.BytesIO(path_or_bytes)
                         if isinstance(path_or_bytes, (bytes, bytearray))
                         else path_or_bytes)
    names = zf.namelist()
    pkl = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
    root = pkl[: -len("data.pkl")]

    def load_storage(dtype, key, numel):
        raw = np.frombuffer(zf.read(f"{root}data/{key}"), dtype=dtype)
        if dtype == np.uint16:  # bfloat16 bits -> float32
            return (raw.astype(np.uint32) << 16).view(np.float32)
        return raw.copy()

    up = _PermissiveUnpickler(io.BytesIO(zf.read(pkl)))
    up.storage_loader = load_storage
    return up.load()


def stub_unpickle(path_or_bytes) -> Any:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        head = bytes(path_or_bytes[:4])
        if head.startswith(b"PK"):
            return _unpickle_torch_zip(path_or_bytes)
        return _PermissiveUnpickler(io.BytesIO(path_or_bytes)).load()
    with open(path_or_bytes, "rb") as f:
        head = f.read(4)
    if head.startswith(b"PK"):  # torch.save zip container
        return _unpickle_torch_zip(path_or_bytes)
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
                             example_graph=None,
                             soc_config=None) -> Dict[str, int]:
    """Reference predictor pickle -> Uni-HamGNN package directory.

    ``config`` / ``soc_config`` are resolved reference-schema configs
    (hyperparameters of the published two-stage predictor,
    Uni-HamiltonianPredictor.py:73-76).  The non-SOC model maps onto the
    e3nn-compat representation + Hamiltonian head; the SOC model (when
    present and ``soc_config`` given) onto the e3nn-compat representation +
    ``HamGNNSOCOut(add_H_nonsoc=True)``, so two-stage inference with the
    published weights runs through :mod:`hamgnn_tpu.tools.uni_hamgnn`.
    Returns counts of converted parameters per model.
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
    counts = {"non_soc": len(assignments)}

    # --- SOC stage (two-stage predictor, add_H_nonsoc) -------------------
    if "soc" in states and soc_config is not None:
        from ..models.soc import HamGNNSOCOut

        spre = soc_config.representation_nets.HamGNN_pre
        sout = soc_config.output_nets.HamGNN_out
        soc_basis = sout.get("soc_basis", "so3")
        srep = HamGNNConvE3Compat(
            num_types=spre.num_types, irreps_edge_sh=spre.irreps_edge_sh,
            irreps_node_features=spre.irreps_node_features,
            num_layers=spre.num_layers, num_radial=spre.num_radial,
            rbf_func=spre.rbf_func.lower(), cutoff=spre.cutoff,
            radial_mlp=tuple(spre.radial_MLP))
        shead = HamGNNSOCOut(
            irreps_in_node=spre.irreps_node_features,
            irreps_in_edge=spre.irreps_node_features,
            nao_max=sout.nao_max, ham_type=sout.ham_type.lower(),
            soc_basis=soc_basis, add_H0=sout.add_H0, add_H_nonsoc=True,
            symmetrize=True, zero_point_shift=False)

        sp_rep = srep.init(key, example_graph)
        sfeats = srep.apply(sp_rep, example_graph)
        nao = int(sout.nao_max)
        h0 = (jax.numpy.zeros((example_graph.z.shape[0], nao * nao)),
              jax.numpy.zeros((example_graph.edge_index.shape[1], nao * nao)))
        sp_head = shead.init(key, example_graph, sfeats, h_nonsoc=h0)
        sparams = {"representation": sp_rep["params"],
                   "output": sp_head["params"]}

        sham = hamiltonian_irreps(get_basis_set(sout.ham_type.lower(), nao))
        su2 = None
        if soc_basis == "su2":
            from ..models.soc import su2_base_irreps

            su2 = su2_base_irreps(get_basis_set(sout.ham_type.lower(), nao))
        s_assign = map_reference_state(
            states["soc"], num_types=spre.num_types,
            irreps_node_features=spre.irreps_node_features,
            irreps_edge_sh=spre.irreps_edge_sh, num_layers=spre.num_layers,
            irreps_ham=sham, soc_basis=soc_basis, irreps_ham_su2=su2,
            nao_max=nao, add_H_nonsoc=True)
        s_new, s_untouched = assign_params(sparams, s_assign)
        if s_untouched:
            raise ValueError(f"unmapped SOC parameters: {s_untouched[:10]}")
        with open(os.path.join(out_dir, "soc.yaml"), "w") as f:
            yaml.safe_dump(config_to_dict(soc_config), f)
        ckptr.save(os.path.abspath(os.path.join(out_dir, "soc_params")),
                   {"params": s_new}, force=True)
        ckptr.wait_until_finished()
        counts["soc"] = len(s_assign)
    return counts
