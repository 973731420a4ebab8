"""Uni-HamGNN: universal two-stage Hamiltonian predictor.

Reference: /root/reference/Uni-HamGNN/Uni-HamiltonianPredictor.py — a non-SOC
model predicts the spatial Hamiltonian; a SOC model with ``add_H_nonsoc``
consumes that prediction and adds the spin-orbit structure (:73-76,306-311).
Instead of pickling live model objects (the reference's fragile
legacy-alias/attribute-patching approach, :85-137), a predictor package is a
directory: {nonsoc.yaml, soc.yaml, nonsoc_params/, soc_params/} with orbax
checkpoints — robust across versions.

CLI: ``python -m hamgnn_tpu.tools.uni_hamgnn --config Input.yaml`` with the
reference's keys (model_pkl_path -> model_package_path accepted too,
non_soc_data_dir, soc_data_dir, output_dir, calculate_mae).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np
import yaml

from ..cli import build_model
from ..data.dataset import GraphDataModule, load_graph_npz
from ..models.output import concatenate_by_crystal
from ..train.config import load_config


def _build_compat_model(config):
    """Reference-parametrization model for packages converted from the
    published predictor pickles (interfaces/uni_pickle.py): e3nn-compat
    representation + the native Hamiltonian head."""
    from ..interfaces.e3nn_compat import HamGNNConvE3Compat
    from ..models.model import HamGNNModel
    from ..models.output import HamGNNPlusPlusOut

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
    return HamGNNModel(representation=rep, output=head)


def _build_compat_soc_model(config):
    """e3nn-compat representation + SOC head (add_H_nonsoc two-stage mode)."""
    from ..interfaces.e3nn_compat import HamGNNConvE3Compat
    from ..models.model import HamGNNModel
    from ..models.soc import HamGNNSOCOut

    pre = config.representation_nets.HamGNN_pre
    out_cfg = config.output_nets.HamGNN_out
    rep = HamGNNConvE3Compat(
        num_types=pre.num_types, irreps_edge_sh=pre.irreps_edge_sh,
        irreps_node_features=pre.irreps_node_features,
        num_layers=pre.num_layers, num_radial=pre.num_radial,
        rbf_func=pre.rbf_func.lower(), cutoff=pre.cutoff,
        radial_mlp=tuple(pre.radial_MLP))
    head = HamGNNSOCOut(
        irreps_in_node=pre.irreps_node_features,
        irreps_in_edge=pre.irreps_node_features,
        nao_max=out_cfg.nao_max, ham_type=out_cfg.ham_type.lower(),
        soc_basis=out_cfg.get("soc_basis", "so3"),
        add_H0=out_cfg.add_H0, add_H_nonsoc=True, symmetrize=True,
        zero_point_shift=False)
    return HamGNNModel(representation=rep, output=head)


class HamiltonianPredictor:
    """Bundles a non-SOC model and an optional SOC model (add_H_nonsoc)."""

    def __init__(self, config_nonsoc_path: str,
                 config_soc_path: Optional[str] = None,
                 soc_switch: bool = False, compat: bool = False):
        self.soc_enabled = soc_switch
        self.compat = compat
        self.config_nonsoc = load_config(config_nonsoc_path)
        self.model_nonsoc = (_build_compat_model(self.config_nonsoc)
                             if compat else build_model(self.config_nonsoc))
        self.params_nonsoc = None
        if soc_switch:
            self.config_soc = load_config(config_soc_path, overrides={
                "output_nets": {"HamGNN_out": {
                    "add_H_nonsoc": True, "zero_point_shift": False}}})
            self.model_soc = (_build_compat_soc_model(self.config_soc)
                              if compat else build_model(self.config_soc))
            self.params_soc = None

    # -- persistence -----------------------------------------------------

    def save(self, package_dir: str) -> None:
        import orbax.checkpoint as ocp

        os.makedirs(package_dir, exist_ok=True)
        from ..train.config import config_to_dict

        with open(os.path.join(package_dir, "nonsoc.yaml"), "w") as f:
            yaml.safe_dump(config_to_dict(self.config_nonsoc), f)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(os.path.join(package_dir, "nonsoc_params")),
                   self.params_nonsoc, force=True)
        if self.soc_enabled:
            with open(os.path.join(package_dir, "soc.yaml"), "w") as f:
                yaml.safe_dump(config_to_dict(self.config_soc), f)
            ckptr.save(os.path.abspath(os.path.join(package_dir, "soc_params")),
                       self.params_soc, force=True)
        ckptr.wait_until_finished()

    @classmethod
    def load(cls, package_dir: str) -> "HamiltonianPredictor":
        import jax
        import orbax.checkpoint as ocp

        soc = os.path.exists(os.path.join(package_dir, "soc.yaml"))
        compat = os.path.exists(os.path.join(package_dir, "compat.yaml"))
        pred = cls(os.path.join(package_dir, "nonsoc.yaml"),
                   os.path.join(package_dir, "soc.yaml") if soc else None,
                   soc_switch=soc, compat=compat)
        ckptr = ocp.StandardCheckpointer()
        pred.params_nonsoc = ckptr.restore(
            os.path.abspath(os.path.join(package_dir, "nonsoc_params")))
        if soc:
            pred.params_soc = ckptr.restore(
                os.path.abspath(os.path.join(package_dir, "soc_params")))
        return pred

    # -- prediction ------------------------------------------------------

    def predict_nonsoc(self, graph):
        import jax

        preds = jax.jit(self.model_nonsoc.apply)(self.params_nonsoc, graph)
        return preds

    def predict_soc(self, graph_soc, h_nonsoc_on, h_nonsoc_off):
        import jax

        model = self.model_soc

        @jax.jit
        def run(params, g, h_on, h_off):
            return model.apply(
                params, g,
                method=lambda m, gg: m.output(
                    gg, m.representation(gg), h_nonsoc=(h_on, h_off)))

        return run(self.params_soc, graph_soc, h_nonsoc_on, h_nonsoc_off)


def masked_mae(pred, target, mask):
    m = np.asarray(mask) > 0
    return float(np.abs(np.asarray(pred)[m] - np.asarray(target)[m]).mean())


def main(argv=None):
    parser = argparse.ArgumentParser(description="Uni-HamGNN inference")
    parser.add_argument("--config", default="Input.yaml", type=str)
    args = parser.parse_args(argv)
    with open(args.config, encoding="utf-8") as f:
        cfg = yaml.safe_load(f)

    pkg = cfg.get("model_package_path") or cfg.get("model_pkl_path")
    out_dir = cfg.get("output_dir", "./")
    os.makedirs(out_dir, exist_ok=True)
    predictor = HamiltonianPredictor.load(pkg)

    graphs = load_graph_npz(cfg["non_soc_data_dir"])
    data = GraphDataModule(graphs, batch_size=1, test_mode=True)
    soc_graphs = None
    if predictor.soc_enabled and cfg.get("soc_data_dir"):
        soc_graphs = load_graph_npz(cfg["soc_data_dir"])
        soc_data = GraphDataModule(soc_graphs, batch_size=1, test_mode=True)

    rows_out = []
    maes = []
    batches = list(data.test_batches())
    soc_batches = list(soc_data.test_batches()) if soc_graphs else [None] * len(batches)
    for g, g_soc in zip(batches, soc_batches):
        preds = predictor.predict_nonsoc(g)
        if predictor.soc_enabled and g_soc is not None:
            soc_preds = predictor.predict_soc(
                g_soc, preds["hamiltonian_on"], preds["hamiltonian_off"])
            on = np.asarray(soc_preds["hamiltonian_real_on"])
            off = np.asarray(soc_preds["hamiltonian_real_off"])
            rows_out.append(concatenate_by_crystal(g_soc, on, off))
            if cfg.get("calculate_mae") and g_soc.Hon is not None:
                maes.append(masked_mae(on, np.asarray(g_soc.Hon),
                                       np.asarray(soc_preds["mask_on"])))
        else:
            on = np.asarray(preds["hamiltonian_on"])
            off = np.asarray(preds["hamiltonian_off"])
            rows_out.append(concatenate_by_crystal(g, on, off))
            if cfg.get("calculate_mae") and g.Hon is not None:
                maes.append(masked_mae(on, np.asarray(g.Hon),
                                       np.asarray(preds["mask_on"])))

    np.save(os.path.join(out_dir, "prediction_hamiltonian.npy"),
            np.concatenate(rows_out, axis=0))
    if maes:
        print(f"masked MAE: {np.mean(maes):.3e} Hartree")


if __name__ == "__main__":
    main()
