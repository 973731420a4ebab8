"""Command-line entry point: ``hamgnn-tpu --config config.yaml``.

Equivalent of the reference's ``HamGNN2.0`` console script
(/root/reference/hamgnn/main.py:546-579): load YAML-over-defaults config, seed
(666), build dataset + model, dispatch fit / test, save predictions
(prediction_hamiltonian.npy / target_hamiltonian.npy, Model.py:541-567).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional, Tuple

import numpy as np

from .models.model import HamGNNModel
from .models.output import HamGNNPlusPlusOut, concatenate_by_crystal
from .models.representation import HamGNNConvE3, HamGNNTransformer
from .train.config import config_to_dict, load_config


def build_model(config) -> HamGNNModel:
    """Construct representation + output modules from a reference-schema config
    (mirrors main.py:178-263)."""
    pre = config.representation_nets.HamGNN_pre
    out = config.output_nets.HamGNN_out

    gnn_net = config.setup.get("GNN_Net", "HamGNNpre").lower()
    if gnn_net == "hamgnntransformer":
        rep = HamGNNTransformer(
            num_types=pre.num_types,
            irreps_edge_sh=pre.irreps_edge_sh,
            irreps_node_features=pre.irreps_node_features,
            num_layers=pre.num_layers,
            num_radial=pre.num_radial,
            rbf_func=pre.rbf_func.lower(),
            cutoff=pre.cutoff,
            cutoff_func=pre.get("cutoff_func", "cos"),
            radial_mlp=tuple(pre.radial_MLP),
            num_heads=pre.get("num_heads", 4),
            correlation=pre.get("correlation", 2),
            num_hidden_features=pre.get("num_hidden_features", 16),
            use_kan=pre.get("use_kan", False),
            apply_charge_doping=pre.get("apply_charge_doping", False),
            num_charge_attr_feas=pre.get("num_charge_attr_feas", 8),
        )
        return _attach_head(config, rep)
    rep = HamGNNConvE3(
        num_types=pre.num_types,
        irreps_edge_sh=pre.irreps_edge_sh,
        irreps_node_features=pre.irreps_node_features,
        num_layers=pre.num_layers,
        num_radial=pre.num_radial,
        rbf_func=pre.rbf_func.lower(),
        cutoff=pre.cutoff,
        cutoff_func=pre.get("cutoff_func", "cos"),
        radial_mlp=tuple(pre.radial_MLP),
        use_corr_prod=pre.get("use_corr_prod", False),
        correlation=pre.get("correlation", 2),
        num_hidden_features=pre.get("num_hidden_features", 16),
        use_kan=pre.get("use_kan", False),
        lite_mode=pre.get("lite_mode", False),
        apply_charge_doping=pre.get("apply_charge_doping", False),
        num_charge_attr_feas=pre.get("num_charge_attr_feas", 8),
        use_gradient_checkpointing=(
            pre.get("use_gradient_checkpointing", False)
            or config.setup.get("use_gradient_checkpointing", False)),
        legacy_edge_update=pre.get("legacy_edge_update", False),
    )

    return _attach_head(config, rep)


def _band_control_kwargs(out) -> dict:
    """Map the reference's int/dict ``band_num_control``
    (hamgnn_output.py:812-830) onto the static-shape head attributes.

    int -> window of that many bands either side of half filling.
    dict {Z: count} -> per-species counts; the head exports the lowest
    ``max_bands`` (config key, default 32) bands plus a per-crystal mask.
    Any other value (e.g. float fractional window) maps to ``None`` in the
    reference (no truncation, hamgnn_output.py:826-830); static shapes need a
    fixed window, so we warn and substitute a ±``max_bands`` window around
    half filling instead of crashing on reference YAMLs.
    """
    bnc = out.get("band_num_control", 8)
    if bnc is None:
        bnc = 8
    if isinstance(bnc, bool):
        bnc = 8  # bool is an int subclass; treat as unset
    if isinstance(bnc, int):
        return {"band_num_control": bnc}
    if isinstance(bnc, dict):
        counts = tuple(sorted((int(z), int(n)) for z, n in bnc.items()))
        return {
            "band_num_control": int(out.get("max_bands", 32)),
            "band_species_counts": counts,
        }
    import warnings

    max_bands = int(out.get("max_bands", 32))
    warnings.warn(
        f"band_num_control={bnc!r}: only int / per-species dict are "
        f"supported. The reference treats this as band_num_control=None "
        f"(no truncation, all bands; hamgnn_output.py:826-830); static "
        f"shapes need a fixed window, so substituting a +/-{max_bands}-band "
        f"window around half filling instead (set max_bands to widen it)",
        stacklevel=2)
    return {"band_num_control": max_bands}


def _freeze_k_path(spec):
    """YAML k_path -> hashable module attribute ('auto' | node tuple | None)."""
    if spec is None or isinstance(spec, str):
        return spec
    return tuple(tuple(float(v) for v in node) for node in spec)


def _attach_head(config, rep) -> HamGNNModel:
    pre = config.representation_nets.HamGNN_pre
    out = config.output_nets.HamGNN_out
    soc = out.get("soc_switch", False)
    if out.get("spin_constrained", False):
        from .models.spin import HamGNNMagneticOut

        head = HamGNNMagneticOut(
            irreps_in_node=pre.irreps_node_features,
            irreps_in_edge=pre.irreps_node_features,
            nao_max=out.nao_max,
            ham_type=out.ham_type.lower(),
            soc_switch=soc,
            collinear_spin=out.get("collinear_spin", False),
            use_learned_weight=out.get("use_learned_weight", True),
            min_magnetic_moment=out.get("minMagneticMoment", 0.5),
            add_H0=out.add_H0,
            symmetrize=out.symmetrize,
            nonlinearity_type=out.get("nonlinearity_type", "gate"),
            calculate_band_energy=out.get("calculate_band_energy", False),
            num_k=out.get("num_k", 5),
            band_num_control=(out.get("band_num_control", 8)
                              if isinstance(out.get("band_num_control", 8), int)
                              and not isinstance(out.get("band_num_control", 8), bool)
                              else 8),
            k_path=_freeze_k_path(out.get("k_path", None)),
            export_reciprocal_values=out.get("export_reciprocal_values", False),
        )
        return HamGNNModel(representation=rep, output=head)
    if soc:
        from .models.soc import HamGNNSOCOut

        head = HamGNNSOCOut(
            irreps_in_node=pre.irreps_node_features,
            irreps_in_edge=pre.irreps_node_features,
            nao_max=out.nao_max,
            ham_type=out.ham_type.lower(),
            soc_basis=("su2" if out.ham_type.lower() != "openmx"
                       else out.get("soc_basis", "so3")),
            add_H0=out.add_H0,
            add_H_nonsoc=out.get("add_H_nonsoc", False),
            symmetrize=out.symmetrize,
            zero_point_shift=out.get("zero_point_shift", True),
            nonlinearity_type=out.get("nonlinearity_type", "gate"),
            calculate_band_energy=out.get("calculate_band_energy", False),
            num_k=out.get("num_k", 5),
            band_num_control=(out.get("band_num_control", 8)
                              if isinstance(out.get("band_num_control", 8), int)
                              else 8),
            k_path=_freeze_k_path(out.get("k_path", None)),
        )
    else:
        head = HamGNNPlusPlusOut(
            irreps_in_node=pre.irreps_node_features,
            irreps_in_edge=pre.irreps_node_features,
            nao_max=out.nao_max,
            ham_type=out.ham_type.lower(),
            ham_only=out.ham_only,
            symmetrize=out.symmetrize,
            add_H0=out.add_H0,
            zero_point_shift=out.get("zero_point_shift", True),
            nonlinearity_type=out.get("nonlinearity_type", "gate"),
            calculate_band_energy=out.get("calculate_band_energy", False),
            num_k=out.get("num_k", 5),
            k_path=_freeze_k_path(out.get("k_path", None)),
            **_band_control_kwargs(out),
        )
    return HamGNNModel(representation=rep, output=head)


def audit_config(config) -> None:
    """Warn (never silently ignore) on reference config knobs that this
    framework handles differently — see docs/parameters.md for the full
    audit table of every parameter in the reference README.md:441-558."""
    import warnings

    setup = config.setup
    pre = config.representation_nets.HamGNN_pre
    out = config.output_nets.HamGNN_out
    ds = config.dataset_params

    if int(setup.get("precision", 32)) == 64:
        warnings.warn(
            "setup.precision=64: TPU cores have no native fp64; this build "
            "runs fp32 on TPU (CPU fp64 cross-checks live in the test "
            "suite). Proceeding in fp32.", stacklevel=2)
    if pre.get("edge_sh_normalization", "component") != "component" or             not pre.get("edge_sh_normalize", True):
        warnings.warn(
            "edge_sh_normalization: only the reference default "
            "('component', normalized) is implemented; other settings are "
            "ignored.", stacklevel=2)
    if pre.get("build_internal_graph", False):
        warnings.warn(
            "build_internal_graph=true: the graph is rebuilt at data-prep "
            "time here (data/neighborlist.py), not inside the forward; "
            "stored edges are used as-is.", stacklevel=2)
    for k, why in [
        ("include_triplet", "triplet export is provided by utils/triplets.py "
         "at data-prep time, not in the forward"),
        ("return_forces", "force heads are not implemented (dead default in "
         "the reference: no shipped config enables it)"),
        ("create_graph", "autograd-graph control is torch-specific; jax "
         "grads need no flag"),
        ("get_nonzero_mask_tensor", "masks are always exported "
         "(result['mask_on'/'mask_off'])"),
    ]:
        if out.get(k, False):
            warnings.warn(f"output_nets.{k}=true is not honored: {why}.",
                          stacklevel=2)
    if not out.get("calculate_sparsity", True):
        warnings.warn(
            "calculate_sparsity=false is not honored: the sparsity ratio is "
            "computed on-device at negligible cost and always exported.",
            stacklevel=2)
    if ds.get("num_workers", 4) not in (0, 4) or ds.get("preload", 0):
        warnings.warn(
            "dataset_params.num_workers/preload are torch DataLoader knobs; "
            "this build loads graphs host-side up front (npz) or on demand "
            "(lmdb) without worker processes.", stacklevel=2)


def prepare_dataset(config):
    from .data.dataset import GraphDataModule, load_graph_lmdb, load_graph_npz

    path = config.dataset_params.graph_data_path
    fmt = str(config.dataset_params.get("data_format", "auto")).lower()
    if not os.path.isfile(path) and not path.lower().endswith(".lmdb") \
            and fmt != "lmdb":
        path = os.path.join(path, "graph_data.npz")
    if fmt == "lmdb" or (fmt == "auto" and path.lower().endswith(".lmdb")):
        # streaming store: graphs load on demand (LRU-cached) instead of
        # residing in memory — the reference's LMDB big-data path
        from .data.dataset import LmdbGraphStore

        graphs = LmdbGraphStore(path)
    else:
        graphs = load_graph_npz(path)
    # fail fast on elements without a basis_def entry (reference
    # hamgnn_output.py:2874-2914) instead of training on zero-masked blocks
    from .models.basis import get_basis_set, validate_elements_in_basis_def

    out = config.output_nets.HamGNN_out
    basis = get_basis_set(out.ham_type.lower(), out.nao_max)
    all_z = np.unique(np.concatenate([np.asarray(g["z"]) for g in graphs]))
    # (iterating a streaming store touches each graph once; only z survives)
    validate_elements_in_basis_def(all_z, basis)
    return GraphDataModule(
        graphs,
        batch_size=config.dataset_params.batch_size,
        train_ratio=config.dataset_params.train_ratio,
        val_ratio=config.dataset_params.val_ratio,
        test_ratio=config.dataset_params.test_ratio,
        split_file=config.dataset_params.split_file,
        test_mode=(config.setup.stage == "test"),
    )


def _dump_resolved_config(config) -> None:
    """Record the fully-resolved config + version in train_dir (the
    reference's TB-hparams equivalent, main.py:508-522 / utils/hparam.py)."""
    import yaml

    from .version import version_string

    out_dir = config.profiler_params.train_dir
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config_resolved.yaml"), "w") as f:
        f.write(f"# {version_string()}\n")
        yaml.safe_dump(config_to_dict(config), f, sort_keys=False)


def train_and_evaluate(config) -> None:
    from .parallel.multihost import is_primary, maybe_initialize_distributed
    from .train.trainer import Trainer

    # multi-host (replaces the reference's DDP strategy selection,
    # main.py:300-323): env-driven jax.distributed bring-up; host-side
    # effects below are rank-zero gated
    maybe_initialize_distributed()

    audit_config(config)
    data = prepare_dataset(config)
    if is_primary():
        _dump_resolved_config(config)
    model = build_model(config)

    trainer_kwargs = dict(
        losses=[config_to_dict(l) for l in config.losses_metrics.losses],
        metrics=[config_to_dict(m) for m in config.losses_metrics.metrics],
        lr=config.optim_params.lr,
        lr_decay=config.optim_params.lr_decay,
        lr_patience=config.optim_params.lr_patience,
        gradient_clip_val=config.optim_params.gradient_clip_val,
        stop_patience=config.optim_params.stop_patience,
        min_epochs=config.optim_params.min_epochs,
        max_epochs=config.optim_params.max_epochs,
        train_dir=config.profiler_params.train_dir,
    )

    # multi-chip strategy selection (reference: automatic DDP selection in
    # main.py:300-323; here config-driven — see train/config.py `parallel`)
    par = config.setup.get("parallel", None)
    mode = (par.get("mode", "none") if par is not None else "none").lower()
    if mode in ("dp", "halo"):
        import jax

        from .parallel.halo_trainer import HaloDataAdapter, HaloTrainer

        n_dev = len(jax.devices())
        n_graph = int(par.get("n_graph", 0) or 0)
        n_data = int(par.get("n_data", 0) or 0)
        if mode == "dp":
            n_graph = n_graph or 1
            n_data = n_data or max(1, n_dev // n_graph)
        else:
            n_graph = n_graph or max(1, n_dev // max(n_data, 1))
            n_data = n_data or max(1, n_dev // n_graph)
        edge_q = int(par.get("edge_quantum", 64) or 64)
        if getattr(model.output, "calculate_band_energy", False) and n_data != 1:
            # band losses under the partition run whole-crystal solves on
            # all_gathered rows — one crystal per step (big-crystal regime)
            n_graph = max(n_graph * n_data, n_graph)
            n_data = 1
        trainer = HaloTrainer(model, n_data=n_data, n_graph=n_graph,
                              edge_quantum=edge_q, **trainer_kwargs)
        data = HaloDataAdapter(data, n_data=n_data, n_graph=n_graph,
                               edge_quantum=edge_q,
                               band_mode=trainer._band_mode)
        example = data.example_graph()
    else:
        trainer = Trainer(model, **trainer_kwargs)
        example = next(iter(data.test_batches() if config.setup.stage == "test"
                            else data.train_batches()))
    trainer.init_params(example)

    ckpt_path = config.setup.checkpoint_path
    if config.setup.stage == "test" or config.setup.get("load_from_checkpoint"):
        if ckpt_path and os.path.exists(ckpt_path):
            trainer.load_checkpoint(ckpt_path)
            if (config.setup.stage == "fit"
                    and not config.setup.get("resume", False)):
                # warm start (reference secondary training, README.md:270-280):
                # fresh LR schedule at the configured rate; `resume: true`
                # keeps the checkpointed LR instead
                trainer.sched.lr = float(config.optim_params.lr)

    if config.setup.stage == "fit":
        trainer.fit(data)
        # final test pass
        _, logs, preds_all = trainer.eval_epoch(data.test_batches(), collect=True)
        _save_predictions(config, preds_all)
        print("test metrics:", logs)
    else:
        _, logs, preds_all = trainer.eval_epoch(data.test_batches(), collect=True)
        _save_predictions(config, preds_all)
        print("test metrics:", logs)


def _save_predictions(config, preds_all) -> None:
    """Save prediction/target .npy in the reference's interleaved layout
    (rank-zero only, like the reference's Model.py:541-567)."""
    from .parallel.multihost import is_primary

    if not is_primary():
        return
    out_dir = config.profiler_params.train_dir
    os.makedirs(out_dir, exist_ok=True)
    # SOC heads export real/imag spinor rows (reference saves real||imag,
    # hamgnn_output.py:3616-3626; here as two .npy files)
    soc_r, soc_i, soc_rt, soc_it = [], [], [], []
    for g, p in preds_all:
        if "hamiltonian_real_on" in p:
            soc_r.append(concatenate_by_crystal(
                g, p["hamiltonian_real_on"], p["hamiltonian_real_off"]))
            soc_i.append(concatenate_by_crystal(
                g, p["hamiltonian_imag_on"], p["hamiltonian_imag_off"]))
            soc_rt.append(concatenate_by_crystal(
                g, np.asarray(g.Hon), np.asarray(g.Hoff)))
            soc_it.append(concatenate_by_crystal(
                g, np.asarray(g.iHon), np.asarray(g.iHoff)))
    if soc_r:
        np.save(os.path.join(out_dir, "prediction_hamiltonian_real.npy"),
                np.concatenate(soc_r, axis=0))
        np.save(os.path.join(out_dir, "prediction_hamiltonian_imag.npy"),
                np.concatenate(soc_i, axis=0))
        np.save(os.path.join(out_dir, "target_hamiltonian_real.npy"),
                np.concatenate(soc_rt, axis=0))
        np.save(os.path.join(out_dir, "target_hamiltonian_imag.npy"),
                np.concatenate(soc_it, axis=0))
        return
    preds, targets = [], []
    for g, p in preds_all:
        if "hamiltonian_on" not in p:
            continue
        preds.append(concatenate_by_crystal(g, p["hamiltonian_on"], p["hamiltonian_off"]))
        targets.append(concatenate_by_crystal(g, np.asarray(g.Hon), np.asarray(g.Hoff)))
    if preds:
        pred_all = np.concatenate(preds, axis=0)
        target_all = np.concatenate(targets, axis=0)
        np.save(os.path.join(out_dir, "prediction_hamiltonian.npy"), pred_all)
        np.save(os.path.join(out_dir, "target_hamiltonian.npy"), target_all)
        try:  # pred-vs-target scatter, like the reference's TB figures
            from .utils.visualization import scatter_plot

            scatter_plot(pred_all, target_all,
                         os.path.join(out_dir, "hamiltonian_scatter.png"))
        except Exception as exc:
            print(f"scatter plot skipped: {exc}")


def main(argv: Optional[list] = None) -> None:
    parser = argparse.ArgumentParser(description="HamGNN-TPU")
    parser.add_argument("--config", "-c", default="config_default.yaml")
    args, _ = parser.parse_known_args(argv)
    from .version import print_banner

    print_banner()
    config = load_config(args.config)
    np.random.seed(666)
    train_and_evaluate(config)


if __name__ == "__main__":
    main()
