"""LMDB streaming path (reference data/graph_data.py:23-94): on-demand store,
npz->lmdb conversion, and split/batch identity between the npz and LMDB
datasets.  Runs against real lmdb when installed, else the documented
lmdb-lite fallback (same keys/records, read on demand)."""

import numpy as np

from hamgnn_tpu.data.dataset import (GraphDataModule, LmdbGraphStore,
                                     load_graph_lmdb, load_graph_npz,
                                     save_graph_npz)
from hamgnn_tpu.tools.npz_to_lmdb import convert

from util_fixtures import add_random_hamiltonian_targets, make_crystal


def _dataset(tmp_path, n=6):
    rng = np.random.default_rng(2)
    crystals = []
    for _ in range(n):
        c = make_crystal(rng, n_atoms=3, species=(6, 14))
        crystals.append(add_random_hamiltonian_targets(rng, c, nao_max=14))
    npz = str(tmp_path / "graph_data.npz")
    save_graph_npz(npz, crystals)
    lmdb_path = str(tmp_path / "graph_data.lmdb")
    assert convert(npz, lmdb_path) == n
    return npz, lmdb_path, crystals


def test_roundtrip_and_lazy_access(tmp_path):
    npz, lmdb_path, crystals = _dataset(tmp_path)
    store = LmdbGraphStore(lmdb_path, cache_size=2)
    assert len(store) == len(crystals)
    for i in (0, 3, 5):
        np.testing.assert_allclose(store[i]["Hon"], crystals[i]["Hon"])
        np.testing.assert_allclose(store[i]["pos"], crystals[i]["pos"])
    assert len(store._cache) <= 2  # stayed lazy
    eager = load_graph_lmdb(lmdb_path)
    np.testing.assert_allclose(eager[4]["Hoff"], crystals[4]["Hoff"])


def test_npz_and_lmdb_datasets_identical(tmp_path):
    """Same seed-42 splits and bit-identical batches from both backends."""
    npz, lmdb_path, _ = _dataset(tmp_path)
    dm_npz = GraphDataModule(load_graph_npz(npz), batch_size=2)
    dm_lmdb = GraphDataModule(LmdbGraphStore(lmdb_path), batch_size=2)
    assert dm_npz.train_idx == dm_lmdb.train_idx
    assert dm_npz.val_idx == dm_lmdb.val_idx
    assert dm_npz.test_idx == dm_lmdb.test_idx
    for b1, b2 in zip(dm_npz.val_batches(), dm_lmdb.val_batches()):
        np.testing.assert_array_equal(np.asarray(b1.z), np.asarray(b2.z))
        np.testing.assert_allclose(np.asarray(b1.Hon), np.asarray(b2.Hon))
        np.testing.assert_allclose(np.asarray(b1.Hoff), np.asarray(b2.Hoff))
