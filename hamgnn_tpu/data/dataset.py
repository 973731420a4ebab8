"""Dataset loading, splitting, and bucketed batching.

Covers the reference's data layer (/root/reference/hamgnn/data/graph_data.py):
  * ``graph_data.npz`` (pickled dict of PyG Data; loaded via the pickle shim)
    and LMDB stores (``graph_{i}`` keys, count in ``num_graphs``);
  * deterministic split with numpy RandomState(seed=42) shuffling and rounded
    ratios (graph_data.py:373-382) for split parity with the reference, plus
    ``split_file`` save/load;
  * a bucketed batcher that pads each batch of crystals to quantized
    node/edge bucket sizes so jit recompiles stay bounded (TPU static shapes).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .graph import Graph, pad_and_batch

_FIELDS = (
    "z", "pos", "cell", "edge_index", "inv_edge_idx", "nbr_shift", "cell_shift",
    "Hon", "Hoff", "Hon0", "Hoff0", "iHon", "iHoff", "iHon0", "iHoff0",
    "Son", "Soff", "Lon", "Loff", "doping_charge",
    "H0_u", "H0_d", "H_u", "H_d",
    # spin-constrained inputs (reference hamgnn_output.py:3222,3283)
    "spin_vec", "spin_length",
)


def _to_numpy(v):
    if hasattr(v, "detach"):  # torch tensor
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _crystal_dict(obj) -> Dict[str, np.ndarray]:
    """Normalize a loaded graph object (PyG Data / shim / dict) to numpy dict."""
    if isinstance(obj, dict):
        items = obj.items()
    elif hasattr(obj, "to_dict"):
        items = obj.to_dict().items()
    else:
        items = ((k, getattr(obj, k)) for k in _FIELDS if hasattr(obj, k))
    out = {}
    for k, v in items:
        if k in _FIELDS:
            out[k] = _to_numpy(v)
    return _repack_legacy_collinear(out)


def _repack_legacy_collinear(c: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Legacy collinear format (reference hamgnn_output.py:2962-2972): ``H0_u``
    etc. hold onsite rows for the first ``len(z)`` entries and offsite rows for
    the rest; repack into 2-spin-channel ``Hon0/Hoff0/Hon/Hoff`` stacks."""
    if "H0_u" not in c:
        return c
    n = int(np.asarray(c["z"]).shape[0])

    def flat(a):
        a = np.asarray(a)
        return a.reshape(a.shape[0], -1)

    c["Hon0"] = np.stack([flat(c["H0_u"][:n]), flat(c["H0_d"][:n])], axis=1)
    c["Hoff0"] = np.stack([flat(c["H0_u"][n:]), flat(c["H0_d"][n:])], axis=1)
    c["Hon"] = np.stack([flat(c["H_u"][:n]), flat(c["H_d"][:n])], axis=1)
    c["Hoff"] = np.stack([flat(c["H_u"][n:]), flat(c["H_d"][n:])], axis=1)
    for k in ("H0_u", "H0_d", "H_u", "H_d"):
        del c[k]
    return c


def load_graph_npz(path: str) -> List[Dict[str, np.ndarray]]:
    """Load a reference-format graph_data.npz into a list of crystal dicts."""
    from ..interfaces.pyg_shim import install_shim

    install_shim()
    with np.load(path, allow_pickle=True) as f:
        graphs = f["graph"].item()
    keys = sorted(graphs.keys(), key=lambda k: (isinstance(k, str), k))
    return [_crystal_dict(graphs[k]) for k in keys]


class LmdbGraphStore:
    """Lazy, on-demand graph store over the reference's LMDB layout
    (``graph_{i}`` keys, count in ``num_graphs``; reference
    data/graph_data.py:23-94) — the big-data streaming path: only the graphs
    a batch touches are resident, with a small LRU cache.

    When the ``lmdb`` module is unavailable (this sandbox bakes no lmdb), the
    store transparently reads/writes the **lmdb-lite** layout instead: a
    directory holding ``num_graphs`` (text) plus one ``graph_{i}.pkl`` pickle
    per crystal — same keys, same pickled shim-Data records, same on-demand
    access pattern.  ``npz_to_lmdb`` writes whichever backend is available.
    """

    def __init__(self, path: str, cache_size: int = 64):
        from ..interfaces.pyg_shim import install_shim

        install_shim()
        self.path = path
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}
        self._cache_size = cache_size
        self._env = None
        if os.path.isdir(path) and os.path.exists(
                os.path.join(path, "num_graphs")):
            self._backend = "lite"
            with open(os.path.join(path, "num_graphs")) as f:
                self._n = int(f.read().strip())
        else:
            import lmdb  # optional dependency; gated like the reference

            self._backend = "lmdb"
            self._env = lmdb.open(path, readonly=True, lock=False,
                                  readahead=False, meminit=False)
            with self._env.begin() as txn:
                self._n = int(txn.get(b"num_graphs").decode())

    def __len__(self) -> int:
        return self._n

    def _load(self, i: int):
        if self._backend == "lite":
            with open(os.path.join(self.path, f"graph_{i}.pkl"), "rb") as f:
                return pickle.load(f)
        with self._env.begin() as txn:
            return pickle.loads(txn.get(f"graph_{i}".encode()))

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(self._n))]
        if i < 0:
            i += self._n
        if i in self._cache:
            return self._cache[i]
        c = _crystal_dict(self._load(i))
        if len(self._cache) >= self._cache_size:
            self._cache.pop(next(iter(self._cache)))
        self._cache[i] = c
        return c

    def __iter__(self):
        for i in range(self._n):
            yield self[i]


def load_graph_lmdb(path: str, indices: Optional[Sequence[int]] = None
                    ) -> List[Dict[str, np.ndarray]]:
    """Eagerly load graphs from an LMDB (or lmdb-lite) store."""
    store = LmdbGraphStore(path, cache_size=1)
    idxs = list(indices) if indices is not None else range(len(store))
    return [store[i] for i in idxs]


def save_graph_npz(path: str, crystals: Sequence[Dict[str, np.ndarray]]) -> None:
    """Write reference-compatible graph_data.npz (via shim Data objects)."""
    from ..interfaces.pyg_shim import Data, install_shim

    install_shim()
    graphs = {i: Data(**{k: v for k, v in c.items()}) for i, c in enumerate(crystals)}
    np.savez(path, graph=graphs)


def reference_split(
    n: int,
    train_ratio: float = 0.6,
    val_ratio: float = 0.2,
    test_ratio: float = 0.2,
    split_file: Optional[str] = None,
) -> Tuple[List[int], List[int], List[int]]:
    """Seed-42 split identical to the reference (graph_data.py:362-391)."""
    if split_file is not None and os.path.exists(split_file):
        data = np.load(split_file)
        return (data["train_idx"].tolist(), data["val_idx"].tolist(),
                data["test_idx"].tolist())
    rs = np.random.RandomState(seed=42)
    indices = list(range(n))
    rs.shuffle(indices)
    num_train = round(train_ratio * n)
    num_val = round(val_ratio * n)
    train = indices[:num_train]
    val = indices[num_train : num_train + num_val]
    test = indices[num_train + num_val :]
    if split_file is not None:
        np.savez(split_file, train_idx=np.array(train), val_idx=np.array(val),
                 test_idx=np.array(test))
    return train, val, test


def _bucket(x: int, quantum: int) -> int:
    return max(quantum, ((x + quantum - 1) // quantum) * quantum)


class GraphDataModule:
    """Split + batching front-end (reference ``graph_data_module`` equivalent)."""

    def __init__(
        self,
        graphs: Sequence[Dict[str, np.ndarray]],
        batch_size: int = 1,
        train_ratio: float = 0.6,
        val_ratio: float = 0.2,
        test_ratio: float = 0.2,
        split_file: Optional[str] = None,
        test_mode: bool = False,
        node_quantum: int = 16,
        edge_quantum: int = 256,
    ):
        # keep lazy stores lazy (LMDB streaming); materialize iterators
        self.graphs = graphs if hasattr(graphs, "__getitem__") else list(graphs)
        self.batch_size = batch_size
        self.node_quantum = node_quantum
        self.edge_quantum = edge_quantum
        n = len(self.graphs)
        if test_mode:
            self.train_idx, self.val_idx = [], []
            self.test_idx = list(range(n))
        else:
            self.train_idx, self.val_idx, self.test_idx = reference_split(
                n, train_ratio, val_ratio, test_ratio, split_file)

    def _batches(self, indices: Sequence[int], shuffle: bool, rng=None
                 ) -> Iterator[Graph]:
        order = list(indices)
        if shuffle:
            (rng or np.random.default_rng()).shuffle(order)
        for i in range(0, len(order), self.batch_size):
            chunk = [self.graphs[j] for j in order[i : i + self.batch_size]]
            n_tot = sum(c["z"].shape[0] for c in chunk)
            e_tot = sum(c["edge_index"].shape[1] for c in chunk)
            yield pad_and_batch(
                chunk,
                node_bucket=_bucket(n_tot, self.node_quantum),
                edge_bucket=_bucket(e_tot, self.edge_quantum),
            )

    def train_batches(self, rng=None) -> Iterator[Graph]:
        return self._batches(self.train_idx, shuffle=True, rng=rng)

    def val_batches(self) -> Iterator[Graph]:
        return self._batches(self.val_idx, shuffle=False)

    def test_batches(self) -> Iterator[Graph]:
        return self._batches(self.test_idx, shuffle=False)
