"""npz -> LMDB converter (reference tools/npz_to_lmdb.py:17-158).

Streams each crystal dict into an LMDB store under ``graph_{i}`` keys with the
count in ``num_graphs``, auto-sizing the map.  Entries are pickled shim-Data
objects, so both this framework and the reference (with real torch_geometric)
can read the result.
"""

from __future__ import annotations

import argparse
import os
import pickle


def convert(npz_path: str, lmdb_path: str, map_size_factor: float = 4.0) -> int:
    from ..data.dataset import load_graph_npz
    from ..interfaces.pyg_shim import Data, install_shim

    install_shim()
    graphs = load_graph_npz(npz_path)
    try:
        import lmdb  # optional dependency, gated like the reference
    except ImportError:
        # lmdb-lite fallback (see data.dataset.LmdbGraphStore): directory
        # with a ``num_graphs`` text file + one pickle per graph — same keys
        # and records, still read on demand by the streaming store
        os.makedirs(lmdb_path, exist_ok=True)
        for i, c in enumerate(graphs):
            with open(os.path.join(lmdb_path, f"graph_{i}.pkl"), "wb") as f:
                pickle.dump(Data(**c), f)
        with open(os.path.join(lmdb_path, "num_graphs"), "w") as f:
            f.write(str(len(graphs)))
        return len(graphs)
    est = os.path.getsize(npz_path) * map_size_factor + (1 << 24)
    env = lmdb.open(lmdb_path, map_size=int(est))
    with env.begin(write=True) as txn:
        for i, c in enumerate(graphs):
            txn.put(f"graph_{i}".encode(), pickle.dumps(Data(**c)))
        txn.put(b"num_graphs", str(len(graphs)).encode())
    env.close()
    return len(graphs)


def main(argv=None):
    parser = argparse.ArgumentParser(description="graph_data.npz -> LMDB")
    parser.add_argument("npz")
    parser.add_argument("lmdb")
    args = parser.parse_args(argv)
    n = convert(args.npz, args.lmdb)
    print(f"wrote {n} graphs to {args.lmdb}")


if __name__ == "__main__":
    main()
