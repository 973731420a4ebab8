"""Generate the small committed SCFOUT fixtures in tests/fixtures/.

The .scfout binaries are written by hamgnn_tpu.interfaces.scfout_writer; the
paired golden .HS.json.gz files were produced by compiling the *reference's*
own C reader (/root/reference/DFT_interfaces/openmx/openmx_postprocess/
read_openmx.c, gcc -O2) and running it on these exact binaries — so the
parser tests in tests/test_scfout_golden.py check our parser against the
reference implementation's output on identical bytes, not against ourselves.

Run: python tools_dev/gen_scfout_fixtures.py [--golden path/to/read_openmx]
(the --golden step regenerates the .HS.json.gz files; without it only the
binaries are rewritten).
"""

import argparse
import gzip
import json
import os
import shutil
import subprocess
import tempfile

import numpy as np

from hamgnn_tpu.interfaces.scfout_writer import write_scfout
from hamgnn_tpu.tools.sk_dataset import SKTeacher

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def si2_inputs():
    """Two Si atoms in a large box: 2 edges only (small committed files)."""
    teacher = SKTeacher(nao_max=14, seed=7)
    cell = np.eye(3) * 30.0
    pos = np.array([[10.0, 10.0, 10.0], [12.6, 12.0, 11.0]])
    z = np.array([14, 14])
    return teacher.build(z, pos, cell), cell, pos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--golden", default=None,
                    help="path to the compiled reference read_openmx binary")
    args = ap.parse_args()
    os.makedirs(FIXDIR, exist_ok=True)

    data, cell, pos = si2_inputs()
    common = dict(cell=cell, pos=pos, num_orbs=data["num_orbs"],
                  edge_src=data["edge_src"], edge_dst=data["edge_dst"],
                  cell_shift=data["cell_shift"], Son=data["Son"],
                  Soff=data["Soff"], valence_electrons=data["valence"],
                  chemp=-0.15)
    write_scfout(os.path.join(FIXDIR, "si2.scfout"),
                 Hon=[data["Hon"]], Hoff=[data["Hoff"]], **common)

    # SOC variant: 4 H spin components + 3 iH components (seeded random
    # symmetric-ish small blocks; parser-parity fixture, not physics)
    rng = np.random.RandomState(3)
    def blocks(shapes, scale):
        return [scale * rng.randn(*s) for s in shapes]
    on_shapes = [(13, 13)] * 2
    off_shapes = [(13, 13)] * data["edge_src"].shape[0]
    write_scfout(
        os.path.join(FIXDIR, "si2_soc.scfout"),
        Hon=[blocks(on_shapes, 0.3) for _ in range(4)],
        Hoff=[blocks(off_shapes, 0.1) for _ in range(4)],
        iHon=[blocks(on_shapes, 0.05) for _ in range(3)],
        iHoff=[blocks(off_shapes, 0.02) for _ in range(3)],
        Lon=[rng.randn(13, 13, 3) * 0.1 for _ in range(2)],
        Loff=[rng.randn(13, 13, 3) * 0.03 for _ in off_shapes],
        **common)

    if args.golden:
        for name in ("si2", "si2_soc"):
            with tempfile.TemporaryDirectory() as td:
                shutil.copy(os.path.join(FIXDIR, f"{name}.scfout"),
                            os.path.join(td, "in.scfout"))
                subprocess.run([os.path.abspath(args.golden), "in.scfout"],
                               cwd=td, check=True, capture_output=True)
                with open(os.path.join(td, "HS.json")) as f:
                    golden = json.load(f)
            with gzip.open(os.path.join(FIXDIR, f"{name}.HS.json.gz"),
                           "wt") as f:
                json.dump(golden, f)
            print(f"golden {name}.HS.json.gz written")
    print("fixtures written to", FIXDIR)


if __name__ == "__main__":
    main()
