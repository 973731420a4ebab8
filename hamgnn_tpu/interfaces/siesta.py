"""SIESTA/HONPAS interface: direct .HSX parsing and graph packing.

The reference pipeline shells out to a Fortran dumper (hsx_m.f90 + dump.f90 ->
stream file) parsed by read_siesta.py.  Here the .HSX Fortran sequential
unformatted file is read directly in numpy (record layout per
/root/reference/DFT_interfaces/siesta/hsx4.1.5/hsx_m.f90:95-231), removing the
native dependency entirely:

  records: (no_u, no_s, nspin, nh); (gamma); [indxuo if not gamma];
  numh(no_u); listh per row; H per (spin, row) float32 in Ry; S per row;
  (qtot, temp); xij per row (3*numh floats, Bohr); nspecies;
  (label, zval, no)*; (nquant, lquant, zeta)*; na_u; isa; (iaorb, iphorb).

Graph construction follows read_siesta.py:120-155: supercell column blocks ->
per-(atom_i, atom_j, image) dense blocks; the cell shift comes from
round((pos_i - pos_j + xij) @ invcell).
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..models.basis import get_basis_set

AU2ANG = 0.5291772490000065
RY2HA = 13.60580 / 27.21138506


class FortranFile:
    """Minimal sequential-unformatted reader (4-byte record markers)."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        self.ofs = 0

    def record(self) -> bytes:
        (n,) = struct.unpack_from("<i", self.buf, self.ofs)
        self.ofs += 4
        data = self.buf[self.ofs : self.ofs + n]
        self.ofs += n
        (n2,) = struct.unpack_from("<i", self.buf, self.ofs)
        self.ofs += 4
        assert n == n2, "corrupt Fortran record"
        return data

    def ints(self) -> np.ndarray:
        return np.frombuffer(self.record(), dtype="<i4").astype(np.int64)

    def floats(self) -> np.ndarray:
        return np.frombuffer(self.record(), dtype="<f4").astype(np.float64)

    def doubles(self) -> np.ndarray:
        return np.frombuffer(self.record(), dtype="<f8")


@dataclass
class HSXData:
    no_u: int
    no_s: int
    nspin: int
    indxuo: np.ndarray       # (no_s,) 1-based unit-cell orbital of each SC orbital
    numh: np.ndarray
    listh: np.ndarray        # (nh,) 1-based supercell column indices
    hamilt: np.ndarray       # (nspin, nh) Hartree
    sover: np.ndarray        # (nh,)
    xij: np.ndarray          # (nh, 3) Bohr
    species_no: np.ndarray   # orbitals per species
    isa: np.ndarray          # (na_u,) species of each atom (1-based)
    iaorb: np.ndarray        # (no_u,) atom of each orbital (1-based)
    zval: np.ndarray


def _native_tool(name: str) -> Optional[str]:
    import os

    exe = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "build", name)
    return exe if os.path.exists(exe) else None


def parse_hsx_native(path: str) -> HSXData:
    """Parse .HSX via the native C++ reader (native/hsx_reader.cpp).

    Same HSXData contract as :func:`parse_hsx`; the native tool replaces the
    reference's Fortran dumper layer (hsx_m.f90 + dump.f90).  Cross-checked
    field-for-field against the numpy parser in tests.
    """
    import json
    import subprocess

    exe = _native_tool("hsx_reader")
    if exe is None:
        raise FileNotFoundError("native hsx_reader not built (see native/)")
    d = json.loads(subprocess.run([exe, path], check=True,
                                  capture_output=True).stdout)
    return HSXData(
        no_u=d["no_u"], no_s=d["no_s"], nspin=d["nspin"],
        indxuo=np.asarray(d["indxuo"], np.int64),
        numh=np.asarray(d["numh"], np.int64),
        listh=np.asarray(d["listh"], np.int64),
        hamilt=np.asarray(d["hamilt"], np.float64),
        sover=np.asarray(d["sover"], np.float64),
        xij=np.asarray(d["xij"], np.float64).reshape(-1, 3),
        species_no=np.asarray(d["species_no"], np.int64),
        isa=np.asarray(d["isa"], np.int64),
        iaorb=np.asarray(d["iaorb"], np.int64),
        zval=np.asarray(d["zval"], np.float64),
    )


def parse_hsx(path: str) -> HSXData:
    f = FortranFile(path)
    no_u, no_s, nspin, nh = f.ints()
    gamma = bool(np.frombuffer(f.record(), dtype="<i4")[0])
    if not gamma:
        indxuo = f.ints()
    else:
        indxuo = np.arange(1, no_u + 1)
    numh = f.ints()
    listhptr = np.concatenate([[0], np.cumsum(numh[:-1])])
    listh = np.zeros(nh, np.int64)
    for io in range(no_u):
        listh[listhptr[io] : listhptr[io] + numh[io]] = f.ints()
    hamilt = np.zeros((nspin, nh))
    for s in range(nspin):
        for io in range(no_u):
            hamilt[s, listhptr[io] : listhptr[io] + numh[io]] = f.floats()
    sover = np.zeros(nh)
    for io in range(no_u):
        sover[listhptr[io] : listhptr[io] + numh[io]] = f.floats()
    f.record()  # qtot, temp
    xij = np.zeros((nh, 3))
    for io in range(no_u):
        row = f.floats().reshape(-1, 3)
        xij[listhptr[io] : listhptr[io] + numh[io]] = row
    nspecies = int(f.ints()[0])
    rec = f.record()  # (label char*20, zval f8?, no int) * nspecies — mixed record
    # layout per write: label(20 bytes), zval(real sp? dp?), no(int)
    # hsx_m writes label, zval, no in one record: char*20 + real(dp) + int
    item = len(rec) // nspecies
    species_no = np.zeros(nspecies, np.int64)
    zval = np.zeros(nspecies)
    for s in range(nspecies):
        chunk = rec[s * item : (s + 1) * item]
        # trailing 4 bytes: int no; preceding 8: double zval
        species_no[s] = struct.unpack_from("<i", chunk, item - 4)[0]
        zval[s] = struct.unpack_from("<d", chunk, item - 12)[0]
    for s in range(nspecies):
        for _ in range(int(species_no[s])):
            f.record()  # nquant, lquant, zeta
    na_u = int(f.ints()[0])
    isa = f.ints()
    pair = f.ints()  # iaorb, iphorb interleaved
    iaorb = pair.reshape(no_u, 2)[:, 0] if len(pair) == 2 * no_u else pair
    return HSXData(no_u=int(no_u), no_s=int(no_s), nspin=int(nspin),
                   indxuo=indxuo, numh=numh, listh=listh,
                   hamilt=hamilt * RY2HA, sover=sover, xij=xij,
                   species_no=species_no, isa=isa, iaorb=iaorb, zval=zval)


@dataclass
class FDFStructure:
    z: np.ndarray
    pos: np.ndarray     # Bohr
    cell: np.ndarray    # Bohr


def parse_fdf(path: str) -> FDFStructure:
    """FDF structure parser (reference read_siesta.py:59-118)."""
    with open(path) as f:
        content = f.read()
    num = r"-?\d+\.?\d*"
    wht = r"\s+"
    lattconst, lattunit = re.compile(
        r"LatticeConstant\s+" + f"({num})" + r"\s+([A-Za-z]+)", re.I
    ).findall(content)[0]
    latt = re.compile(
        r"%block LatticeVectors.*" + f"{wht}({num})" * 9 +
        r"\s+%endblock LatticeVectors", re.I | re.S
    ).findall(content)[0]
    cell = np.array([float(v) for v in latt]).reshape(3, 3) * float(lattconst)
    if lattunit.lower() == "ang":
        cell /= AU2ANG
    unit = re.compile(r"AtomicCoordinatesFormat\s+([A-Za-z]+)", re.I).findall(content)[0]
    sblk = re.compile(
        r"%block ChemicalSpeciesLabel(.+)%endblock ChemicalSpeciesLabel", re.S
    ).findall(content)[0]
    species = {}
    for idx, iz, _name in re.compile(r"\s+(\d+)\s+(\d+)\s+(\w+)").findall(sblk):
        species[int(idx)] = int(iz)
    cblk = re.compile(
        r"%block AtomicCoordinatesAndAtomicSpecies(.+)"
        r"%endblock AtomicCoordinatesAndAtomicSpecies", re.S
    ).findall(content)[0]
    pos, z = [], []
    for c in re.compile(f"{wht}({num}){wht}({num}){wht}({num}){wht}(\\d+)").findall(cblk):
        pos.append([float(c[0]), float(c[1]), float(c[2])])
        z.append(species[int(c[3])])
    pos = np.asarray(pos)
    if unit.lower().startswith("ang"):
        pos /= AU2ANG
    return FDFStructure(z=np.asarray(z, np.int64), pos=pos, cell=cell)


def hsx_to_graph(hsx: HSXData, fdf: FDFStructure) -> Dict[str, np.ndarray]:
    """CSR supercell matrix -> per-edge dense blocks + onsite blocks."""
    na = len(fdf.z)
    invcell = np.linalg.inv(fdf.cell)
    # per-atom orbital counts / offsets in the unit cell
    no = np.array([(hsx.iaorb == a + 1).sum() for a in range(na)], np.int64)
    indo = np.concatenate([[0], np.cumsum(no[:-1])])
    listhptr = np.concatenate([[0], np.cumsum(hsx.numh[:-1])])

    # dense (no_u, no_s) for simplicity (host-side prep; fine at these sizes)
    H = np.zeros((hsx.nspin, hsx.no_u, hsx.no_s))
    S = np.zeros((hsx.no_u, hsx.no_s))
    X = np.zeros((hsx.no_u, hsx.no_s, 3))
    for io in range(hsx.no_u):
        cols = hsx.listh[listhptr[io] : listhptr[io] + hsx.numh[io]] - 1
        H[:, io, cols] = hsx.hamilt[:, listhptr[io] : listhptr[io] + hsx.numh[io]]
        S[io, cols] = hsx.sover[listhptr[io] : listhptr[io] + hsx.numh[io]]
        X[io, cols] = hsx.xij[listhptr[io] : listhptr[io] + hsx.numh[io]]

    src, dst, cshift, nshift = [], [], [], []
    Hon = [[] for _ in range(hsx.nspin)]
    Hoff = [[] for _ in range(hsx.nspin)]
    Son, Soff = [], []
    for ia in range(na):
        rows = slice(indo[ia], indo[ia] + no[ia])
        for jsuper in range(0, hsx.no_s, hsx.no_u):
            for ja in range(na):
                cols = slice(jsuper + indo[ja], jsuper + indo[ja] + no[ja])
                blk_S = S[rows, cols]
                blk_H = H[:, rows, cols]
                if not (np.any(blk_S) or np.any(blk_H)):
                    continue
                nz = np.nonzero(np.any(blk_H, axis=0) | (blk_S != 0))
                xij = X[rows, cols][nz[0][0], nz[1][0]]
                cs = np.round((fdf.pos[ia] - fdf.pos[ja] + xij) @ invcell).astype(int)
                if ia == ja and not cs.any():
                    for s in range(hsx.nspin):
                        Hon[s].append(blk_H[s])
                    Son.append(blk_S)
                else:
                    for s in range(hsx.nspin):
                        Hoff[s].append(blk_H[s])
                    Soff.append(blk_S)
                    src.append(ia)
                    dst.append(ja)
                    cshift.append(cs)
                    nshift.append(cs @ fdf.cell)
    return {
        "edge_src": np.asarray(src, np.int64),
        "edge_dst": np.asarray(dst, np.int64),
        "cell_shift": np.asarray(cshift, np.int64).reshape(-1, 3),
        "nbr_shift": np.asarray(nshift, float).reshape(-1, 3),
        "Hon": Hon, "Hoff": Hoff, "Son": Son, "Soff": Soff,
        "num_orbs": no,
    }


def pack_crystal_siesta(graph: Dict, fdf: FDFStructure, nao_max: int,
                        spin: int = 0) -> Dict[str, np.ndarray]:
    """Dense nao_max^2 rows for the SIESTA basis (graph_data_gen_siesta)."""
    from .openmx import _dense_rows, inverse_edges

    basis = get_basis_set("siesta", nao_max)
    z = fdf.z
    src, dst = graph["edge_src"], graph["edge_dst"]
    inv = inverse_edges(src, dst, graph["cell_shift"])
    out = {
        "z": z, "pos": fdf.pos, "cell": fdf.cell[None],
        "edge_index": np.stack([src, dst]),
        "inv_edge_idx": inv,
        "cell_shift": graph["cell_shift"],
        "nbr_shift": graph["nbr_shift"],
        "Son": _dense_rows(graph["Son"], z, z, basis, nao_max),
        "Soff": _dense_rows(graph["Soff"], z[src], z[dst], basis, nao_max),
    }
    if len(graph["Hon"]) == 1:
        out["Hon"] = _dense_rows(graph["Hon"][0], z, z, basis, nao_max)
        out["Hoff"] = _dense_rows(graph["Hoff"][0], z[src], z[dst], basis, nao_max)
    else:  # collinear: stack spin channels
        out["Hon"] = np.stack([
            _dense_rows(graph["Hon"][s], z, z, basis, nao_max)
            for s in range(len(graph["Hon"]))], axis=1)
        out["Hoff"] = np.stack([
            _dense_rows(graph["Hoff"][s], z[src], z[dst], basis, nao_max)
            for s in range(len(graph["Hoff"]))], axis=1)
    return out
