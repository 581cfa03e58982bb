"""PDB/CIF atomic model support.

Rebuilds the capability of the reference data/pdb.{h,cpp} (atom I/O, form
factors, rasterization; uses cifpp there — here a self-contained parser for
the fixed-column PDB format and a minimal mmCIF atom_site reader).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# approximate atomic numbers for common cryo-EM elements (electron counts
# drive scattering strength at this level of modeling)
ATOMIC_NUMBER = {"H": 1, "C": 6, "N": 7, "O": 8, "P": 15, "S": 16,
                 "FE": 26, "MG": 12, "ZN": 30, "CA": 20, "K": 19, "NA": 11,
                 "CL": 17, "MN": 25, "CU": 29}


@dataclass
class AtomicModel:
    coords: np.ndarray          # (N,3) Å, (x,y,z)
    elements: list
    bfactors: np.ndarray
    occupancies: np.ndarray

    def __len__(self):
        return len(self.coords)

    @property
    def weights(self) -> np.ndarray:
        return np.array([ATOMIC_NUMBER.get(e.upper(), 6)
                         for e in self.elements], np.float32)

    def centered(self) -> "AtomicModel":
        c = self.coords.mean(axis=0)
        return AtomicModel(self.coords - c, self.elements, self.bfactors,
                           self.occupancies)


def read_pdb(path: str) -> AtomicModel:
    coords, elements, bf, occ = [], [], [], []
    if path.endswith(".cif") or path.endswith(".mmcif"):
        return _read_cif(path)
    with open(path) as f:
        for line in f:
            if line.startswith(("ATOM  ", "HETATM")):
                try:
                    x = float(line[30:38])
                    y = float(line[38:46])
                    z = float(line[46:54])
                except ValueError:
                    continue
                coords.append((x, y, z))
                el = line[76:78].strip() or line[12:14].strip()[:1]
                elements.append(el or "C")
                try:
                    occ.append(float(line[54:60]))
                except ValueError:
                    occ.append(1.0)
                try:
                    bf.append(float(line[60:66]))
                except ValueError:
                    bf.append(0.0)
    return AtomicModel(np.array(coords, np.float64), elements,
                       np.array(bf, np.float32), np.array(occ, np.float32))


def _read_cif(path: str) -> AtomicModel:
    """Minimal mmCIF atom_site loop reader."""
    cols = []
    rows = []
    in_loop = False
    with open(path) as f:
        for line in f:
            s = line.strip()
            if s.startswith("loop_"):
                in_loop = True
                cols = []
                continue
            if in_loop and s.startswith("_atom_site."):
                cols.append(s.split(".")[1].strip())
                continue
            if in_loop and cols:
                if s.startswith(("_", "loop_", "#")) or not s:
                    if rows:
                        break
                    in_loop = bool(cols)
                    continue
                toks = s.split()
                if len(toks) >= len(cols):
                    rows.append(toks[: len(cols)])
    if not rows:
        raise ValueError(f"no atom_site records in {path}")
    ix = {c: i for i, c in enumerate(cols)}
    def col(name, cast=str, default=None):
        if name not in ix:
            return [default] * len(rows)
        return [cast(r[ix[name]]) for r in rows]
    xs = col("Cartn_x", float, 0.0)
    ys = col("Cartn_y", float, 0.0)
    zs = col("Cartn_z", float, 0.0)
    els = col("type_symbol", str, "C")
    occ = col("occupancy", float, 1.0)
    bf = col("B_iso_or_equiv", float, 0.0)
    return AtomicModel(np.stack([xs, ys, zs], axis=1).astype(np.float64),
                       els, np.array(bf, np.float32),
                       np.array(occ, np.float32))


def write_pdb(path: str, model: AtomicModel) -> None:
    with open(path, "w") as f:
        for i in range(len(model)):
            x, y, z = model.coords[i]
            el = model.elements[i]
            f.write(f"ATOM  {i + 1:5d}  {el:<3s} ALA A{(i % 9999) + 1:4d}    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}{model.occupancies[i]:6.2f}"
                    f"{model.bfactors[i]:6.2f}          {el:>2s}\n")
        f.write("END\n")


def rasterize(model: AtomicModel, size: int, sampling: float,
              sigma_a: float = 1.0, center: bool = True) -> np.ndarray:
    """Atoms -> voxel volume: gaussian splat weighted by atomic number
    (reference volume_from_pdb behavior at low resolution)."""
    m = model.centered() if center else model
    vol = np.zeros((size, size, size), np.float32)
    half = size // 2
    vox = m.coords / sampling + half            # (N,3) voxel coords (x,y,z)
    w = m.weights * m.occupancies
    sig = sigma_a / sampling
    r = max(int(np.ceil(3 * sig)), 1)
    offs = np.arange(-r, r + 1)
    dz, dy, dx = np.meshgrid(offs, offs, offs, indexing="ij")
    kernel_d2 = (dz ** 2 + dy ** 2 + dx ** 2).astype(np.float32)
    for i in range(len(m)):
        x, y, z = vox[i]
        ix, iy, iz = int(round(x)), int(round(y)), int(round(z))
        if not (r <= ix < size - r and r <= iy < size - r and
                r <= iz < size - r):
            continue
        fx, fy, fz = x - ix, y - iy, z - iz
        d2 = ((dz - fz) ** 2 + (dy - fy) ** 2 + (dx - fx) ** 2)
        vol[iz - r:iz + r + 1, iy - r:iy + r + 1, ix - r:ix + r + 1] += \
            w[i] * np.exp(-d2 / (2 * sig * sig)).astype(np.float32)
    return vol
