"""Analytic phantom engine (test-data generator).

Rebuilds the reference's phantom description language (data/phantom.h:40-120:
'#Phantom Xdim Ydim Zdim Background [scale]' header + feature lines
sph/blo/gau/cyl/dcy/cub/ell/con with +/= behavior) and voxelization.
Features are evaluated vectorized on the voxel grid; oriented features use
the same ZYZ Euler convention as the rest of the framework.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from xmipp3_tpu.core.geometry import euler_matrix


@dataclass
class Feature:
    ftype: str
    add_assign: str
    density: float
    center: np.ndarray
    params: list[float] = field(default_factory=list)

    def _local_coords(self, X, Y, Z, rot=0.0, tilt=0.0, psi=0.0):
        """Coordinates relative to center, rotated into the feature frame."""
        x = X - self.center[0]
        y = Y - self.center[1]
        z = Z - self.center[2]
        if rot or tilt or psi:
            A = np.asarray(euler_matrix(rot, tilt, psi), np.float64)
            xl = A[0, 0] * x + A[0, 1] * y + A[0, 2] * z
            yl = A[1, 0] * x + A[1, 1] * y + A[1, 2] * z
            zl = A[2, 0] * x + A[2, 1] * y + A[2, 2] * z
            return xl, yl, zl
        return x, y, z

    def evaluate(self, X, Y, Z) -> np.ndarray:
        t, p = self.ftype, self.params
        if t == "sph":
            x, y, z = self._local_coords(X, Y, Z)
            return (x * x + y * y + z * z <= p[0] ** 2).astype(np.float32)
        if t == "gau":
            x, y, z = self._local_coords(X, Y, Z)
            s2 = p[0] ** 2
            return np.exp(-(x * x + y * y + z * z) / (2 * s2)).astype(np.float32)
        if t == "blo":
            # Kaiser-Bessel blob (radius, alpha, order m) — evaluate the
            # standard kb profile
            x, y, z = self._local_coords(X, Y, Z)
            r = np.sqrt(x * x + y * y + z * z)
            a, alpha, m = p[0], p[1], int(p[2]) if len(p) > 2 else 2
            from scipy.special import iv
            w = np.zeros_like(r)
            inside = r <= a
            q = np.sqrt(np.clip(1 - (r[inside] / a) ** 2, 0, 1))
            w[inside] = (q ** m) * iv(m, alpha * q) / max(iv(m, alpha), 1e-12)
            return w.astype(np.float32)
        if t == "cyl":
            rx, ry, h = p[0], p[1], p[2]
            rot, tilt, psi = (p[3:6] + [0, 0, 0])[:3] if len(p) > 3 else (0, 0, 0)
            x, y, z = self._local_coords(X, Y, Z, rot, tilt, psi)
            return (((x / rx) ** 2 + (y / ry) ** 2 <= 1) &
                    (np.abs(z) <= h / 2)).astype(np.float32)
        if t == "dcy":
            r0, h, sep = p[0], p[1], p[2]
            rot, tilt, psi = (p[3:6] + [0, 0, 0])[:3] if len(p) > 3 else (0, 0, 0)
            x, y, z = self._local_coords(X, Y, Z, rot, tilt, psi)
            inxy = x * x + y * y <= r0 ** 2
            up = np.abs(z - (sep / 2 + h / 2)) <= h / 2
            dn = np.abs(z + (sep / 2 + h / 2)) <= h / 2
            return (inxy & (up | dn)).astype(np.float32)
        if t == "cub":
            dx, dy, dz = p[0], p[1], p[2]
            rot, tilt, psi = (p[3:6] + [0, 0, 0])[:3] if len(p) > 3 else (0, 0, 0)
            x, y, z = self._local_coords(X, Y, Z, rot, tilt, psi)
            return ((np.abs(x) <= dx / 2) & (np.abs(y) <= dy / 2) &
                    (np.abs(z) <= dz / 2)).astype(np.float32)
        if t == "ell":
            rx, ry, rz = p[0], p[1], p[2]
            rot, tilt, psi = (p[3:6] + [0, 0, 0])[:3] if len(p) > 3 else (0, 0, 0)
            x, y, z = self._local_coords(X, Y, Z, rot, tilt, psi)
            return (((x / rx) ** 2 + (y / ry) ** 2 + (z / rz) ** 2) <= 1
                    ).astype(np.float32)
        if t == "con":
            r0, h = p[0], p[1]
            rot, tilt, psi = (p[2:5] + [0, 0, 0])[:3] if len(p) > 2 else (0, 0, 0)
            x, y, z = self._local_coords(X, Y, Z, rot, tilt, psi)
            # apex up: radius shrinks linearly from base (z=-h/2) to 0 (z=h/2)
            frac = np.clip((h / 2 - z) / h, 0, 1)
            return ((x * x + y * y <= (r0 * frac) ** 2) &
                    (np.abs(z) <= h / 2)).astype(np.float32)
        raise ValueError(f"unknown feature type {t}")


@dataclass
class Phantom:
    dims: tuple = (64, 64, 64)
    background: float = 0.0
    scale: float = 1.0
    features: list = field(default_factory=list)

    @classmethod
    def read(cls, path: str) -> "Phantom":
        from xmipp3_tpu.core.errors import ErrCode, XmippError
        ph = cls()
        with open(path) as f:
            lines = [l.strip() for l in f
                     if l.strip() and not l.strip().startswith("#")]
        if not lines:
            raise XmippError(ErrCode.IO_SIZE, f"empty phantom file {path}")
        try:
            hdr = lines[0].split()
            ph.dims = (int(hdr[0]), int(hdr[1]), int(hdr[2]))
            ph.background = float(hdr[3])
            ph.scale = float(hdr[4]) if len(hdr) > 4 else 1.0
            for line in lines[1:]:
                toks = line.split()
                ph.features.append(Feature(
                    toks[0], toks[1], float(toks[2]),
                    np.array([float(toks[3]), float(toks[4]), float(toks[5])]),
                    [float(t) for t in toks[6:]]))
        except (ValueError, IndexError) as e:
            raise XmippError(ErrCode.PARAM_INCORRECT,
                             f"bad phantom description {path}: {e}") from e
        return ph

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            f.write("# Phantom description file, (generated with phantom "
                    "help)\n")
            f.write("# General Volume Parameters:\n")
            f.write("#      Xdim      Ydim      Zdim   Background_Density "
                    "Scale\n")
            x, y, z = self.dims
            f.write(f"       {x} {y} {z} {self.background} {self.scale}\n")
            f.write("# Feature Parameters:\n")
            for ft in self.features:
                pstr = " ".join(f"{v:g}" for v in ft.params)
                f.write(f"{ft.ftype} {ft.add_assign} {ft.density:g} "
                        f"{ft.center[0]:g} {ft.center[1]:g} "
                        f"{ft.center[2]:g} {pstr}\n")

    def voxelize(self) -> np.ndarray:
        nx, ny, nz = self.dims
        # R3 coords: x in [-nx//2, ...], array indexed [z, y, x]
        z = (np.arange(nz) - nz // 2)[:, None, None].astype(np.float64)
        y = (np.arange(ny) - ny // 2)[None, :, None].astype(np.float64)
        x = (np.arange(nx) - nx // 2)[None, None, :].astype(np.float64)
        if self.scale != 1.0:
            x, y, z = x / self.scale, y / self.scale, z / self.scale
        X = np.broadcast_to(x, (nz, ny, nx))
        Y = np.broadcast_to(y, (nz, ny, nx))
        Z = np.broadcast_to(z, (nz, ny, nx))
        vol = np.full((nz, ny, nx), self.background, np.float32)
        for ft in self.features:
            m = ft.evaluate(X, Y, Z)
            if ft.add_assign == "+":
                vol += ft.density * m
            else:
                vol = np.where(m > 0, ft.density * m, vol)
        return vol
