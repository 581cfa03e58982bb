"""Even angular sampling of the projection sphere with symmetry pruning.

Rebuilds the reference Sampling surface (data/sampling.h:46,
computeSamplingPoints :143, removeRedundantPoints :176, computeNeighbors :203)
used by angular_project_library and projection matching.

Sampling scheme: tilt rings every `rate` degrees; within a ring, rot step =
rate / sin(tilt) (equal arc length), the same construction the reference uses.
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.geometry import euler_matrix
from xmipp3_tpu.core.sym import SymList


def compute_sampling_points(rate_deg: float, tilt_min: float = 0.0,
                            tilt_max: float = 180.0) -> np.ndarray:
    """Quasi-even (rot, tilt) grid; returns (N, 2) degrees."""
    out = []
    n_tilt = max(int(round(180.0 / rate_deg)), 1)
    for i in range(n_tilt + 1):
        tilt = 180.0 * i / n_tilt
        if tilt < tilt_min - 1e-6 or tilt > tilt_max + 1e-6:
            continue
        st = np.sin(np.deg2rad(tilt))
        if st < 1e-6:
            out.append((0.0, tilt))
            continue
        n_rot = max(int(round(360.0 * st / rate_deg)), 1)
        for j in range(n_rot):
            out.append((360.0 * j / n_rot - 180.0, tilt))
    return np.array(out, np.float64)


def directions_from_angles(angles: np.ndarray) -> np.ndarray:
    """(rot, tilt) -> unit direction vectors (the rotated z axis, A[2])."""
    rot, tilt = angles[:, 0], angles[:, 1]
    A = np.asarray(euler_matrix(rot, tilt, np.zeros_like(rot)), np.float64)
    return A[:, 2, :]


def remove_redundant_points(angles: np.ndarray, sym: SymList) -> np.ndarray:
    """Keep one representative per symmetry orbit (asymmetric unit)."""
    if len(sym) == 1:
        return angles
    dirs = directions_from_angles(angles)
    mats = sym.sym_matrices().astype(np.float64)          # (S,3,3)
    # orbit of each direction: d @ M.T for each symmetry M
    orbit = np.einsum("sij,nj->nsi", mats, dirs)          # (N,S,3)
    # canonical representative = lexicographically largest (z, y, x) tuple
    keys = np.round(orbit[..., [2, 1, 0]], 5)             # (N,S,3)
    flat = keys.reshape(len(angles), len(mats), 3)
    # a point is kept if its own key is the orbit maximum
    own = np.round(dirs[:, [2, 1, 0]], 5)
    best = np.array([max(map(tuple, flat[i])) for i in range(len(angles))])
    keep = np.all(np.isclose(own, best, atol=2e-5), axis=1)
    # dedupe identical orbit representatives (points mapped onto each other)
    seen = set()
    out = []
    for i in np.where(keep)[0]:
        k = tuple(best[i])
        if k not in seen:
            seen.add(k)
            out.append(angles[i])
    return np.array(out)


def angular_distance_deg(d1: np.ndarray, d2: np.ndarray) -> np.ndarray:
    """Pairwise angular distance (degrees) between direction sets."""
    cosang = np.clip(d1 @ d2.T, -1.0, 1.0)
    return np.degrees(np.arccos(cosang))


def compute_neighbors(angles: np.ndarray, ref_angles: np.ndarray,
                      max_dist_deg: float, sym: SymList | None = None):
    """For each row of `angles`, indices of ref_angles within max_dist_deg
    (considering symmetry if given). Returns list of index arrays."""
    d_exp = directions_from_angles(angles)
    d_ref = directions_from_angles(ref_angles)
    if sym is not None and len(sym) > 1:
        mats = sym.sym_matrices().astype(np.float64)
        d_exp_orbit = np.einsum("sij,nj->nsi", mats, d_exp)  # (N,S,3)
        cos = np.einsum("nsi,mi->nsm", d_exp_orbit, d_ref)
        cos = cos.max(axis=1)
    else:
        cos = d_exp @ d_ref.T
    ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    return [np.where(ang[i] <= max_dist_deg)[0] for i in range(len(angles))]


class Sampling:
    """High-level even sampling of the asymmetric unit."""

    def __init__(self, rate_deg: float, sym: str = "c1",
                 tilt_range=(0.0, 180.0)):
        self.rate_deg = rate_deg
        self.sym = SymList(sym)
        pts = compute_sampling_points(rate_deg, *tilt_range)
        self.angles = remove_redundant_points(pts, self.sym)

    def __len__(self):
        return len(self.angles)

    @property
    def directions(self):
        return directions_from_angles(self.angles)
