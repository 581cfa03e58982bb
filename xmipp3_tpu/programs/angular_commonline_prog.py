"""xmipp_angular_commonline — ab-initio angular assignment of a small image
set (class averages) by common lines.

Contract: reference angular_commonline.{h,cpp} (legacy): images' central
sinogram lines must agree pairwise along the common line of their projection
planes; the reference optimizes Euler angles with a differential-evolution
solver over grouped images. TPU-native redesign: every image's full set of
central-line profiles is precomputed as one polar resampling of its 2D FFT
(projection-slice theorem — a sinogram without any real-space rotations);
candidate orientations are scored in one batched gather + einsum over
(candidates x pairs x frequency), and the assignment is greedy-then-cyclic
exhaustive search on an even angular grid, which is deterministic and
MXU-shaped instead of an evolutionary loop.
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import load_image_rows
from xmipp3_tpu.core.program import XmippProgram


def _line_ffts(imgs, n_angles=512, radius_min=2):
    """Central Fourier lines L(angle, k) of each image.

    Returns complex (B, A, K): for angle bin a, L[b, a, :] is F_b sampled
    along the ray at theta_a, k = radius_min..radius_max (projection-slice:
    this is the 1D FFT of the sinogram line at that angle)."""
    import jax.numpy as jnp
    from xmipp3_tpu.ops.polar import cartesian_to_polar
    imgs = np.asarray(imgs, np.float32)
    B, H, W = imgs.shape
    # ifftshift first: with the phase origin at the image center the FFT is
    # smooth and safe to interpolate (otherwise centered content rides a
    # (-1)^(x+y) checkerboard phase that bilinear sampling destroys)
    F = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(imgs, axes=(-2, -1))),
                        axes=(-2, -1))
    re = np.ascontiguousarray(F.real.astype(np.float32))
    im = np.ascontiguousarray(F.imag.astype(np.float32))
    pr = np.asarray(cartesian_to_polar(jnp.asarray(re), radius_min,
                                       n_angles=n_angles))
    pi = np.asarray(cartesian_to_polar(jnp.asarray(im), radius_min,
                                       n_angles=n_angles))
    L = (pr + 1j * pi).transpose(0, 2, 1)          # (B, A, K)
    # whiten per frequency (divide by the rms over angles): projection
    # spectra are low-frequency dominated, and without this every pair of
    # lines correlates near 1 (measured discrimination gap 0.03 plain vs
    # 0.85 whitened on a synthetic set)
    L = L / np.maximum(np.sqrt((np.abs(L) ** 2).mean(axis=1, keepdims=True)),
                       1e-12)
    # then normalize each line to unit power so correlations are comparable
    norm = np.sqrt((np.abs(L) ** 2).sum(axis=-1, keepdims=True))
    return (L / np.maximum(norm, 1e-12)).astype(np.complex64)


def _euler_rows(rot, tilt, psi):
    """Euler ZYZ rows (passive, core.geometry convention): returns (..., 3, 3)
    with rows = image x/y axes and projection direction."""
    from xmipp3_tpu.core.geometry import euler_matrix
    return np.asarray(euler_matrix(np.asarray(rot, np.float32),
                                   np.asarray(tilt, np.float32),
                                   np.asarray(psi, np.float32)))


def commonline_score(cand_mats, other_mats, L_cand, L_others, max_shift=1):
    """Score candidate orientations of one image against assigned others.

    cand_mats (C,3,3), other_mats (J,3,3); L_cand (A,K) lines of the image
    being placed, L_others (J,A,K). Returns (C,) mean common-line correlation
    (pairs with near-parallel planes are skipped)."""
    import jax
    import jax.numpy as jnp
    A = L_cand.shape[0]
    ni = cand_mats[:, 2, :]                        # (C,3)
    nj = other_mats[:, 2, :]                       # (J,3)
    c = jnp.cross(ni[:, None, :], nj[None, :, :])  # (C,J,3)
    cn = jnp.linalg.norm(c, axis=-1)
    ok = cn > 1e-3
    cu = c / jnp.maximum(cn, 1e-12)[..., None]
    # in-plane angles of the common line in each image's basis
    ai = jnp.arctan2(jnp.einsum("cjk,ck->cj", cu, cand_mats[:, 1, :]),
                     jnp.einsum("cjk,ck->cj", cu, cand_mats[:, 0, :]))
    aj = jnp.arctan2(jnp.einsum("cjk,jk->cj", cu, other_mats[:, 1, :]),
                     jnp.einsum("cjk,jk->cj", cu, other_mats[:, 0, :]))
    bi = (jnp.round(ai / (2 * jnp.pi) * A).astype(jnp.int32)) % A
    bj = (jnp.round(aj / (2 * jnp.pi) * A).astype(jnp.int32)) % A
    Li = L_cand[bi]                                # (C,J,K)
    Lj = L_others[jnp.arange(L_others.shape[0])[None, :], bj]  # (C,J,K)
    cross = Li * jnp.conj(Lj)                      # (C,J,K)
    if max_shift > 0:
        # small 1D shift tolerance along the line via inverse transform
        n = 4 * L_cand.shape[1]
        curve = jnp.fft.irfft(jnp.pad(cross, ((0, 0), (0, 0), (1, 0))),
                              n=n, axis=-1) * n
        shifts = jnp.arange(-max_shift, max_shift + 1) % n
        corr = jnp.max(curve[..., shifts], axis=-1)
    else:
        corr = jnp.real(cross.sum(axis=-1))
    corr = jnp.where(ok, corr, jnp.nan)
    s = jnp.nanmean(corr, axis=1)
    # candidates whose plane is parallel to every reference score NaN; make
    # them lose cleanly (jnp.argmax would otherwise select a NaN entry)
    return jnp.where(jnp.isnan(s), -jnp.inf, s)


class ProgAngularCommonline(XmippProgram):
    name = "xmipp_angular_commonline"

    def defineParams(self):
        self.addUsageLine("Ab-initio angular assignment of a small image set "
                          "by common lines.")
        self.addParamsLine("   -i <selfile>      : Input images")
        self.addParamsLine("   --oang <docfile>  : Output angular assignment")
        self.addParamsLine("     alias -oang;")
        self.addParamsLine("  [--NGen <g=50000>] : Optimization budget (grid density scales with it)")
        self.addParamsLine("     alias -NGen;")
        self.addParamsLine("  [--NGroup <N=10>]  : Refinement sweeps")
        self.addParamsLine("     alias -NGroup;")
        self.addParamsLine("  [--tryInitial]     : Only evaluate the metadata's current angles")
        self.addParamsLine("     alias -tryInitial;")
        self.addParamsLine("  [--sym <s=c1>]     : Symmetry")
        self.addParamsLine("     alias -sym;")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.core.sampling import compute_sampling_points
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        B = imgs.shape[0]
        L = jnp.asarray(_line_ffts(imgs))
        A = L.shape[1]

        if self.checkParam("--tryInitial"):
            rot = np.array([float(r.get("angleRot", 0)) for r in rows])
            tilt = np.array([float(r.get("angleTilt", 0)) for r in rows])
            psi = np.array([float(r.get("anglePsi", 0)) for r in rows])
            mats = _euler_rows(rot, tilt, psi)
            score = self._solution_energy(mats, L)
            self._write(rows, rot, tilt, psi, np.full(B, score))
            if self.verbose:
                print(f"initial solution energy: {score:.4f}")
            return

        # candidate grid: even direction sampling x in-plane psi
        ngen = self.getIntParam("--NGen")
        step = 15.0 if ngen < 20000 else 10.0 if ngen < 100000 else 7.5
        dirs = compute_sampling_points(step, tilt_min=0.0, tilt_max=180.0)
        psis = np.arange(0.0, 360.0, step, dtype=np.float32)
        cand = np.array([(r, t, p) for (r, t) in dirs[:, :2]
                         for p in psis], np.float32)
        cand_mats = jnp.asarray(_euler_rows(cand[:, 0], cand[:, 1],
                                            cand[:, 2]))

        # multi-start greedy (the DE solver's restart role): insertion order
        # biases the greedy solution, so run several shuffled orders and
        # keep the best-energy one before refining
        n_sweeps = min(self.getIntParam("--NGroup"), 10)
        n_starts = 3 if ngen >= 20000 else 1
        rng = np.random.default_rng(0)
        best_assigned = None
        best_energy = -np.inf
        for start in range(n_starts):
            assigned = np.zeros((B, 3), np.float32)  # image 0 pinned
            order = list(range(1, B))
            if start > 0:
                rng.shuffle(order)
            placed = [0]
            for i in order:
                mats_o = jnp.asarray(_euler_rows(assigned[placed, 0],
                                                 assigned[placed, 1],
                                                 assigned[placed, 2]))
                s = commonline_score(cand_mats, mats_o, L[i],
                                     L[jnp.asarray(placed)])
                assigned[i] = cand[int(jnp.argmax(s))]
                placed.append(i)

            # cyclic refinement sweeps re-placing each image vs all others
            for _ in range(n_sweeps):
                changed = False
                for i in range(1, B):
                    others = [j for j in range(B) if j != i]
                    mats_o = jnp.asarray(_euler_rows(assigned[others, 0],
                                                     assigned[others, 1],
                                                     assigned[others, 2]))
                    s = commonline_score(cand_mats, mats_o, L[i],
                                         L[jnp.asarray(others)])
                    best = cand[int(jnp.argmax(s))]
                    if not np.allclose(best, assigned[i]):
                        assigned[i] = best
                        changed = True
                if not changed:
                    break
            energy = self._solution_energy(
                _euler_rows(assigned[:, 0], assigned[:, 1], assigned[:, 2]),
                L)
            if energy > best_energy:
                best_energy = energy
                best_assigned = assigned.copy()
        assigned = best_assigned

        # local refinement: fine grid around each image's current solution
        fine = step / 5.0
        d = np.arange(-2, 3, dtype=np.float32) * fine
        local = np.stack(np.meshgrid(d, d, d, indexing="ij"),
                         axis=-1).reshape(-1, 3)
        for i in range(1, B):
            others = [j for j in range(B) if j != i]
            mats_o = jnp.asarray(_euler_rows(assigned[others, 0],
                                             assigned[others, 1],
                                             assigned[others, 2]))
            cands = assigned[i][None, :] + local
            cm = jnp.asarray(_euler_rows(cands[:, 0], cands[:, 1],
                                         cands[:, 2]))
            s = commonline_score(cm, mats_o, L[i], L[jnp.asarray(others)])
            assigned[i] = cands[int(jnp.argmax(s))]

        mats = _euler_rows(assigned[:, 0], assigned[:, 1], assigned[:, 2])
        energy = self._solution_energy(mats, L)
        self._write(rows, assigned[:, 0], assigned[:, 1], assigned[:, 2],
                    np.full(B, energy))
        if self.verbose:
            print(f"final solution energy: {energy:.4f}")

    def _solution_energy(self, mats, L):
        import jax.numpy as jnp
        B = mats.shape[0]
        tot, n = 0.0, 0
        for i in range(B):
            others = [j for j in range(B) if j != i]
            s = commonline_score(jnp.asarray(mats[i:i + 1]),
                                 jnp.asarray(mats[others]), L[i],
                                 L[jnp.asarray(others)])
            v = float(np.asarray(s)[0])
            if np.isfinite(v):
                tot += v
                n += 1
        return tot / max(n, 1)

    def _write(self, rows, rot, tilt, psi, cost):
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["angleRot"] = float(rot[i])
            d["angleTilt"] = float(tilt[i])
            d["anglePsi"] = float(psi[i])
            d["cost"] = float(cost[i])
            out.append(d)
        MetaData.fromRows(out).write(self.getParam("--oang"))
