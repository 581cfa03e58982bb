"""Script-program equivalents (reference applications/scripts/*, SURVEY §2
L7): metadata_selfile_create, pdb_center/select, coordinates_consensus,
pick_noise, preprocess_mics, volume_consensus, cl2d_clustering, alignPCA_2D,
graph_max_cut, extract_particles, tomo_misalignment_resid_statistics, and
the swiftalign pair. The reference runs these as standalone Python scripts
dispatched into conda envs; here they are ordinary programs on the same
jitted ops the rest of the framework uses.
"""
from __future__ import annotations

import glob as _glob
import os

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import load_image_rows
from xmipp3_tpu.core.program import XmippProgram


class ProgMetadataSelfileCreate(XmippProgram):
    name = "xmipp_metadata_selfile_create"

    def defineParams(self):
        self.addUsageLine("Create a metadata from a file pattern.")
        self.addParamsLine("   -p <pattern>      : Pattern to match")
        self.addParamsLine("     alias --pattern;")
        self.addParamsLine("   -o <metadata>     : Output metadata")
        self.addParamsLine("  [-l <label=image>] : Label for the matches")
        self.addParamsLine("  [-s]               : Expand stacks to n@stack rows")
        self.addParamsLine("     alias --isstack;")

    def run(self):
        label = self.getParam("-l") if self.checkParam("-l") else "image"
        rows = []
        for fn in sorted(_glob.glob(self.getParam("-p"))):
            if self.checkParam("-s"):
                hdr = Image()
                hdr.read(fn, header_only=True)
                n = hdr.header.shape[0]
                rows += [{label: f"{i+1:06d}@{fn}"} for i in range(n)]
            else:
                rows.append({label: fn})
        MetaData.fromRows(rows).write(self.getParam("-o"))
        if self.verbose:
            print(f"{len(rows)} entries")


class ProgPdbCenter(XmippProgram):
    name = "xmipp_pdb_center"

    def defineParams(self):
        self.addUsageLine("Center a PDB at its center of mass (text-level: "
                          "all records preserved).")
        self.addParamsLine("   -i <pdb>  : Input PDB")
        self.addParamsLine("   -o <pdb>  : Output centered PDB")

    def run(self):
        lines = open(self.getParam("-i")).readlines()
        xyz = [(float(l[30:38]), float(l[38:46]), float(l[46:54]))
               for l in lines if l.startswith(("ATOM", "HETATM"))]
        c = np.asarray(xyz).mean(axis=0)
        with open(self.getParam("-o"), "w") as f:
            for l in lines:
                if l.startswith(("ATOM", "HETATM")):
                    x, y, z = (float(l[30:38]) - c[0], float(l[38:46]) - c[1],
                               float(l[46:54]) - c[2])
                    l = l[:30] + f"{x:8.3f}{y:8.3f}{z:8.3f}" + l[54:]
                f.write(l)
        if self.verbose:
            print(f"centered at {-c.round(3)}")


class ProgPdbSelect(XmippProgram):
    name = "xmipp_pdb_select"

    def defineParams(self):
        self.addUsageLine("Select PDB atoms by chain and/or atom name.")
        self.addParamsLine("   -i <pdb>       : Input PDB")
        self.addParamsLine("   -o <pdb>       : Output PDB")
        self.addParamsLine("  [--chain <c=\"\">] : Keep only this chain")
        self.addParamsLine("  [--atom <a=\"\">]  : Keep only this atom name (e.g. CA)")

    def run(self):
        chain = self.getParam("--chain") if self.checkParam("--chain") else ""
        atom = self.getParam("--atom") if self.checkParam("--atom") else ""
        kept = 0
        with open(self.getParam("-o"), "w") as f:
            for l in open(self.getParam("-i")):
                if l.startswith(("ATOM", "HETATM")):
                    if chain and l[21].strip() != chain:
                        continue
                    if atom and l[12:16].strip() != atom:
                        continue
                    kept += 1
                f.write(l)
        if self.verbose:
            print(f"kept {kept} atoms")


def _read_coords_any(fn):
    """Coordinate file -> (N, 2) array; supports .xmd/.pos metadata and
    plain two-column text."""
    try:
        md = MetaData(fn)
        if md.containsLabel("xcoor"):
            return np.stack([np.asarray(md.getColumn("xcoor"), float),
                             np.asarray(md.getColumn("ycoor"), float)], 1)
    except Exception:
        pass
    try:
        a = np.loadtxt(fn, ndmin=2)
        return a[:, :2]
    except Exception:
        return np.zeros((0, 2))


class ProgCoordinatesConsensus(XmippProgram):
    name = "xmipp_coordinates_consensus"

    def defineParams(self):
        self.addUsageLine("Consensus of several picking coordinate sets: "
                          "keep coordinates selected by >= c pickers within "
                          "a distance tolerance.")
        self.addParamsLine("   -i <listFile>    : Text file listing coordinate files (one per line)")
        self.addParamsLine("   -s <particleSize> : Particle size (px)")
        self.addParamsLine("   -c <consensus>   : Votes needed (-1 = all pickers)")
        self.addParamsLine("   -o <outFile>     : Output coordinates (.xmd)")
        self.addParamsLine("  [-d <tol=0.1>]    : Distance tolerance as a size fraction")

    def run(self):
        files = [l.strip() for l in open(self.getParam("-i")) if l.strip()]
        sets = [_read_coords_any(f) for f in files]
        size = self.getDoubleParam("-s")
        votes_needed = self.getIntParam("-c")
        if votes_needed < 0:
            votes_needed = len(sets)
        tol = self.getDoubleParam("-d") * size if self.checkParam("-d") \
            else 0.1 * size
        tol = max(tol, 1.0)
        out = []
        all_pts = np.concatenate([s for s in sets if len(s)]) if sets else \
            np.zeros((0, 2))
        used = np.zeros(len(all_pts), bool)
        owners = np.concatenate([np.full(len(s), i) for i, s in
                                 enumerate(sets) if len(s)]) if len(all_pts) \
            else np.zeros(0, int)
        for i in range(len(all_pts)):
            if used[i]:
                continue
            d = np.linalg.norm(all_pts - all_pts[i], axis=1)
            group = (d <= tol) & ~used
            voters = np.unique(owners[group])
            used |= group
            if len(voters) >= votes_needed:
                c = all_pts[group].mean(axis=0)
                out.append({"xcoor": int(round(c[0])),
                            "ycoor": int(round(c[1])),
                            "enabled": 1, "scoreByVar": float(len(voters))})
        MetaData.fromRows(out).write(self.getParam("-o"))
        if self.verbose:
            print(f"{len(out)} consensus coordinates from {len(sets)} sets")


class ProgPickNoise(XmippProgram):
    name = "xmipp_pick_noise"

    def defineParams(self):
        self.addUsageLine("Pick random coordinates away from existing picks "
                          "(negative examples for training).")
        self.addParamsLine("   -i <mic>        : Micrograph (image file)")
        self.addParamsLine("   -c <coords>     : Already-picked coordinates (.xmd)")
        self.addParamsLine("   -o <outCoords>  : Output noise coordinates (.xmd)")
        self.addParamsLine("   -s <boxSize>    : Box size (px)")
        self.addParamsLine("  [-n <num=-1>]    : How many (-1 = as many as picked)")
        self.addParamsLine("  [--seed <s=0>]   : RNG seed")

    def run(self):
        hdr = Image()
        hdr.read(self.getParam("-i"), header_only=True)
        _, _, H, W = hdr.header.shape
        picked = _read_coords_any(self.getParam("-c"))
        n = self.getIntParam("-n") if self.checkParam("-n") else -1
        if n < 0:
            n = max(len(picked), 1)
        s = self.getIntParam("-s")
        rng = np.random.default_rng(self.getIntParam("--seed")
                                    if self.checkParam("--seed") else 0)
        out = []
        tries = 0
        while len(out) < n and tries < 200 * n:
            tries += 1
            x = rng.integers(s, max(W - s, s + 1))
            y = rng.integers(s, max(H - s, s + 1))
            if len(picked) and np.min(np.linalg.norm(
                    picked - [x, y], axis=1)) < 1.5 * s:
                continue
            out.append({"xcoor": int(x), "ycoor": int(y), "enabled": 1})
        MetaData.fromRows(out).write(self.getParam("-o"))
        if self.verbose:
            print(f"picked {len(out)} noise boxes")


class ProgPreprocessMics(XmippProgram):
    name = "xmipp_preprocess_mics"

    def defineParams(self):
        self.addUsageLine("Preprocess micrographs: downsample, contrast "
                          "inversion, optional CTF phase flipping, "
                          "normalization.")
        self.addParamsLine("   -i <md>          : Metadata with micrograph column (+ optional ctfparam)")
        self.addParamsLine("   -s <sampling>    : Sampling rate (A/px)")
        self.addParamsLine("   -o <outDir>      : Output directory")
        self.addParamsLine("  [-d <down=1>]     : Downsample factor")
        self.addParamsLine("  [--invert_contrast] : Invert contrast")
        self.addParamsLine("  [--phase_flip]    : CTF phase flip (needs ctfparam column)")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.ops.resize import fourier_resize_2d
        md = MetaData(self.getParam("-i"))
        outdir = self.getParam("-o")
        os.makedirs(outdir, exist_ok=True)
        down = self.getDoubleParam("-d") if self.checkParam("-d") else 1.0
        rows = []
        for r in md.iterRows():
            fn = r.get("micrograph", r.get("image"))
            mic = np.squeeze(Image(fn).data).astype(np.float32)
            if self.checkParam("--phase_flip") and r.get("ctfModel"):
                from xmipp3_tpu.ops.ctf import CTFDescription, phase_flip
                ctf = CTFDescription.from_metadata(r["ctfModel"])
                mic = np.asarray(phase_flip(mic[None], ctf))[0]
            if down > 1.0:
                H, W = mic.shape
                mic = np.asarray(fourier_resize_2d(
                    jnp.asarray(mic[None]), int(H / down), int(W / down)))[0]
            if self.checkParam("--invert_contrast"):
                mic = -mic
            mic = (mic - mic.mean()) / max(mic.std(), 1e-8)
            out = os.path.join(outdir, os.path.splitext(
                os.path.basename(fn))[0] + ".mrc")
            save_image(out, mic.astype(np.float32))
            d = dict(r)
            d["micrograph"] = out
            rows.append(d)
        MetaData.fromRows(rows).write(os.path.join(outdir,
                                                   "preprocessed_mics.xmd"))
        if self.verbose:
            print(f"{len(rows)} micrographs -> {outdir}")


class ProgVolumeConsensus(XmippProgram):
    name = "xmipp_volume_consensus"

    def defineParams(self):
        self.addUsageLine("Wavelet consensus of several volumes: per "
                          "coefficient keep the minimum-energy agreement "
                          "(reference volume_consensus.py SWT consensus).")
        self.addParamsLine("   -i <listFile> : Text file listing input volumes")
        self.addParamsLine("   -o <volume>   : Output consensus volume")

    def run(self):
        from xmipp3_tpu.ops.denoise import dwt3, idwt3
        files = [l.strip() for l in open(self.getParam("-i")) if l.strip()]
        vols = [np.squeeze(Image(f).data).astype(np.float32) for f in files]
        shape = vols[0].shape
        for v in vols:
            if v.shape != shape:
                raise ValueError("volumes must share dimensions")
        coeffs = [dwt3(v) for v in vols]
        cons = []
        for band in range(len(coeffs[0])):
            stack = np.stack([np.asarray(c[band]) for c in coeffs])
            # consensus coefficient: the one with smallest magnitude keeps
            # only reproducible signal (noise is suppressed where pickers
            # disagree)
            idx = np.argmin(np.abs(stack), axis=0)
            cons.append(np.take_along_axis(stack, idx[None], axis=0)[0])
        out = np.asarray(idwt3(cons))
        save_image(self.getParam("-o"), out.astype(np.float32))
        if self.verbose:
            print(f"consensus of {len(vols)} volumes -> {self.getParam('-o')}")


class ProgCl2dClustering(XmippProgram):
    name = "xmipp_cl2d_clustering"

    def defineParams(self):
        self.addUsageLine("Group similar 2D class averages: rotation/shift-"
                          "invariant features + k-means with silhouette "
                          "model selection.")
        self.addParamsLine("   -i <stack>  : 2D averages (.mrcs)")
        self.addParamsLine("   -o <outDir> : Output directory")
        self.addParamsLine("  [-m <minC=2>]  : Minimum clusters")
        self.addParamsLine("  [-M <maxC=-1>] : Maximum clusters (-1: N/2)")

    def run(self):
        from xmipp3_tpu.ops.polar import cartesian_to_polar
        import jax.numpy as jnp
        imgs = Image.read_stack(self.getParam("-i"))
        N = len(imgs)
        # rotation-invariant features: |ring FFT| magnitudes
        pol = np.asarray(cartesian_to_polar(jnp.asarray(imgs), 2))
        feat = np.abs(np.fft.rfft(pol, axis=-1))[..., :16].reshape(N, -1)
        feat = (feat - feat.mean(0)) / np.maximum(feat.std(0), 1e-8)
        mn = self.getIntParam("-m") if self.checkParam("-m") else 2
        mx = self.getIntParam("-M") if self.checkParam("-M") else -1
        if mx <= 0:
            mx = max(N // 2, mn)
        best = None
        rng = np.random.default_rng(0)
        for k in range(mn, min(mx, N - 1) + 1):
            labels = _kmeans(feat, k, rng)
            score = _silhouette(feat, labels)
            if best is None or score > best[0]:
                best = (score, k, labels)
        _, k, labels = best
        outdir = self.getParam("-o")
        os.makedirs(outdir, exist_ok=True)
        rows = [{"image": f"{i+1:06d}@{self.getParam('-i')}",
                 "ref": int(labels[i]) + 1} for i in range(N)]
        MetaData.fromRows(rows).write(os.path.join(outdir, "clusters.xmd"))
        avgs = np.stack([imgs[labels == c].mean(axis=0) for c in range(k)])
        save_image(os.path.join(outdir, "cluster_averages.mrcs"),
                   avgs.astype(np.float32))
        self.n_clusters = k
        if self.verbose:
            print(f"{k} clusters (silhouette {best[0]:.3f})")


def _kmeans(X, k, rng, iters=50, restarts=8):
    best = None
    for _ in range(restarts):
        C = X[rng.choice(len(X), k, replace=False)].copy()
        labels = np.zeros(len(X), int)
        for _ in range(iters):
            d = ((X[:, None] - C[None]) ** 2).sum(-1)
            new = d.argmin(1)
            if (new == labels).all():
                break
            labels = new
            for c in range(k):
                if (labels == c).any():
                    C[c] = X[labels == c].mean(0)
        inertia = float(((X - C[labels]) ** 2).sum())
        if best is None or inertia < best[0]:
            best = (inertia, labels)
    return best[1]


def _silhouette(X, labels):
    k = labels.max() + 1
    if k < 2:
        return -1.0
    d = np.sqrt(((X[:, None] - X[None]) ** 2).sum(-1))
    s = []
    for i in range(len(X)):
        same = labels == labels[i]
        a = d[i][same & (np.arange(len(X)) != i)]
        a = a.mean() if len(a) else 0.0
        b = min(d[i][labels == c].mean() for c in range(k)
                if c != labels[i] and (labels == c).any())
        s.append((b - a) / max(a, b, 1e-12))
    return float(np.mean(s))


class ProgAlignPCA2D(XmippProgram):
    name = "xmipp_align_pca_2d"

    def defineParams(self):
        self.addUsageLine("Iteratively align a 2D stack to its average and "
                          "report the PCA eigenimages (alignPCA_2D script).")
        self.addParamsLine("   -i <stack>    : Input images")
        self.addParamsLine("   -o <outDir>   : Output directory")
        self.addParamsLine("  [--iter <n=3>] : Alignment iterations")
        self.addParamsLine("  [--ncomp <c=5>] : PCA components to save")

    def run(self):
        from xmipp3_tpu.ops.align import iterative_align
        imgs = Image.read_stack(self.getParam("-i"))
        it = self.getIntParam("--iter") if self.checkParam("--iter") else 3
        ref = imgs.mean(axis=0)
        aligned = imgs
        for _ in range(it):
            _, _, _, _, aligned = iterative_align(ref, imgs, n_iters=2)
            aligned = np.asarray(aligned)
            ref = aligned.mean(axis=0)
        from xmipp3_tpu.models.dimred import empca
        N = len(imgs)
        X = aligned.reshape(N, -1)
        d = min(self.getIntParam("--ncomp") if self.checkParam("--ncomp")
                else 5, N - 1)
        proj, basis, mu = empca(X, d=d, n_iters=20, return_basis=True)
        outdir = self.getParam("-o")
        os.makedirs(outdir, exist_ok=True)
        save_image(os.path.join(outdir, "aligned.mrcs"),
                   aligned.astype(np.float32))
        save_image(os.path.join(outdir, "average.mrc"),
                   ref.astype(np.float32))
        eig = basis.reshape(d, *imgs.shape[1:])
        save_image(os.path.join(outdir, "eigenimages.mrcs"),
                   eig.astype(np.float32))
        MetaData.fromRows(
            [{"image": f"{i+1:06d}@aligned.mrcs",
              **{f"autoParticles{j+1}": float(proj[i, j]) for j in range(d)}}
             for i in range(N)]).write(os.path.join(outdir, "pca.xmd"))
        if self.verbose:
            print(f"aligned {N} images, {d} eigenimages -> {outdir}")


class ProgGraphMaxCut(XmippProgram):
    name = "xmipp_graph_max_cut"

    def defineParams(self):
        self.addUsageLine("Max-cut bipartition of a similarity graph "
                          "(spectral relaxation + greedy 1-swap refinement).")
        self.addParamsLine("   -i <matrix>  : Weight matrix (text, N x N)")
        self.addParamsLine("   -o <labels>  : Output text labels (0/1 per node)")

    def run(self):
        W = np.loadtxt(self.getParam("-i"), ndmin=2)
        n = len(W)
        W = 0.5 * (W + W.T)
        # spectral: sign of the leading eigenvector of -W (cut maximization)
        wv, V = np.linalg.eigh(-W)
        x = np.sign(V[:, -1])
        x[x == 0] = 1
        # greedy refinement
        improved = True
        while improved:
            improved = False
            for i in range(n):
                gain = x[i] * (W[i] @ x)   # positive gain -> flip increases cut
                if gain > 1e-12:
                    x[i] = -x[i]
                    improved = True
        labels = ((x + 1) // 2).astype(int)
        np.savetxt(self.getParam("-o"), labels, fmt="%d")
        cut = 0.25 * float(np.sum(W) - x @ W @ x)
        self.cut_value = cut
        if self.verbose:
            print(f"cut value {cut:.4f}")


class ProgExtractParticles(XmippProgram):
    name = "xmipp_extract_particles"

    def defineParams(self):
        self.addUsageLine("Extract particle boxes from micrographs listed in "
                          "a metadata with per-mic coordinate files.")
        self.addParamsLine("   -i <md>       : Metadata with micrograph + coordinates columns")
        self.addParamsLine("   -s <boxSize>  : Box size (px)")
        self.addParamsLine("   -o <outDir>   : Output directory")
        self.addParamsLine("  [--invert]     : Invert contrast")
        self.addParamsLine("  [--normalize]  : Zero-mean/unit-std particles")

    def run(self):
        md = MetaData(self.getParam("-i"))
        b = self.getIntParam("-s")
        half = b // 2
        outdir = self.getParam("-o")
        os.makedirs(outdir, exist_ok=True)
        all_rows = []
        for r in md.iterRows():
            fn = r.get("micrograph", r.get("image"))
            mic = np.squeeze(Image(fn).data).astype(np.float32)
            H, W = mic.shape
            coords = _read_coords_any(r["coordinates"] if "coordinates" in r
                                      else r["image"])
            parts, rows = [], []
            for (x, y) in coords.astype(int):
                if half <= x < W - half and half <= y < H - half:
                    p = mic[y - half:y - half + b, x - half:x - half + b].copy()
                    if self.checkParam("--invert"):
                        p = -p
                    if self.checkParam("--normalize"):
                        p = (p - p.mean()) / max(p.std(), 1e-8)
                    parts.append(p)
                    rows.append({"xcoor": int(x), "ycoor": int(y),
                                 "micrograph": fn})
            if not parts:
                continue
            stk = os.path.join(outdir, os.path.splitext(
                os.path.basename(fn))[0] + "_particles.mrcs")
            save_image(stk, np.stack(parts).astype(np.float32))
            for k, rr in enumerate(rows):
                rr["image"] = f"{k + 1:06d}@{stk}"
            all_rows += rows
        MetaData.fromRows(all_rows).write(os.path.join(outdir,
                                                       "particles.xmd"))
        if self.verbose:
            print(f"extracted {len(all_rows)} particles")


class ProgTomoMisalignmentResidStatistics(XmippProgram):
    name = "xmipp_tomo_misalignment_resid_statistics"

    def defineParams(self):
        self.addUsageLine("Aggregate statistics over landmark-residual files "
                          "(per-chain rms, per-image mean, histograms).")
        self.addParamsLine("   -i <listOrFile> : Residual .xmd, or text list of them")
        self.addParamsLine("   -o <md>         : Output statistics metadata")

    def run(self):
        fn = self.getParam("-i")
        files = [fn]
        if not fn.endswith(".xmd"):
            files = [l.strip() for l in open(fn) if l.strip()]
        rows = []
        for f in files:
            md = MetaData(f)
            rx = np.asarray(md.getColumn("shiftX"), float)
            ry = np.asarray(md.getColumn("shiftY"), float)
            r2 = rx ** 2 + ry ** 2
            frames = np.asarray(md.getColumn("frameId"), int)
            for fr in np.unique(frames):
                m = frames == fr
                rows.append({"image": f, "frameId": int(fr),
                             "min": float(np.sqrt(r2[m]).min()),
                             "max": float(np.sqrt(r2[m]).max()),
                             "avg": float(np.sqrt(r2[m]).mean()),
                             "stddev": float(np.sqrt(r2[m]).std())})
        MetaData.fromRows(rows).write(self.getParam("-o"))
        if self.verbose:
            tot = np.mean([r["avg"] for r in rows]) if rows else 0.0
            print(f"{len(rows)} frame statistics; overall mean residual "
                  f"{tot:.2f} px")


class ProgSwiftalignWiener2D(XmippProgram):
    name = "xmipp_swiftalign_wiener_2d"

    def defineParams(self):
        self.addUsageLine("Batched 2D Wiener CTF correction of a particle "
                          "set (swiftalign_wiener_2d role on the jitted "
                          "Wiener op).")
        self.addParamsLine("   -i <md>       : Particles with CTF columns")
        self.addParamsLine("   -o <stack>    : Corrected output stack")
        self.addParamsLine("  [--sampling <s=1>] : Sampling rate (A/px)")
        self.addParamsLine("  [--wc <c=0.1>] : Wiener constant")

    def run(self):
        from xmipp3_tpu.ops.ctf import CTFDescription, wiener_filter_2d
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        wc = self.getDoubleParam("--wc") if self.checkParam("--wc") else 0.1
        Ts = self.getDoubleParam("--sampling") if \
            self.checkParam("--sampling") else 1.0
        out = np.empty_like(imgs)
        for i, r in enumerate(rows):
            ctf = CTFDescription(
                sampling_rate=Ts,
                voltage=float(r.get("ctfVoltage", 300.0)),
                defocusU=float(r.get("ctfDefocusU", 10000.0)),
                defocusV=float(r.get("ctfDefocusV",
                                     r.get("ctfDefocusU", 10000.0))),
                azimuthal_angle=float(r.get("ctfDefocusAngle", 0.0)),
                Cs=float(r.get("ctfSphericalAberration", 2.7)),
                Q0=float(r.get("ctfQ0", 0.07)))
            out[i] = np.asarray(wiener_filter_2d(imgs[i][None], ctf,
                                                 wiener_constant=wc))[0]
        save_image(self.getParam("-o"), out.astype(np.float32))
        for i, r in enumerate(rows):
            r["image"] = f"{i + 1:06d}@{self.getParam('-o')}"
        MetaData.fromRows(rows).write(
            os.path.splitext(self.getParam("-o"))[0] + ".xmd")
        if self.verbose:
            print(f"Wiener-corrected {len(rows)} particles")


class ProgSwiftalignAligned2DClassification(XmippProgram):
    name = "xmipp_swiftalign_aligned_2d_classification"

    def defineParams(self):
        self.addUsageLine("2D classification of pre-aligned particles: "
                          "EM-PCA features + k-means (swiftalign role).")
        self.addParamsLine("   -i <md>      : Aligned particles")
        self.addParamsLine("   -o <outDir>  : Output directory")
        self.addParamsLine("  [--nClasses <k=4>] : Number of classes")

    def run(self):
        from xmipp3_tpu.models.dimred import empca
        from xmipp3_tpu.ops.geo import apply_md_geometry
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        get = lambda k: np.array([float(r.get(k, 0.0)) for r in rows],
                                 np.float32)
        if any("anglePsi" in r for r in rows):
            imgs = np.asarray(apply_md_geometry(
                imgs, get("anglePsi"), get("shiftX"), get("shiftY"),
                np.array([bool(r.get("flip", 0)) for r in rows])))
        k = self.getIntParam("--nClasses") if self.checkParam("--nClasses") \
            else 4
        N = len(imgs)
        feat = empca(imgs.reshape(N, -1), d=min(10, N - 1), n_iters=15)
        labels = _kmeans(feat, min(k, N), np.random.default_rng(0))
        outdir = self.getParam("-o")
        os.makedirs(outdir, exist_ok=True)
        avgs = np.stack([imgs[labels == c].mean(axis=0)
                         for c in range(labels.max() + 1)])
        save_image(os.path.join(outdir, "classes.mrcs"),
                   avgs.astype(np.float32))
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["ref"] = int(labels[i]) + 1
            out.append(d)
        MetaData.fromRows(out).write(os.path.join(outdir, "classes.xmd"))
        if self.verbose:
            print(f"{labels.max() + 1} classes of {N} particles")
