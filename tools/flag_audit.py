"""Flag-surface audit: reference CLI grammar vs this framework's.

The reference's addParamsLine grammar is the de-facto Scipion API
(SURVEY.md §5.6). This script extracts the option tokens declared by the
reference sources for EVERY reference program (hand-curated source lists
for the top Scipion-facing programs; auto-discovered via the program
main.cpp's #include graph for the rest), diffs them against the flags our
registered programs declare, and rewrites docs/FLAG_AUDIT.md. Intentional
divergences are annotated in DIVERGENCES / GLOBAL_DIVERGENCES below so
the audit stays zero-unexplained.

Run: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/flag_audit.py
"""
from __future__ import annotations

import glob
import os
import re
import sys

REF = "/root/reference/src/xmipp/libraries"
REFAPP = "/root/reference/src/xmipp/applications/programs"

# our program name -> reference sources holding its defineParams grammar
PROGRAMS = {
    "reconstruct_fourier": ["reconstruction/reconstruct_fourier.cpp"],
    "angular_projection_matching":
        ["reconstruction/angular_projection_matching.cpp"],
    "angular_project_library":
        ["reconstruction/angular_project_library.cpp"],
    "ml_align2d": ["reconstruction/ml2d.cpp",
                   "reconstruction/ml_align2d.cpp"],
    "mlf_align2d": ["reconstruction/ml2d.cpp",
                    "reconstruction/mlf_align2d.cpp"],
    # micrograph: own grammar + ProgCTFBasicParams::defineBasicParams +
    # ProgCTFEstimateFromPSD::defineBasicParams == CTFDescription::
    # defineParams (data/ctf.cpp) — NOT the psd program's own --psd input
    "ctf_estimate_from_micrograph":
        ["reconstruction/ctf_estimate_from_micrograph.cpp",
         "reconstruction/ctf_estimate_from_psd_base.cpp",
         "data/ctf.cpp"],
    "ctf_estimate_from_psd":
        ["reconstruction/ctf_estimate_from_psd_base.cpp",
         "reconstruction/ctf_estimate_from_psd.cpp",
         "data/ctf.cpp"],
    "movie_alignment_correlation":
        ["reconstruction/movie_alignment_correlation_base.cpp"],
    "transform_filter": ["data/filters.cpp",
                         "reconstruction/fourier_filter.cpp",
                         "reconstruction/denoise.cpp"],
    "transform_geometry": ["data/transform_geometry.cpp"],
    "transform_normalize": ["data/normalize.cpp"],
    "transform_mask": ["data/mask.cpp"],
    "transform_window": ["reconstruction/transform_window.cpp"],
    "classify_CL2D": ["parallel/mpi_classify_CL2D.cpp"],
    "classify_analyze_cluster": ["classification/analyze_cluster.cpp"],
    "reconstruct_art": ["reconstruction/basic_art.cpp",
                        "reconstruction/reconstruct_art.cpp"],
    "reconstruct_significant":
        ["reconstruction/reconstruct_significant.cpp"],
    "angular_continuous_assign2":
        ["reconstruction/angular_continuous_assign2.cpp"],
    "angular_discrete_assign":
        ["reconstruction/angular_discrete_assign.cpp"],
    "volume_align": ["reconstruction/volume_align_prog.cpp"],
    "resolution_fsc": ["reconstruction/resolution_fsc.cpp"],
    "image_resize": ["data/image_resize.cpp"],
}

# shared ml2d.cpp grammar divergences (serial-CPU economies and
# deprecated/debug knobs with no TPU analog)
_ML2D_SHARED = {
    "--thr": "host threads are XLA's concern on TPU",
    "--fast": "the full (class, psi, trial) integration is a single einsum "
              "dispatch; there is no slow/fast split (-C still applies the "
              "significance truncation)",
    "--zero_offsets": "kick-start detail of the reference's fast path; "
                      "offsets are always searched in one dispatch",
    "--save_memA": "deprecated in the reference; no host-memory staging",
    "--save_memB": "deprecated in the reference; no host-memory staging",
    "--scratch": "no scratch-disk staging; data lives in HBM",
    "--debug": "use -v verbosity levels",
    "--no_sigma_trick": "numerical trick of the serial implementation; the "
                        "einsum E-step is exact",
    "--trymindiff_factor": "restart heuristic of the serial implementation",
    "--load": "host prefetch knob",
}

# file-wide-scan artifacts: flags declared in a scanned source but NOT part
# of this program's grammar in the reference (e.g. a sibling program's entry
# point living in the same file)
EXCLUDES = {
    "ctf_estimate_from_micrograph": {
        # ProgCTFBasicParams::defineParams (the standalone psd program's
        # own input flag); the micrograph program only calls
        # defineBasicParams (ctf_estimate_from_micrograph.cpp:329-331)
        "--psd",
    },
    "volume_center": {
        # ProgMask's own grammar lives in the scanned data/mask.cpp
        # (mask.cpp:1816-1819); volume_center only calls
        # Mask::defineParams (--mask)
        "--count_above", "--count_below", "--create_mask", "--substitute",
        # volume_center restricts masks to INT_MASK; the reference rejects
        # blob_* mask types there ("continuous masks are not allowed",
        # mask.cpp:945-946), so the blob -m/-a params are unreachable
        "-m", "-a",
    },
}

# flags we consciously do NOT implement (reason shown in the audit table)
DIVERGENCES = {
    "reconstruct_fourier": {
        # --useCTF/--minCTF/--phaseFlipped/--sampling are REAL flags now
        # (r5): per-frequency 1/CTF inversion inside the gridding loop,
        # ops/reconstruct.py ctf_gridding_multipliers,
        # tests/test_reconstruct_ctf.py
        "--fast": "the Pallas gridding path is already the fast path; "
                  "there is no slow/fast split",
        "--thr": "host threads are XLA's concern on TPU",
        "--fftOnGPU": "all FFTs run on the device by construction",
        "--interpolator": "superseded by --interp (kb/tri/tri+kb/nn)",
        "--bufferSize": "device batching is --batch",
    },
    "movie_alignment_correlation": {
        "--simpleCroppingDMA": "DMA cropping is an EER/IO detail of the "
                               "GPU build",
        "--storage": "FFT plan storage file: XLA caches compiles instead",
    },
    "angular_projection_matching": {
        "--mem": "device batching is --batch; XLA manages HBM",
        "--pad": "the polar ring-FFT correlator has no Fourier-padding "
                 "stage; gallery quality is set by angular_project_library",
    },
    "reconstruct_art": {
        "-g": "voxel-grid design: the XLA projector reconstructs on the "
              "pixel grid; BCC/FCC basis grids are serial ray-tracer "
              "machinery",
        "--grid_type": "voxel-grid design (see -g)",
        "--save_basis": "no basis volume exists in the voxel-grid design",
        "--save_at_each_step": "interactive step-debugger of the serial "
                               "implementation (press-a-key loop); use "
                               "--save_intermediate/--show_error",
        "--print_system_matrix": "debug printout of the basis equation "
                                 "system; no basis system is formed",
        "--manual_order": "interactive prompt for the next projection; "
                          "non-interactive runtime (use --sort_last/"
                          "--random_sort/--no_sort)",
        "--unmatched": "the batched projector/adjoint pair is matched by "
                       "construction; unmatched footprints are a basis-"
                       "grid economy",
        "--ray_length": "the batched projector integrates full rays; "
                        "ray-length truncation is a serial ray-tracer "
                        "economy (use -R for the interest sphere)",
    },
    # GPU/accel twins of reconstruct_fourier share its engine and its
    # divergence reasons (cuda_reconstruct_fourier.cpp wraps the same
    # grammar + GPU knobs)
    "cuda_reconstruct_fourier": {
        "--fast": "the Pallas gridding path is already the fast path",
        "--thr": "host threads are XLA's concern on TPU",
        "--fftOnGPU": "all FFTs run on the device by construction",
        "--interpolator": "superseded by --interp (kb/tri/tri+kb/nn)",
        "--bufferSize": "device batching is --batch",
    },
    "reconstruct_fourier_accel": {
        "--fast": "the Pallas gridding path is already the fast path",
        "--thr": "host threads are XLA's concern on TPU",
        "--interpolator": "superseded by --interp (kb/tri/tri+kb/nn)",
        "--bufferSize": "device batching is --batch",
    },
    "cuda_angular_continuous_assign2": {
        "--skipThreshold": "per-thread projection-cache reuse knob of the "
                           "serial GPU loop (cuda_fourier_projection.cpp:255 "
                           "reuses the last projection when the pose moved "
                           "less than the threshold); the TPU engine "
                           "computes every projection in one batched "
                           "gather, so there is no cache to skip into",
    },
    "ml_align2d": dict(_ML2D_SHARED),
    "mlf_align2d": dict(
        _ML2D_SHARED,
        **{
            "--ctf_affected_refs": "references are built from "
            "Wiener-corrected images, so CTF-affected references do not "
            "arise",
            "--fix_high": "the ring noise weights are re-estimated and "
            "renormalized every iteration; there is no separate high-freq "
            "freeze",
            "--reduce_snr": "a constant SNR scale folds into sigma^2 under "
            "the renormalized ring weights (mathematically a no-op here)",
            "--var_psi": "the full psi grid is searched every iteration in "
            "one dispatch; adaptive coarsening is a serial-CPU economy",
            "--var_trans": "the full translation grid is searched every "
            "iteration in one dispatch",
        }),
}


# flags with no analog anywhere in a static-sharded XLA runtime; applied to
# every program (only counted when the reference program actually has them)
GLOBAL_DIVERGENCES = {
    "--mpi_job_size": "dynamic master-worker job sizing; static mesh "
                      "sharding (--mesh) replaces the job queue",
    "--mem": "host/GPU memory budget knob; XLA manages HBM",
    "--memory": "host/GPU memory budget knob; XLA manages HBM",
    "--in_core": "host memory staging knob; data lives in HBM",
    "--storage": "FFT plan storage file; XLA caches compiles instead",
    "-gpusPerNode": "GPU topology knob; the device mesh is --mesh",
    "-threadsPerGPU": "GPU topology knob; the device mesh is --mesh",
    "--mpiCommand": "command used to spawn MPI children; no subprocess "
                    "farm exists (the mesh is in-process)",
    "--Nsimultaneous": "simultaneous-MPI-process knob; device batching "
                       "is --batch",
    "--nThreads": "host threads: standard --thr alias",
    "--chunk_angular_distance": "master-worker job-locality chunking; "
                                "static sharding has no job queue",
    "--useCPU": "CPU-fallback selector of the GPU build; device choice "
                "is --device/--mesh",
}

# reference program dirs with no auditable CLI grammar of their own or
# covered by a differently-named endpoint on our side
AUTO_SKIP = {
    "CMakeLists.txt",
    "xmipp_sync_data",       # data-download utility (network)
    "mpi_write_test",        # MPI filesystem self-test; no algorithm
    "mpi_run",               # job farm: ours is the threaded host runner
}

# reference program name -> our endpoint name when they differ
NAME_MAP = {
    "template_threads": "template",
}


def discover_sources(prog: str):
    """Reference sources holding `prog`'s grammar: the program dir's
    main.cpp + every library source reachable from its #includes (one
    level — the reference declares defineParams in the program class's
    own .cpp/.h)."""
    d = os.path.join(REFAPP, prog)
    mains = glob.glob(d + "/*.cpp")
    srcs = list(mains)
    for m in mains:
        src = open(m, errors="replace").read()
        for inc in re.findall(r'#include\s+[<"]([^">]+)[">]', src):
            stem = os.path.splitext(os.path.basename(inc))[0]
            srcs.extend(_LIB_INDEX.get(stem, []))
    return sorted(set(srcs))


_LIB_INDEX: dict[str, list[str]] = {}
for _p in (glob.glob(REF + "/**/*.cpp", recursive=True)
           + glob.glob(REF + "/**/*.h", recursive=True)):
    _LIB_INDEX.setdefault(
        os.path.splitext(os.path.basename(_p))[0], []).append(_p)


def extract_reference_flags(files):
    flags = set()
    pat = re.compile(r'"\s*\[?\s*(--?[A-Za-z_][A-Za-z0-9_]*)')
    alias_pat = re.compile(r'alias\s+((?:--?[A-Za-z_][A-Za-z0-9_]*\s*)+);')
    # legacy manual parsing (pre-XmippProgram): getParameter(argc, argv,
    # "-flag"[, default]) / checkParameter(argc, argv, "-flag") — e.g.
    # angular_commonline.cpp:343-350, ml_align2d.cpp:157 (--scratch),
    # mlf_align2d.cpp:110 (--restart). Without this, such programs report
    # "0 reference flags" and pass the audit vacuously (VERDICT r4 #4).
    legacy_pat = re.compile(
        r'(?:getParameter|checkParameter)\s*\(\s*argc[^;"]*?'
        r'"(-{1,2}[A-Za-z_][A-Za-z0-9_]*)"')
    for rel in files:
        path = rel if os.path.isabs(rel) else os.path.join(REF, rel)
        if not os.path.exists(path):
            continue
        src = open(path, errors="replace").read()
        # drop //-commented lines (e.g. the commented-out --penalization in
        # angular_continuous_assign2.cpp:139)
        src = "\n".join(l for l in src.splitlines()
                        if not l.lstrip().startswith("//"))
        # addParamsLine / defaultComments blocks
        for m in re.finditer(r'addParamsLine\s*\(([^;]*?)\)\s*;', src,
                             re.S):
            body = m.group(1)
            fm = pat.search(body)
            if fm:
                flags.add(fm.group(1))
            for am in alias_pat.finditer(body):
                for tok in am.group(1).split():
                    flags.add(tok)
        for m in legacy_pat.finditer(src):
            flags.add(m.group(1))
    return flags


def our_flags(name):
    from xmipp3_tpu.programs import get_program
    try:
        prog = get_program(name)
    except Exception:
        return None
    if not getattr(prog, "_grammar", None) or not prog._grammar.params:
        try:
            prog.defineParams()
        except Exception:
            pass
    g = prog._grammar
    flags = set()
    for cname, p in g.params.items():
        flags.add(cname)
        flags.update(getattr(p, "aliases", []))
    return flags


def all_programs():
    """Full audit map: hand-curated source lists for the top programs,
    auto-discovered #include graphs for the rest of the 209."""
    full = dict(PROGRAMS)
    for prog in sorted(os.listdir(REFAPP)):
        if prog in AUTO_SKIP or prog in full:
            continue
        if not os.path.isdir(os.path.join(REFAPP, prog)):
            continue
        ours_name = NAME_MAP.get(prog, prog)
        if ours_name in full:
            continue
        full[ours_name] = discover_sources(prog)
    return full


def main():
    rows = []
    total_missing = 0
    for name, files in sorted(all_programs().items()):
        ref = extract_reference_flags(files) - EXCLUDES.get(name, set())
        ours = our_flags(name)
        if ours is None:
            total_missing += 1
            rows.append((name, len(ref), 0, ["<endpoint-not-registered>"],
                         [], [], {}))
            continue
        div = dict(GLOBAL_DIVERGENCES)
        div.update(DIVERGENCES.get(name, {}))
        div = {f: why for f, why in div.items() if f in ref}
        missing = sorted(f for f in ref if f not in ours and f not in div)
        explained = sorted(f for f in ref if f in div)
        extra = sorted(f for f in ours - ref
                       if f not in ("--mesh", "--dist_coordinator",
                                    "--dist_nprocs", "--dist_procid",
                                    "--trace", "-v", "--verbose", "--help",
                                    "--batch", "--interp", "--gui", "-h"))
        total_missing += len(missing)
        rows.append((name, len(ref), len(ref) - len(missing)
                     - len(explained), missing, explained, extra,
                     {f: w for f, w in DIVERGENCES.get(name, {}).items()
                      if f in ref}))

    out = ["# Flag-surface audit (reference addParamsLine vs this CLI)",
           "",
           "Generated by tools/flag_audit.py. 'covered' counts reference",
           "flags our grammar accepts (same canonical name or alias);",
           "'divergent' are intentionally not implemented with the reason",
           "shown; anything in 'missing' is an open gap.",
           "",
           "| program | ref flags | covered | divergent | missing |",
           "|---|---|---|---|---|"]
    for name, nref, ncov, missing, explained, extra, div in rows:
        out.append(f"| {name} | {nref} | {ncov} | {len(explained)} | "
                   f"{' '.join('`%s`' % m for m in missing) or '-'} |")
    out.append("")
    out.append("## Global divergences (host/GPU-runtime knobs with no "
               "static-mesh analog)")
    out.append("")
    for f, why in sorted(GLOBAL_DIVERGENCES.items()):
        out.append(f"- `{f}`: {why}")
    out.append("")
    out.append("## Intentional divergences")
    out.append("")
    for name, *_rest, div in rows:
        if div:
            out.append(f"### {name}")
            for f, why in sorted(div.items()):
                out.append(f"- `{f}`: {why}")
            out.append("")
    out.append("## Framework-only additions (not counted against parity)")
    out.append("")
    out.append("`--mesh`, `--dist_*` (device-mesh/multi-host parallelism), "
               "`--trace` (xprof), `--interp`, `--batch` (device "
               "batching).")
    out.append("")
    doc = "\n".join(out) + "\n"
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "FLAG_AUDIT.md")
    with open(dst, "w") as f:
        f.write(doc)
    print(f"wrote {dst}; total unexplained missing flags: {total_missing}")
    for name, nref, ncov, missing, *_ in rows:
        if missing:
            print(f"  {name}: missing {missing}")
    return 0 if total_missing == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
