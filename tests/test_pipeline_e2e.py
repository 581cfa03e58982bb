"""End-to-end refinement pipeline through the CLI surface:
project gallery -> match experimental particles -> reconstruct -> FSC.
This is the tier-2 'pipeline via preruns' pattern of the reference test
harness (SURVEY.md §4) exercised on a synthetic phantom."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program


def make_phantom(n=32):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - n // 2, y - n // 2, x - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for cz, cy, cx, s, a in [(0, 0, 0, 2.5, 1.0), (4, -3, 3, 1.5, 0.8),
                             (-3, 3, -2, 1.8, 0.6), (2, 4, -4, 1.2, 0.9),
                             (-5, -4, 1, 1.0, 1.1), (5, 2, -1, 1.1, 0.7)]:
        vol += a * np.exp(-((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2)
                          / (2 * s ** 2))
    return vol


def run_prog(name, args):
    prog = get_program(name)
    rc = prog.run_with_args(args)
    assert rc == 0, f"{name} failed"
    return prog


@pytest.mark.slow
def test_full_refinement_cycle(tmp_path):
    n = 32
    vol = make_phantom(n)
    fn_vol = str(tmp_path / "phantom.vol")
    save_image(fn_vol, vol)

    # 1. gallery
    root = str(tmp_path / "gallery")
    run_prog("angular_project_library",
             f"-i {fn_vol} -o {root} --sampling_rate 15 --sym c1")
    md_g = MetaData(root + ".doc")
    assert md_g.size() > 50

    # 2. "experimental" particles: gallery projections with random in-plane
    # pose + noise, written as a stack + metadata
    from xmipp3_tpu.ops.geo import apply_alignment_2d
    gallery = Image.read_stack(root + ".stk")
    rng = np.random.default_rng(0)
    n_parts = 40
    pick = rng.integers(0, len(gallery), n_parts)
    psi = rng.uniform(-180, 180, n_parts).astype(np.float32)
    sx = rng.uniform(-3, 3, n_parts).astype(np.float32)
    sy = rng.uniform(-3, 3, n_parts).astype(np.float32)
    parts = np.asarray(apply_alignment_2d(gallery[pick], psi, sx, sy))
    parts = parts + 0.05 * parts.std() * rng.standard_normal(parts.shape
                                                             ).astype(np.float32)
    fn_parts = str(tmp_path / "particles.mrcs")
    save_image(fn_parts, parts)
    md_p = MetaData.fromRows([
        {"image": f"{i + 1:06d}@{fn_parts}", "itemId": i + 1, "enabled": 1}
        for i in range(n_parts)])
    fn_md = str(tmp_path / "particles.xmd")
    md_p.write(fn_md)

    # 3. projection matching
    fn_assign = str(tmp_path / "assign.xmd")
    run_prog("angular_projection_matching",
             f"-i {fn_md} -o {fn_assign} --ref {root} --max_shift 5")
    md_a = MetaData(fn_assign)
    assert md_a.size() == n_parts
    assert (md_a.getColumn("maxCC") > 0.85).mean() > 0.9

    # 4. reconstruct from assignments
    fn_rec = str(tmp_path / "rec.vol")
    run_prog("reconstruct_fourier", f"-i {fn_assign} -o {fn_rec} --batch 64")
    rec = np.squeeze(Image(fn_rec).data)
    assert rec.shape == vol.shape

    # 5. FSC against ground truth
    fn_fsc = str(tmp_path / "fsc.xmd")
    prog = run_prog("resolution_fsc",
                    f"--ref {fn_vol} -i {fn_rec} -o {fn_fsc} -s 1.0")
    md_f = MetaData(fn_fsc)
    fsc = md_f.getColumn("resolutionFRC")
    # agreement over the low/mid frequency range
    assert fsc[: len(fsc) // 3].mean() > 0.8, fsc[: len(fsc) // 3]
    c = np.corrcoef(rec.ravel(), vol.ravel())[0, 1]
    assert c > 0.75, f"volume corr {c}"


@pytest.mark.slow
def test_round2_refinement_cycle(tmp_path):
    """Round-2 feature pipeline: neighbor-restricted matching with top-N
    output -> Kaiser-Bessel reconstruction with FSC halves -> half-map
    FSC -> continuous gray-aware refinement."""
    n = 32
    vol = make_phantom(n)
    fn_vol = str(tmp_path / "phantom.vol")
    save_image(fn_vol, vol)
    root = str(tmp_path / "gal")
    run_prog("angular_project_library",
             f"-i {fn_vol} -o {root} --sampling_rate 15 --sym c1")

    from xmipp3_tpu.ops.geo import apply_alignment_2d
    gallery = Image.read_stack(root + ".stk")
    rng = np.random.default_rng(1)
    n_parts = 36
    pick = rng.integers(0, len(gallery), n_parts)
    psi = rng.uniform(-180, 180, n_parts).astype(np.float32)
    parts = np.array(apply_alignment_2d(
        gallery[pick], psi, np.zeros(n_parts, np.float32),
        np.zeros(n_parts, np.float32)))
    parts += 0.05 * parts.std() * rng.standard_normal(parts.shape) \
        .astype(np.float32)
    fn_parts = str(tmp_path / "parts.mrcs")
    save_image(fn_parts, parts)
    md_g = MetaData(root + ".doc")
    g_rows = list(md_g.iterRows())
    MetaData.fromRows([
        {"image": f"{i + 1:06d}@{fn_parts}", "itemId": i + 1,
         "angleRot": float(g_rows[pick[i]]["angleRot"]),
         "angleTilt": float(g_rows[pick[i]]["angleTilt"])}
        for i in range(n_parts)]).write(str(tmp_path / "parts.xmd"))

    # neighbor lists around the (prior) angles, consumed by matching
    run_prog("angular_project_library",
             f"-i {fn_vol} -o {root} --sampling_rate 15 --sym c1 "
             f"--compute_neighbors --angular_distance 35 "
             f"--experimental_images {tmp_path}/parts.xmd")
    fn_assign = str(tmp_path / "assign.xmd")
    run_prog("angular_projection_matching",
             f"-i {tmp_path}/parts.xmd -o {fn_assign} --ref {root} "
             f"--max_shift 3 --neighbors {root}_neighbors.xmd "
             f"--number_orientations 2")
    md_a = MetaData(fn_assign)
    assert md_a.size() == 2 * n_parts          # top-2 rows per image
    rows_a = list(md_a.iterRows())
    best = rows_a[0::2]

    # KB reconstruction with FSC halves from the best orientations
    MetaData.fromRows([dict(r) for r in best]).write(
        str(tmp_path / "best.xmd"))
    fsc_root = str(tmp_path / "halves")
    run_prog("reconstruct_fourier",
             f"-i {tmp_path}/best.xmd -o {tmp_path}/rec.vol --batch 64 "
             f"--interp kb --prepare_fsc {fsc_root}")
    h1 = np.squeeze(Image(fsc_root + "_1_recons.vol").data)
    h2 = np.squeeze(Image(fsc_root + "_2_recons.vol").data)
    fn_fsc = str(tmp_path / "fsc.xmd")
    run_prog("resolution_fsc",
             f"--ref {fsc_root}_1_recons.vol -i {fsc_root}_2_recons.vol "
             f"-o {fn_fsc} -s 1.0")
    fsc = MetaData(fn_fsc).getColumn("resolutionFRC")
    assert fsc[: len(fsc) // 3].mean() > 0.7

    rec = np.squeeze(Image(str(tmp_path / "rec.vol")).data)
    c = np.corrcoef(rec.ravel(), vol.ravel())[0, 1]
    assert c > 0.75

    # continuous refinement with gray optimization improves the model fit
    run_prog("angular_continuous_assign2",
             f"-i {tmp_path}/best.xmd -o {tmp_path}/cont.xmd "
             f"--ref {fn_vol} --optimizeAngles --optimizeShift "
             f"--optimizeGray --steps 40")
    md_c = MetaData(str(tmp_path / "cont.xmd"))
    assert md_c.size() == n_parts
    assert md_c.containsLabel("continuousA")
