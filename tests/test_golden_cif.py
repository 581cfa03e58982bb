"""Transliteration of the reference CIF gtest
(applications/tests/function_tests/test_cif_main.cpp): read an mmCIF
atom_site loop, assert the exact RichAtom field values of 1cbs's first
atom, and roundtrip through the CIF writer. The libcifpp example file is
not shipped in this checkout, so the fixture embeds the gtest's own
quoted row (test_cif_main.cpp:87 'ATOM 1 N N . PRO A 1 1 ? 16.979
13.301 44.555 1.00 30.05 ? 1 PRO A N 1') in standard PDBx column order,
gzipped like the original (1cbs.cif.gz)."""
import gzip

from xmipp3_tpu.core.pdb import (read_rich_cif, rich_to_model,
                                 write_rich_cif)

CIF_BODY = """data_1CBS
#
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.label_asym_id
_atom_site.label_entity_id
_atom_site.label_seq_id
_atom_site.pdbx_PDB_ins_code
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.occupancy
_atom_site.B_iso_or_equiv
_atom_site.pdbx_formal_charge
_atom_site.auth_seq_id
_atom_site.auth_comp_id
_atom_site.auth_asym_id
_atom_site.auth_atom_id
_atom_site.pdbx_PDB_model_num
ATOM 1 N N . PRO A 1 1 ? 16.979 13.301 44.555 1.00 30.05 ? 1 PRO A N 1
ATOM 2 C CA . PRO A 1 1 ? 18.150 13.525 43.680 1.00 28.82 ? 1 PRO A CA 1
HETATM 3 O O . HOH B 2 . ? 10.000 11.000 12.000 0.50 15.00 ? 201 HOH B O 1
#
"""


def _assert_first_atom(a):
    """compareFirstAtom (test_cif_main.cpp:35-73), field for field."""
    assert a.serial == 1
    assert a.name == "N"
    assert a.name[0] == "N"
    assert a.alt_id == ""
    assert a.resname == "PRO"
    assert a.altloc == "A"          # label_asym_id in the reference
    assert a.resseq == 1
    assert a.seq_id == 1
    assert a.icode == ""
    assert abs(a.x - 16.979) < 1e-4
    assert abs(a.y - 13.301) < 1e-4
    assert abs(a.z - 44.555) < 1e-4
    assert abs(a.occupancy - 1.00) < 1e-4
    assert abs(a.bfactor - 30.05) < 1e-4
    assert a.charge == ""
    assert a.auth_seq_id == 1
    assert a.auth_comp_id == "PRO"
    assert a.auth_asym_id == "A"
    assert a.auth_atom_id == "N"
    assert a.pdb_num == 1


def test_read_file_gz(tmp_path):
    # CIFTest.readFile — reference reads 1cbs.cif.gz (gzipped)
    fn = str(tmp_path / "1cbs.cif.gz")
    with gzip.open(fn, "wt") as f:
        f.write(CIF_BODY)
    atoms = read_rich_cif(fn)
    assert len(atoms) == 3
    _assert_first_atom(atoms[0])
    assert atoms[2].record == "HETATM"
    assert atoms[2].resseq == 0     # '.' null token
    assert atoms[2].occupancy == 0.5


def test_write_file_roundtrip(tmp_path):
    # CIFTest.writeFile — write then re-read, first atom identical
    src = str(tmp_path / "1cbs.cif")
    with open(src, "w") as f:
        f.write(CIF_BODY)
    atoms = read_rich_cif(src)
    out = str(tmp_path / "1cbs_test.cif")
    write_rich_cif(out, atoms)
    back = read_rich_cif(out)
    assert len(back) == len(atoms)
    _assert_first_atom(back[0])
    assert back[2].record == "HETATM"
    assert abs(back[2].bfactor - 15.0) < 1e-6


def test_rich_to_model_bridge(tmp_path):
    import numpy as np
    fn = str(tmp_path / "m.cif")
    with open(fn, "w") as f:
        f.write(CIF_BODY)
    m = rich_to_model(read_rich_cif(fn))
    assert len(m) == 3
    assert np.allclose(m.coords[0], [16.979, 13.301, 44.555])
    assert m.elements[0] == "N"
