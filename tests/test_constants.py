"""Golden tests for the IMGT grid tables.

When the reference checkout is available (mounted at /root/reference), the
generated tables are compared literally against the reference's hand-written
lists via ast parsing (no reference code is executed). Otherwise structural
invariants embedded here keep the tables honest.
"""
import ast
import os

import numpy as np
import pytest

from hudiff_tpu import constants as C

REF_ROOT = "/root/reference"


def _ref_literals(relpath, names):
    """Extract top-level list/dict literals from a reference source file."""
    path = os.path.join(REF_ROOT, relpath)
    tree = ast.parse(open(path).read())
    found = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if isinstance(t, ast.Name) and t.id in names:
                found[t.id] = ast.literal_eval(node.value)
    return found


def test_basic_shapes():
    assert C.HEAVY_LEN == 152 and C.LIGHT_LEN == 139 and C.PAIR_LEN == 291
    assert C.N_TOKENS == 23 and C.IDX_PAD == 21 and C.IDX_MSK == 22 and C.IDX_X == 20
    assert len(C.HEAVY_POSITIONS) == 152 and len(C.LIGHT_POSITIONS) == 139
    assert sum(C.HEAVY_SEGMENTS) == 152 and sum(C.LIGHT_SEGMENTS) == 139
    assert sum(C.AHO_SEGMENTS) == 149
    for tbl, n in [
        (C.HEAVY_CDR_INDEX, 152), (C.LIGHT_CDR_INDEX, 139),
        (C.HEAVY_CDR_INDEX_NO_TAIL, 152), (C.LIGHT_CDR_INDEX_NO_TAIL, 139),
        (C.HEAVY_CDR_KABAT_VERNIER, 152), (C.HEAVY_CDR_KABAT_NO_VERNIER, 152),
        (C.LIGHT_CDR_KABAT_VERNIER, 139), (C.LIGHT_CDR_KABAT_NO_VERNIER, 139),
        (C.INPAINT_HEAVY_CDR_INDEX, 152), (C.AHO_CDR_INDEX, 149),
        (C.HEAVY_REGION_INDEX, 152), (C.LIGHT_REGION_INDEX, 139),
    ]:
        assert len(tbl) == n


def test_position_ladders():
    # CDR-H3 insertion ladder: 111A..111L ascending then 112L..112A descending.
    assert C.HEAVY_POSITIONS[110] == '111'
    assert C.HEAVY_POSITIONS[111] == '111A' and C.HEAVY_POSITIONS[122] == '111L'
    assert C.HEAVY_POSITIONS[123] == '112L' and C.HEAVY_POSITIONS[134] == '112A'
    assert C.HEAVY_POSITIONS[135] == '112' and C.HEAVY_POSITIONS[151] == '128'
    assert C.LIGHT_POSITIONS[116] == '111F' and C.LIGHT_POSITIONS[117] == '112F'
    assert C.LIGHT_POSITIONS[123] == '112' and C.LIGHT_POSITIONS[138] == '127'


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="reference not mounted")
def test_tables_match_reference_literals():
    pre = _ref_literals(
        "dataset/preprocess.py",
        {"HEAVY_POSITIONS_dict", "LIGHT_POSITIONS_dict",
         "HEAVY_CDR_INDEX", "LIGHT_CDR_INDEX",
         "HEAVY_CDR_INDEX_NO_TAIL", "LIGHT_CDR_INDEX_NO_TAIL",
         "HEAVY_CDR_KABAT_VERNIER", "HEAVY_CDR_KABAT_NO_VERNIER",
         "LIGHT_CDR_KABAT_VERNIER", "LIGHT_CDR_KABAT_NO_VERNIER",
         "INPAINT_HEAVY_CDR_INDEX", "AHO_CDR_INDEX"})
    ds = _ref_literals(
        "dataset/oas_pair_dataset_new.py",
        {"HEAVY_REGION_INDEX", "LIGHT_REGION_INDEX"})

    assert pre["HEAVY_POSITIONS_dict"] == C.HEAVY_POSITIONS_IDX
    assert pre["LIGHT_POSITIONS_dict"] == C.LIGHT_POSITIONS_IDX
    np.testing.assert_array_equal(pre["HEAVY_CDR_INDEX"], C.HEAVY_CDR_INDEX)
    np.testing.assert_array_equal(pre["LIGHT_CDR_INDEX"], C.LIGHT_CDR_INDEX)
    np.testing.assert_array_equal(pre["HEAVY_CDR_INDEX_NO_TAIL"], C.HEAVY_CDR_INDEX_NO_TAIL)
    np.testing.assert_array_equal(pre["LIGHT_CDR_INDEX_NO_TAIL"], C.LIGHT_CDR_INDEX_NO_TAIL)
    np.testing.assert_array_equal(pre["HEAVY_CDR_KABAT_VERNIER"], C.HEAVY_CDR_KABAT_VERNIER)
    np.testing.assert_array_equal(pre["HEAVY_CDR_KABAT_NO_VERNIER"], C.HEAVY_CDR_KABAT_NO_VERNIER)
    np.testing.assert_array_equal(pre["LIGHT_CDR_KABAT_VERNIER"], C.LIGHT_CDR_KABAT_VERNIER)
    np.testing.assert_array_equal(pre["LIGHT_CDR_KABAT_NO_VERNIER"], C.LIGHT_CDR_KABAT_NO_VERNIER)
    np.testing.assert_array_equal(pre["INPAINT_HEAVY_CDR_INDEX"], C.INPAINT_HEAVY_CDR_INDEX)
    np.testing.assert_array_equal(pre["AHO_CDR_INDEX"], C.AHO_CDR_INDEX)
    np.testing.assert_array_equal(ds["HEAVY_REGION_INDEX"], C.HEAVY_REGION_INDEX)
    np.testing.assert_array_equal(ds["LIGHT_REGION_INDEX"], C.LIGHT_REGION_INDEX)


def test_structural_invariants():
    # value histograms (computed once from the reference tables)
    def hist(a):
        return np.bincount(np.asarray(a), minlength=6).tolist()

    assert hist(C.HEAVY_CDR_INDEX) == [93, 12, 10, 37, 0, 0]
    assert hist(C.LIGHT_CDR_INDEX) == [92, 12, 10, 25, 0, 0]
    assert hist(C.HEAVY_CDR_KABAT_NO_VERNIER) == [79, 14, 20, 37, 2, 0]
    assert hist(C.HEAVY_CDR_KABAT_VERNIER) == [71, 14, 20, 37, 2, 8]
    assert hist(C.LIGHT_CDR_KABAT_NO_VERNIER) == [78, 17, 14, 25, 1, 4]
    assert hist(C.LIGHT_CDR_KABAT_VERNIER) == [73, 17, 14, 25, 1, 9]
    assert hist(C.INPAINT_HEAVY_CDR_INDEX) == [87, 12, 12, 37, 4, 0]
    assert hist(C.AHO_CDR_INDEX) == [89, 16, 13, 31, 0, 0]
