"""Native (C++) runtime components vs Python fallbacks."""
import numpy as np
import pytest

from deepflame_tpu.native import (native_available, partition_balance,
                                  partition_slabs)
from deepflame_tpu.combustion.fgm.table import (make_synthetic_table,
                                                read_flare_table,
                                                write_flare_table)


def test_partition_slabs():
    s = partition_slabs(10, 3)
    np.testing.assert_array_equal(s, [0, 4, 7, 10])
    s = partition_slabs(64, 8)
    assert s[-1] == 64 and len(s) == 9
    diffs = np.diff(s)
    assert diffs.max() - diffs.min() <= 1


def test_partition_balance():
    # a long thin domain should be split along its long axis
    dx, dy, dz = partition_balance(1024, 8, 8, 8)
    assert (dx, dy, dz) == (8, 1, 1)
    d = partition_balance(64, 64, 1, 4)
    assert d[2] == 1 and d[0] * d[1] == 4


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_flare_parse_matches_python(tmp_path):
    tb = make_synthetic_table(NZ=9, NC=5, NGZ=3, NGC=2)
    path = str(tmp_path / "flare.tbl")
    write_flare_table(path, tb)
    t_native = read_flare_table(path, use_native=True)
    t_py = read_flare_table(path, use_native=False)
    assert t_native.shape == t_py.shape
    assert t_native.scaled_pv == t_py.scaled_pv
    for name in t_py.tables:
        np.testing.assert_allclose(np.asarray(t_native.tables[name]),
                                   np.asarray(t_py.tables[name]), rtol=1e-7)
    for ax in range(6):
        np.testing.assert_allclose(t_native.axes[ax], t_py.axes[ax])
    for k in t_py.laminar:
        np.testing.assert_allclose(t_native.laminar[k], t_py.laminar[k])
