"""Oracle parity of the map->partition reconciliation vs the reference.

The reference Map2Partition module is imported read-only as a golden oracle;
inputs are synthetic maps derived from realistic random partition trees.
"""
import sys

import numpy as np
import pytest

from pmp_vvc_tpu.pmp.map2partition import (
    MapToPartition, map_to_partition, th_round, write_partition_txt,
)


def _reference_module(reference_root):
    sys.path.insert(0, str(reference_root))
    try:
        import Map2Partition as ref  # type: ignore
    finally:
        sys.path.pop(0)
    return ref


def _random_maps(rng, *, luma=True):
    """Synthesize noisy-but-plausible (qt, msbt, msdire) maps for one block."""
    qt = np.zeros((8, 8), dtype=np.float64)
    # consistent quadtree: assign one depth per implied leaf region
    def fill(d, x, y, size):
        if d < 3 and rng.rand() < 0.4:
            h = size // 2
            for dx in (0, h):
                for dy in (0, h):
                    fill(d + 1, x + dx, y + dy, h)
        else:
            qt[x:x + size, y:y + size] = d
    fill(0, 0, 0, 8)
    msbt = rng.randn(3, 16, 16) * 0.4 + np.cumsum(
        rng.rand(3, 1, 1) < 0.7, axis=0)
    msdire = rng.randn(3, 16, 16) * 0.8
    return qt, msbt.astype(np.float64), msdire.astype(np.float64)


def test_th_round_matches_reference(reference_root):
    ref = _reference_module(reference_root)
    x = np.random.RandomState(0).randn(3, 16, 16)
    np.testing.assert_array_equal(th_round(x, 0.5), ref.th_round(x, 0.5))


@pytest.mark.parametrize("cf", [1, 2])
def test_block_reconciliation_matches_reference(reference_root, cf):
    ref = _reference_module(reference_root)
    rng = np.random.RandomState(42)
    for trial in range(8):
        qt, msbt, msdire = _random_maps(rng, luma=(cf == 1))
        ours = map_to_partition(qt, msbt, msdire, cf)
        r = ref.Map_to_Partition(qt.copy(), msbt.copy(), msdire.copy(), cf)
        p, d = r.get_partition()
        theirs = (p[0][:16, :16], p[1][:16, :16], d)
        for o, t, name in zip(ours, theirs, ["hor", "ver", "dire"]):
            np.testing.assert_array_equal(o, t, err_msg=f"trial {trial} {name}")


def test_partition_txt_roundtrip(tmp_path):
    """The txt writer emits hor+ver+qt+dire in the documented layout."""
    rng = np.random.RandomState(0)
    hor = rng.randint(0, 2, (16, 16)).astype(np.uint8)
    ver = rng.randint(0, 2, (16, 16)).astype(np.uint8)
    qt = rng.randint(0, 4, (8, 8)).astype(np.uint8)
    dire = rng.randint(-1, 2, (3, 16, 16)).astype(np.int8)
    path = tmp_path / "m.txt"
    write_partition_txt(path, [(hor, ver, qt, dire)])
    vals = np.array([int(line) for line in path.read_text().split()])
    assert vals.size == 16 * 16 * 2 + 8 * 8 + 3 * 16 * 16
    np.testing.assert_array_equal(vals[:256], hor.reshape(-1))
    np.testing.assert_array_equal(vals[256:512], ver.reshape(-1))
    np.testing.assert_array_equal(vals[512:576], qt.reshape(-1))
    np.testing.assert_array_equal(vals[576:], dire.reshape(-1))
