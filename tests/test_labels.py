"""Label synthesis: oracle parity vs GenMSBtMap + native tree labels."""
import sys

import numpy as np
import pytest

from pmp_vvc_tpu.codec.partition import MapPartitioner, PartitionConstraints
from pmp_vvc_tpu.data.labels import MapToSubMap, labels_from_tree
from pmp_vvc_tpu.pmp.map2partition import MapToPartition


def _reference(reference_root):
    sys.path.insert(0, str(reference_root))
    try:
        import GenMSBtMap as ref  # type: ignore
    finally:
        sys.path.pop(0)
    return ref


@pytest.mark.parametrize("cf", [1, 2])
def test_sub_map_matches_reference(reference_root, cf):
    ref = _reference(reference_root)
    rng = np.random.RandomState(11)
    for trial in range(6):
        qt = np.zeros((8, 8))
        if rng.rand() < 0.5:
            qt[:4, :4] = 1
        bt = rng.randint(0, 4, (16, 16)).astype(np.int8)
        # smooth the map a little so candidates exist
        bt = np.repeat(np.repeat(bt[::2, ::2], 2, 0), 2, 1).astype(np.int8)
        dire = rng.choice([-1, 0, 1], (3, 16, 16)).astype(np.int8)
        ours = MapToSubMap(qt, bt, dire, cf).get_sub_map()
        theirs = ref.Map_to_SubMap(qt.copy(), bt.copy(), dire.copy(),
                                   cf).get_sub_map()
        np.testing.assert_array_equal(ours, theirs, err_msg=f"trial {trial}")


def test_labels_from_tree_roundtrip():
    """Scheduler tree -> labels: depth accumulations are consistent with
    the edge maps the tree came from."""
    rng = np.random.RandomState(3)
    qt = np.full((8, 8), 1.0)
    msbt = np.clip(rng.randn(3, 16, 16) * 0.3
                   + np.cumsum(rng.rand(3, 1, 1) < 0.7, 0), 0, 3)
    msd = rng.randn(3, 16, 16)
    p, d = MapToPartition(qt, msbt, msd, 1).get_partition()
    part = MapPartitioner(p[0][:16, :16], p[1][:16, :16], qt.astype(int), d,
                          accel_level=3)
    tree = part.derive_ctu(0, 0)
    qt8, bt, dire = labels_from_tree(tree)
    assert qt8.shape == (8, 8) and bt.shape == (3, 16, 16)
    assert (qt8 >= 1).all()          # implicit 128->64 depth included
    # monotone layers: depth never decreases across layers
    assert (np.diff(bt, axis=0) >= 0).all()
    assert set(np.unique(dire)).issubset({-1, 0, 1})
