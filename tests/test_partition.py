"""Partition scheduler: demo-map derivation + consistency with the
reconciliation stage that produced the maps."""
import numpy as np
import pytest

from pmp_vvc_tpu.codec.partition import (
    MapPartitioner, PartitionConstraints, Split, read_partition_txt,
    split_children,
)
from pmp_vvc_tpu.pmp.map2partition import MapToPartition

DEMO = ("/root/reference/codec/demo/PartitionMat/"
        "RaceHorses_416x240_30_{comp}_QP{qp}_PartitionMat.txt")


def _check_tiling(node, leaves):
    area = sum(h * w for (_, _, h, w) in leaves)
    assert area == node.h * node.w
    # no overlap: mark a canvas
    canvas = np.zeros((node.h, node.w), bool)
    for (x, y, h, w) in leaves:
        region = canvas[x - node.x:x - node.x + h, y - node.y:y - node.y + w]
        assert not region.any(), "overlapping leaves"
        region[:] = True
    assert canvas.all()


@pytest.mark.parametrize("comp,qp", [("Luma", 27), ("Chroma", 27),
                                     ("Luma", 37)])
def test_demo_maps_produce_legal_tilings(comp, qp):
    frames = read_partition_txt(DEMO.format(comp=comp, qp=qp), 240, 416)
    hor, ver, qt, dire = frames[0]
    cons = PartitionConstraints(chroma=(comp == "Chroma"))
    part = MapPartitioner(hor, ver, qt, dire, accel_level=3,
                          constraints=cons)
    n_leaves = 0
    for r in range(240 // 64):
        for c in range(416 // 64):
            tree = part.derive_ctu(r, c)
            leaves = [(l.x, l.y, l.h, l.w) for l in tree.leaves()]
            _check_tiling(tree, leaves)
            for (_, _, h, w) in leaves:
                lim = 8 if comp == "Chroma" else 4
                assert h >= lim and w >= lim, (h, w)
            n_leaves += len(leaves)
    assert n_leaves > 6 * 3  # at least some splitting happened


def test_leaf_cus_flat_list():
    frames = read_partition_txt(DEMO.format(comp="Luma", qp=27), 240, 416)
    hor, ver, qt, dire = frames[0]
    part = MapPartitioner(hor, ver, qt, dire, accel_level=3)
    leaves, rdo = part.leaf_cus(192, 384)
    assert len(leaves) == len(rdo)
    assert sum(h * w for (_, _, h, w) in leaves) == 192 * 384
    assert not any(rdo)  # L3 inside coverage never defers to RDO


def test_reconciliation_vs_scheduler_consistency():
    """CU lists from Map_to_Partition's best leaf should be recoverable
    from its own emitted edge maps via the scheduler for QT-only maps."""
    rng = np.random.RandomState(3)
    # strongly-structured maps: clear QT depth, no MTT
    qt = np.full((8, 8), 1.0)
    qt[:4, :4] = 2.0
    msbt = np.zeros((3, 16, 16))
    msdire = np.zeros((3, 16, 16))
    m = MapToPartition(qt, msbt, msdire, 1)
    p, d = m.get_partition()
    hor, ver = p[0][:16, :16], p[1][:16, :16]
    part = MapPartitioner(hor, ver, qt.astype(int), d, accel_level=3)
    tree = part.derive_ctu(0, 0)
    leaves = sorted((l.x, l.y, l.h, l.w) for l in tree.leaves())
    expect = []
    # qt=2 over the top-left 32x32 -> 16x16 leaves; qt=1 elsewhere -> 32x32
    for x in range(0, 32, 16):
        for y in range(0, 32, 16):
            expect.append((x, y, 16, 16))
    for (x, y) in [(0, 32), (32, 0), (32, 32)]:
        expect.append((x, y, 32, 32))
    assert leaves == sorted(expect)


def test_accel_level_gating():
    frames = read_partition_txt(DEMO.format(comp="Luma", qp=27), 240, 416)
    hor, ver, qt, dire = frames[0]
    trees = {}
    for level in (1, 2, 3):
        part = MapPartitioner(hor, ver, qt, dire, accel_level=level)
        leaves, rdo = part.leaf_cus(192, 384)
        trees[level] = (len(leaves), sum(rdo))
    # lower levels stop earlier (fewer map-driven splits, more RDO leaves)
    assert trees[1][0] <= trees[2][0] <= trees[3][0]
    assert trees[1][1] >= trees[3][1]


def test_split_children_geometry():
    assert split_children(0, 0, 32, 32, Split.QT) == [
        (0, 0, 16, 16), (0, 16, 16, 16), (16, 0, 16, 16), (16, 16, 16, 16)]
    assert split_children(8, 16, 32, 16, Split.TT_H) == [
        (8, 16, 8, 16), (16, 16, 16, 16), (32, 16, 8, 16)]
