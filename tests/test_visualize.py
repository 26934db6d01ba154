"""Partition visualizer + stats report (DecLib Print_Partition /
Analyze.h printOut counterparts)."""
import numpy as np

from pmp_vvc_tpu.utils.visualize import (frame_summary, paint_partition,
                                         print_summary)


def test_paint_partition_edges():
    y = np.zeros((64, 64), np.int32)
    out = paint_partition(y, [(0, 0, 32, 32), (32, 0, 32, 32),
                              (0, 32, 64, 32)], value=500)
    assert out[0, :32].max() == 500        # top edge painted
    assert out[:32, 31].max() == 500       # right edge of first CU
    assert (y == 0).all()                  # input untouched


def test_frame_summary_and_print():
    o = (np.full((16, 16), 100), np.full((8, 8), 50), np.full((8, 8), 60))
    r = (o[0] + 1, o[1], o[2])
    s = frame_summary(o, r, 1234)
    assert s["bits"] == 1234
    assert abs(s["psnr_Y"] - 60.2) < 0.1   # 10*log10(1023^2/1)
    assert s["psnr_U"] == float("inf")
    avg = print_summary([s, s])
    assert abs(avg["psnr_Y"] - s["psnr_Y"]) < 1e-9


def test_bin_stats_collection():
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.headers import VVCConfig
    from pmp_vvc_tpu.utils.stats import print_bin_stats

    rng = np.random.RandomState(0)
    y = rng.randint(0, 1024, (64, 64)).astype(np.int32)
    u = rng.randint(0, 1024, (32, 32)).astype(np.int32)
    v = rng.randint(0, 1024, (32, 32)).astype(np.int32)
    enc = FrameEncoder(VVCConfig(width=64, height=64, qp=32),
                       mode_select="planar")
    bs1, _ = enc.encode_frame(y, u, v)
    bs2, _ = enc.encode_frame(y, u, v, collect_bin_stats=True)
    assert bs1 == bs2, "recording replay must not change the stream"
    assert enc.bin_stats and sum(
        v for k, v in enc.bin_stats.items() if not k.startswith("_")) > 100
    assert "SigFlag0" in enc.bin_stats
    print_bin_stats(enc.bin_stats, top=3)
