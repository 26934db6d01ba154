"""Spatially-sharded encode (CTU-column stripes + ppermute halo
exchange) must reproduce the single-device bitstream bit-for-bit —
the multi-host formulation that stops replicating frame planes
(VERDICT r3 item 8 / SURVEY §5 long-context row)."""
import numpy as np
import pytest

from pmp_vvc_tpu.codec.headers import VVCConfig


def _synth(w, h, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y8 = np.clip(128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
                 + rng.randn(h, w) * 6, 0, 255)
    return ((y8.astype(np.int32) << 2),
            ((128 + 40 * np.sin(xx[::2, ::2] / 31.0)).astype(np.int32) << 2),
            ((128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.int32) << 2))


_TOOLSET = dict(mts_intra=True, mip=True, cclm=True, lfnst=True,
                sign_hiding=True, joint_cbcr=True, transform_skip=True,
                chroma_qp_start_minus26=-9,
                chroma_qp_points=((9, 12), (4, 5), (11, 7)))


@pytest.mark.parametrize("n_dev,w,tools", [(2, 256, False),
                                           (4, 512, False),
                                           (2, 256, True)])
def test_spatial_sharded_bitstream_identical(n_dev, w, tools):
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    from pmp_vvc_tpu.parallel import make_mesh
    from pmp_vvc_tpu.parallel.spatial import spatial_wave_planes

    h = 128
    cfg = VVCConfig(width=w, height=h, qp=32,
                    **(_TOOLSET if tools else {}))
    y, u, v = _synth(w, h)

    bs1, rec1 = WavefrontEncoder(cfg).encode_frame(y, u, v)

    enc = WavefrontEncoder(cfg)
    decide = enc._decider(None, None)
    leaves = enc._collect_leaves(decide)
    mesh = make_mesh(n_dev, axis="sp")
    enc._dev_result = spatial_wave_planes(enc, leaves, y, u, v, mesh)
    enc._cur_frame = 0
    bs2, rec2 = FrameEncoder.encode_frame(enc, y, u, v)
    assert bs1 == bs2
    for a, b in zip(rec1, rec2):
        assert np.array_equal(a, b)
