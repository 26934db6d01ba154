"""Header parsing: SPS/PPS/SH roundtrip through our own writers."""
import dataclasses

import numpy as np
import pytest

from pmp_vvc_tpu.codec.headers import VVCConfig, write_pps, write_sps
from pmp_vvc_tpu.codec.hlsparse import (
    parse_bitstream, parse_pps, parse_sps,
)


CONFIGS = [
    VVCConfig(width=128, height=128),
    VVCConfig(width=192, height=128, qp=27, max_mtt_depth_intra=2,
              max_bt_intra=32, max_tt_intra=32, mts_intra=True),
    VVCConfig(width=128, height=128, qp=37, dual_tree=True, mip=True,
              cclm=True, lfnst=True, isp=True, mrl=True,
              joint_cbcr=True, sao=True,
              deblocking_disabled=False,
              chroma_qp_start_minus26=-9,
              chroma_qp_points=((9, 12), (4, 5), (11, 7))),
    VVCConfig(width=64, height=64, dep_quant=True),
    VVCConfig(width=64, height=64, sign_hiding=True, lmcs=True,
              lmcs_chroma_scaling=True, alf=True, ccalf=True,
              alf_chroma=True),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=range(len(CONFIGS)))
def test_sps_pps_roundtrip(cfg):
    got = parse_sps(write_sps(cfg))
    parse_pps(write_pps(cfg), got)
    skip = {"rd_quant", "lmcs_chroma_scaling", "lmcs_offset",
            "alf_chroma"}  # encoder-side / PH-level knobs, not SPS/PPS
    for f in dataclasses.fields(VVCConfig):
        if f.name in skip:
            continue
        assert getattr(got, f.name) == getattr(cfg, f.name), f.name


def test_parse_full_stream_sei_and_slices():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pmp_vvc_tpu.codec.encoder import FrameEncoder

    cfg = VVCConfig(width=64, height=64, qp=32)
    rng = np.random.RandomState(3)
    y = rng.randint(0, 1024, (64, 64)).astype(np.int32)
    u = rng.randint(0, 1024, (32, 32)).astype(np.int32)
    v = rng.randint(0, 1024, (32, 32)).astype(np.int32)
    enc = FrameEncoder(cfg, mode_select="planar")
    bs, recon = enc.encode_frame(y, u, v)
    parsed = parse_bitstream(bs)
    assert parsed.cfg.width == 64 and parsed.cfg.qp == 32
    assert len(parsed.slices) == 1 and parsed.slices[0].poc == 0
    assert len(parsed.slices[0].slice_data) > 0
    import hashlib
    want = [hashlib.md5(p.astype("<u2").tobytes()).digest() for p in recon]
    assert parsed.hashes[0] == want
