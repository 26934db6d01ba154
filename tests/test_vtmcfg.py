"""VTM cfg front end: the reference demo cfg stack must map onto our
VVCConfig (program_options_lite counterpart)."""
import pathlib

import pytest

CTC = pathlib.Path("/root/reference/codec/demo/cfg/encoder_intra_vtm.cfg")


def test_parse_layering(tmp_path):
    from pmp_vvc_tpu.utils.vtmcfg import merge_cfgs
    a = tmp_path / "a.cfg"
    b = tmp_path / "b.cfg"
    a.write_text("QP : 22   # comment\nSAO: 1\n")
    b.write_text("QP : 37\n")
    assert merge_cfgs([a])["QP"] == "22"
    assert merge_cfgs([a, b])["QP"] == "37"          # later file wins
    assert merge_cfgs([a, b], {"QP": "32"})["QP"] == "32"


@pytest.mark.skipif(not CTC.exists(), reason="reference not mounted")
def test_ctc_cfg_maps_to_vvcconfig(tmp_path):
    from pmp_vvc_tpu.codec.headers import VVCConfig
    from pmp_vvc_tpu.utils.vtmcfg import merge_cfgs, to_encoder_args
    seq = tmp_path / "seq.cfg"
    seq.write_text("InputFile: in.yuv\nInputBitDepth: 8\n"
                   "SourceWidth: 192\nSourceHeight: 128\n"
                   "FramesToBeEncoded: 2\n")
    io, kw, warns = to_encoder_args(merge_cfgs([seq, CTC]))
    assert io["width"] == 192 and io["frames"] == 2
    cfg = VVCConfig(width=io["width"], height=io["height"], **kw)
    assert cfg.qp == 32 and cfg.bit_depth == 10 and cfg.ctu_size == 128
    assert cfg.dual_tree and cfg.mts_intra and cfg.lfnst and cfg.isp
    assert cfg.mip and cfg.cclm and cfg.dep_quant and cfg.lmcs
    assert cfg.sao and cfg.alf and cfg.max_mtt_depth_intra == 3
    # CTC chroma-QP table pivots: 17/27/32/44 -> 17/29/34/41
    assert cfg.chroma_qp_start_minus26 == -9
    assert cfg.chroma_qp_points == ((9, 12), (4, 5), (11, 7))
    # transform-skip is mapped through (CTC TransformSkipLog2MaxSize 5)
    assert cfg.transform_skip and cfg.ts_max_log2 == 5
    assert not any("TransformSkip" in w for w in warns)
