"""Native decoder vs a STOCK-VTM-encoded bitstream (DecLib genuine
counterpart check): the stream is produced by the reference EncoderApp
(full RDO partitioning, its own mode decisions, non-DM chroma modes),
not by our encoder — decode must reproduce it hash-verified.

Coverage spans the tools-off envelope (the encoder flags below) up to
the FULL CTC toolset: test_decode_stock_vtm_full_ctc_stream decodes the
reference demo command line with no tool exclusions, hash-verified."""
import pathlib
import subprocess

import numpy as np
import pytest

_ENC = pathlib.Path("/tmp/vtm_oracle/EncoderApp")

TOOLS_OFF = [
    "--DepQuant=0", "--RDOQ=0", "--RDOQTS=0", "--SignHideFlag=0",
    "--MIP=0", "--ISP=0", "--LFNST=0", "--MTS=0", "--LMCSEnable=0",
    "--ALF=0", "--CCALF=0", "--SAO=0", "--DualITree=0", "--MRL=0",
    "--LMChroma=0", "--JointCbCr=0", "--IBC=0", "--LoopFilterDisable=1",
    "--TransformSkip=0", "--TMVPMode=0", "--IMV=0", "--BIO=0",
    "--SMVD=0", "--DMVR=0", "--MMVD=0", "--SbTMVP=0", "--SBT=0",
    "--Affine=0", "--CIIP=0", "--Geo=0", "--BCW=0",
    # pin the partition envelope (the PMP map gate rejects all MTT for
    # zero maps; QT-only to 64 keeps the L3 mode list non-empty)
    "--MinQTISlice=64", "--MaxMTTHierarchyDepthI=0",
    "--MaxBTLumaISlice=64", "--MaxTTLumaISlice=64",
]


@pytest.mark.skipif(not _ENC.exists(), reason="VTM oracle not built")
def test_decode_stock_vtm_stream(tmp_path):
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.data.yuv import write_yuv420

    w, h = 192, 128
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:h, 0:w]
    y8 = np.clip(128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
                 + rng.randn(h, w) * 6, 0, 255).astype(np.uint8)
    u8 = (128 + 40 * np.sin(xx[::2, ::2] / 31.0)).astype(np.uint8)
    v8 = (128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.uint8)
    seq = tmp_path / "in.yuv"
    write_yuv420(seq, y8[None], u8[None], v8[None])
    cfg = tmp_path / "seq.cfg"
    cfg.write_text(f"""InputFile: {seq}
InputBitDepth: 8
InputChromaFormat: 420
FrameRate: 30
SourceWidth: {w}
SourceHeight: {h}
FramesToBeEncoded: 1
Level: 2.1
""")
    # the PMP-patched EncoderApp hard-requires PartitionMat files
    # (EncAppCfg.cpp:4255); drive it with real Q-net predictions, the
    # same flow as the reference demo (codec/demo/README.md)
    from pmp_vvc_tpu.data.yuv import blocks_for_sequence
    from pmp_vvc_tpu.pmp.map2partition import (blocks_to_frame_partition,
                                               write_partition_txt)
    from pmp_vvc_tpu.pmp.predict import CompPredictor
    pm = tmp_path / "PartitionMat"
    pm.mkdir()
    lin, cin = blocks_for_sequence(y8[None], u8[None], v8[None])
    for comp, blocks in (("Luma", lin), ("Chroma", cin)):
        pred = CompPredictor.from_reference_checkpoints(
            comp == "Luma",
            f"/root/reference/trained_models/{comp}_Q_32.pkl")
        qt, bt, dire = pred.predict(blocks)
        maps = blocks_to_frame_partition(qt, bt, dire, w, h,
                                         comp == "Luma")
        write_partition_txt(pm / f"in_{comp}_QP32_PartitionMat.txt",
                            [maps])
    bit = tmp_path / "out.bin"
    r = subprocess.run(
        [str(_ENC), "-c", str(cfg), "-c",
         "/root/reference/codec/demo/cfg/encoder_intra_vtm.cfg",
         "-q", "32", "-ts", "1", "--SEIDecodedPictureHash=1",
         "-b", str(bit), "-o", "/dev/null"] + TOOLS_OFF,
        capture_output=True, text=True, timeout=600, cwd=tmp_path)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    dcfg, frames = decode_stream(bit.read_bytes(), verify_hash=True)
    assert len(frames) == 1
    assert frames[0][0].shape == (h, w)


@pytest.mark.skipif(not _ENC.exists(), reason="VTM oracle not built")
def test_decode_stock_vtm_full_ctc_stream(tmp_path):
    """Full-CTC toolset stock stream (encoder_intra_vtm.cfg: dual tree,
    MIP/MRL/ISP, CCLM, MTS/LFNST, JCCR, LMCS, SAO, dep-quant, transform
    skip, ALF/CC-ALF with the full multi-APS/nonlinear/multi-alt
    syntax, deblocking) — our decoder must reproduce it
    hash-verified.  No tool exclusions: this is the reference demo
    command line verbatim."""
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.data.yuv import write_yuv420

    w, h = 192, 128
    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:h, 0:w]
    # mixed content: smooth gradients + flat/noisy blocks (exercises TS)
    y8 = np.clip(128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
                 + rng.randn(h, w) * 6, 0, 255).astype(np.uint8)
    y8[16:48, 16:80] = (rng.randint(0, 2, (32, 64)) * 180 + 40).astype(np.uint8)
    y8[64:96, 96:160] = 200
    u8 = (128 + 40 * np.sin(xx[::2, ::2] / 31.0)).astype(np.uint8)
    v8 = (128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.uint8)
    seq = tmp_path / "in.yuv"
    write_yuv420(seq, y8[None], u8[None], v8[None])
    cfg = tmp_path / "seq.cfg"
    cfg.write_text(f"""InputFile: {seq}
InputBitDepth: 8
InputChromaFormat: 420
FrameRate: 30
SourceWidth: {w}
SourceHeight: {h}
FramesToBeEncoded: 1
Level: 2.1
""")
    from pmp_vvc_tpu.data.yuv import blocks_for_sequence
    from pmp_vvc_tpu.pmp.map2partition import (blocks_to_frame_partition,
                                               write_partition_txt)
    from pmp_vvc_tpu.pmp.predict import CompPredictor
    pm = tmp_path / "PartitionMat"
    pm.mkdir()
    lin, cin = blocks_for_sequence(y8[None], u8[None], v8[None])
    for comp, blocks in (("Luma", lin), ("Chroma", cin)):
        pred = CompPredictor.from_reference_checkpoints(
            comp == "Luma",
            f"/root/reference/trained_models/{comp}_Q_32.pkl")
        qt, bt, dire = pred.predict(blocks)
        maps = blocks_to_frame_partition(qt, bt, dire, w, h,
                                         comp == "Luma")
        write_partition_txt(pm / f"in_{comp}_QP32_PartitionMat.txt",
                            [maps])
    bit = tmp_path / "out.bin"
    r = subprocess.run(
        [str(_ENC), "-c", str(cfg), "-c",
         "/root/reference/codec/demo/cfg/encoder_intra_vtm.cfg",
         "-q", "32", "-ts", "1", "--SEIDecodedPictureHash=1",
         "-b", str(bit), "-o", "/dev/null"],
        capture_output=True, text=True, timeout=600, cwd=tmp_path)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    dcfg, frames = decode_stream(bit.read_bytes(), verify_hash=True)
    assert dcfg.transform_skip and dcfg.dep_quant and dcfg.dual_tree
    assert len(frames) == 1
    assert frames[0][0].shape == (h, w)
