"""End-to-end: our prediction pipeline's PartitionMat drives the reference
VTM+PMP encoder; the stock decoder verifies the decoded-picture hash.

This is the reference's own conformance protocol (codec/demo/README.md)
with the Python half replaced by our TPU pipeline.
"""
import pathlib
import subprocess

import numpy as np
import pytest

ENC = pathlib.Path("/tmp/vtm_oracle/EncoderApp")
DEC = pathlib.Path("/tmp/vtm_oracle/DecoderApp")
CFG = pathlib.Path("/root/reference/codec/demo/cfg/encoder_intra_vtm.cfg")


@pytest.mark.skipif(not (ENC.exists() and DEC.exists() and CFG.exists()),
                    reason="VTM oracle apps not built")
def test_pipeline_maps_drive_reference_encoder(tmp_path):
    import jax
    from pmp_vvc_tpu.data.yuv import write_yuv420
    from pmp_vvc_tpu.pmp.pipeline import predict_sequence
    from pmp_vvc_tpu.pmp.predict import CompPredictor

    # synthetic 192x128 8-bit content
    rng = np.random.RandomState(7)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
                + rng.randn(h, w) * 6, 0, 255).astype(np.uint8)[None]
    u = (128 + 40 * np.sin(xx[::2, ::2] / 31.0)).astype(np.uint8)[None]
    v = (128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.uint8)[None]
    seq = tmp_path / "synth_192x128_30.yuv"
    write_yuv420(seq, y, u, v)

    preds = {
        (comp, 32): CompPredictor.from_reference_checkpoints(
            comp == "Luma",
            f"/root/reference/trained_models/{comp}_Q_32.pkl")
        for comp in ("Luma", "Chroma")
    }
    predict_sequence(seq, w, h, predictors=preds,
                     out_dir=tmp_path / "PartitionMat",
                     seq_name="synth_192x128_30", subsample=1, qps=(32,))

    seq_cfg = tmp_path / "seq.cfg"
    seq_cfg.write_text(f"""InputFile: {seq}
InputBitDepth: 8
InputChromaFormat: 420
FrameRate: 30
FrameSkip: 0
SourceWidth: {w}
SourceHeight: {h}
FramesToBeEncoded: 1
Level: 2.1
""")
    bit = tmp_path / "out.bin"
    r = subprocess.run(
        [str(ENC), "-c", str(seq_cfg), "-c", str(CFG), "-q", "32",
         "-ts", "1", "--SEIDecodedPictureHash=1", "-b", str(bit),
         "-o", "/dev/null"],
        cwd=tmp_path, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert bit.exists() and bit.stat().st_size > 0

    d = subprocess.run([str(DEC), "-b", str(bit), "-o", "/dev/null"],
                       capture_output=True, text=True, timeout=120)
    assert d.returncode == 0, d.stderr[-2000:]
    assert "(OK)" in d.stdout, d.stdout[-2000:]


@pytest.mark.skipif(not DEC.exists(), reason="VTM decoder oracle not built")
def test_pipeline_maps_drive_native_encoder(tmp_path):
    """Full native loop: Down-Up-CNN maps -> structural vote ->
    Map2Partition -> our MTT frame encoder (deblock+SAO on) -> standard
    bitstream the stock VTM-10.0 decoder reconstructs bit-exactly."""
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.headers import VVCConfig
    from pmp_vvc_tpu.data.yuv import blocks_for_sequence
    from pmp_vvc_tpu.pmp.map2partition import blocks_to_frame_partition
    from pmp_vvc_tpu.pmp.predict import CompPredictor

    rng = np.random.RandomState(7)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    y8 = np.clip(128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
                 + rng.randn(h, w) * 6, 0, 255).astype(np.uint8)[None]
    u8 = (128 + 40 * np.sin(xx[::2, ::2] / 31.0)).astype(np.uint8)[None]
    v8 = (128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.uint8)[None]

    pred = CompPredictor.from_reference_checkpoints(
        True, "/root/reference/trained_models/Luma_Q_32.pkl")
    luma_in, _ = blocks_for_sequence(y8, u8, v8)
    qt, bt, dire = pred.predict(luma_in)
    maps = blocks_to_frame_partition(qt, bt, dire, w, h, True)

    cfg = VVCConfig(width=w, height=h, qp=32, log2_min_cb=3,
                    max_mtt_depth_intra=3, max_bt_intra=32, max_tt_intra=32,
                    deblocking_disabled=False, sao=True)
    enc = FrameEncoder(cfg, mode_select="satd",
                       rmd_modes=tuple(range(0, 67, 6)))
    y10, u10, v10 = (p[0].astype(np.int32) << 2 for p in (y8, u8, v8))
    bs, recon = enc.encode_frame(y10, u10, v10, maps=maps)

    bit = tmp_path / "native.bin"
    bit.write_bytes(bs)
    out = tmp_path / "native_dec.yuv"
    d = subprocess.run([str(DEC), "-b", str(bit), "-o", str(out)],
                       capture_output=True, text=True, timeout=300)
    assert d.returncode == 0, d.stderr[-2000:]
    assert "(OK)" in d.stdout, d.stdout[-2000:]
    data = np.fromfile(out, dtype=np.uint16)
    np.testing.assert_array_equal(data[:w * h].reshape(h, w), recon[0])
