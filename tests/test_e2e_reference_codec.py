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
