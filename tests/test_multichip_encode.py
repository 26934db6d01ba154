"""Multi-device encode: the wavefront engine with CU batches sharded
over an 8-virtual-device CPU mesh must produce a bitstream IDENTICAL to
the single-device encode (integer math — shard placement cannot change
the bits)."""
import numpy as np

from pmp_vvc_tpu.codec.headers import VVCConfig


def _synth(w, h, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y8 = np.clip(128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
                 + rng.randn(h, w) * 6, 0, 255)
    y = (y8.astype(np.int32) << 2)
    u = ((128 + 40 * np.sin(xx[::2, ::2] / 31.0)).astype(np.int32) << 2)
    v = ((128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.int32) << 2)
    return y, u, v


def test_sharded_encode_bit_identical():
    import jax
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    from pmp_vvc_tpu.parallel import make_mesh

    assert len(jax.devices()) >= 8, "conftest forces 8 virtual devices"
    cfg = VVCConfig(width=192, height=128, qp=32)
    y, u, v = _synth(192, 128)
    bs1, rec1 = WavefrontEncoder(cfg).encode_frame(y, u, v)
    mesh = make_mesh(8)
    bs8, rec8 = WavefrontEncoder(cfg, mesh=mesh).encode_frame(y, u, v)
    assert bs1 == bs8
    for a, b in zip(rec1, rec8):
        assert np.array_equal(a, b)


def test_sharded_decodes_natively():
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    from pmp_vvc_tpu.parallel import make_mesh

    cfg = VVCConfig(width=192, height=128, qp=27, sao=True,
                    deblocking_disabled=False)
    y, u, v = _synth(192, 128, seed=9)
    enc = WavefrontEncoder(cfg, mesh=make_mesh(4))
    bs, recon = enc.encode_frame(y, u, v)
    dcfg, got = decode_stream(bs, verify_hash=True)
    for a, b in zip(got[0], recon):
        assert np.array_equal(a, b)


def test_sharded_mtt_maps_bit_identical():
    """VERDICT r3 item 9: map-driven MTT partitioning under the mesh —
    sharded and single-device encodes must produce identical bits."""
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    from pmp_vvc_tpu.parallel import make_mesh
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_wavefront import _mtt_maps

    cfg = VVCConfig(width=192, height=128, qp=27)
    maps = _mtt_maps(192, 128)
    y, u, v = _synth(192, 128)
    bs1, _ = WavefrontEncoder(cfg).encode_frame(y, u, v, maps=maps)
    bs8, _ = WavefrontEncoder(cfg, mesh=make_mesh(8)).encode_frame(
        y, u, v, maps=maps)
    assert bs1 == bs8


def test_sharded_encode_frames_bit_identical():
    """Sharded multi-frame batched encode (encode_frames) vs single
    device, including the cross-frame greedy wave packing."""
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    from pmp_vvc_tpu.parallel import make_mesh

    cfg = VVCConfig(width=192, height=128, qp=32, sao=True,
                    deblocking_disabled=False)
    frames = [_synth(192, 128, seed=7 + i) for i in range(3)]
    outs1 = WavefrontEncoder(cfg).encode_frames(frames)
    outs8 = WavefrontEncoder(cfg, mesh=make_mesh(8)).encode_frames(frames)
    for (b1, r1), (b8, r8) in zip(outs1, outs8):
        assert b1 == b8
        for a, b in zip(r1, r8):
            assert np.array_equal(a, b)


def test_sharded_uneven_final_buckets():
    """Deliberately uneven tail: a mesh size that does not divide the
    CU count and a frame geometry leaving partial batch rows — bits
    must still match the single-device encode (the schedule's invalid
    slots scatter nothing on every shard)."""
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    from pmp_vvc_tpu.parallel import make_mesh

    cfg = VVCConfig(width=320, height=192, qp=37, dual_tree=True)
    y, u, v = _synth(320, 192, seed=11)
    bs1, _ = WavefrontEncoder(cfg).encode_frame(y, u, v)
    # 3 devices: forces batch round-up and ragged shard tails
    bs3, _ = WavefrontEncoder(cfg, mesh=make_mesh(3)).encode_frame(
        y, u, v)
    assert bs1 == bs3
