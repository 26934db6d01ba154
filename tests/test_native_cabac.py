"""Native C CABAC finalizer vs the Python BinEncoder: byte-identical on
random op streams (the Python engine itself is byte-exact vs VTM)."""
import numpy as np
import pytest

from pmp_vvc_tpu.codec.cabac import BinEncoder, ContextStore
from pmp_vvc_tpu.native import cabac_finalize, _load


def _python_finalize(ops, qp):
    enc = BinEncoder(ContextStore.standard_init(qp, 2))
    for op in ops:
        k = op[0]
        if k == "b":
            enc.encode_bin(op[1], op[2])
        elif k == "ep":
            enc.encode_bin_ep(op[1])
        elif k == "eps":
            enc.encode_bins_ep(op[1], op[2])
        else:
            enc.encode_rem_abs_ep(op[1], op[2], op[3], op[4])
    enc.encode_bin_trm(1)
    enc.finish()
    return enc.write_stop_bit_and_align()


@pytest.mark.skipif(_load() is None, reason="no C compiler for libcabac")
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_python(seed):
    rng = np.random.RandomState(seed)
    n_ctx = len(ContextStore.standard_init(32, 2).state0)
    ops = []
    for _ in range(20000):
        t = rng.randint(4)
        if t == 0:
            ops.append(("b", int(rng.randint(2)), int(rng.randint(n_ctx))))
        elif t == 1:
            ops.append(("ep", int(rng.randint(2))))
        elif t == 2:
            n = int(rng.randint(1, 20))
            ops.append(("eps", int(rng.randint(1 << n)), n))
        else:
            ops.append(("rem", int(rng.randint(1 << 14)),
                        int(rng.randint(4)), 5, 15))
    qp = int(rng.choice([22, 27, 32, 37]))
    py = _python_finalize(ops, qp)
    nat = cabac_finalize(ops, ContextStore.standard_init(qp, 2))
    assert nat is not None
    assert nat == py
