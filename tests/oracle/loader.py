"""ctypes loader for the VTM golden-oracle library (built on demand)."""
import ctypes
import pathlib
import subprocess

LIB = pathlib.Path("/tmp/vtm_oracle/libvtm_oracle.so")
BUILD = pathlib.Path(__file__).resolve().parent / "build_oracle.sh"


def get_oracle(build_timeout=600):
    """Return the loaded oracle library, building it if necessary.

    Returns None if the reference tree or toolchain is unavailable.
    """
    if not LIB.exists():
        if not pathlib.Path("/root/reference").exists():
            return None
        try:
            subprocess.run(["bash", str(BUILD)], check=True,
                           capture_output=True, timeout=build_timeout)
        except Exception:
            return None
    lib = ctypes.CDLL(str(LIB))
    for name in ("oracle_fwd_transform", "oracle_inv_transform"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [ctypes.POINTER(ctypes.c_int),
                       ctypes.POINTER(ctypes.c_int),
                       ctypes.c_int, ctypes.c_int, ctypes.c_int,
                       ctypes.c_int, ctypes.c_int]
    if hasattr(lib, "oracle_intra_pred"):
        lib.oracle_intra_pred.restype = None
        lib.oracle_intra_pred.argtypes = [
            ctypes.POINTER(ctypes.c_short), ctypes.POINTER(ctypes.c_short),
            ctypes.POINTER(ctypes.c_short), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
    if hasattr(lib, "oracle_cabac_encode"):
        lib.oracle_cabac_encode.restype = ctypes.c_int
        lib.oracle_cabac_encode.argtypes = [
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
        lib.oracle_cabac_decode.restype = ctypes.c_int
        lib.oracle_cabac_decode.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.oracle_ctx_count.restype = ctypes.c_int
        lib.oracle_ctx_count.argtypes = []
        lib.oracle_ctx_init_dump.restype = None
        lib.oracle_ctx_init_dump.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_ushort),
            ctypes.POINTER(ctypes.c_ubyte)]
    if hasattr(lib, "oracle_satd"):
        lib.oracle_satd.restype = ctypes.c_longlong
        lib.oracle_mip_pred.argtypes = [
            ctypes.POINTER(ctypes.c_short), ctypes.POINTER(ctypes.c_short),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.oracle_satd.argtypes = [ctypes.POINTER(ctypes.c_short),
                                    ctypes.POINTER(ctypes.c_short),
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    return lib


def c_short_array(arr):
    import numpy as np
    a = np.ascontiguousarray(arr, dtype=np.int16)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_short))


def c_int_array(arr):
    import numpy as np
    a = np.ascontiguousarray(arr, dtype=np.int32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
