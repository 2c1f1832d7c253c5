"""ctypes bindings for the C++ VQA scorer (native/vqa_eval.cpp).

Loads ``licv_vqa_tpu/_native/libvqa_eval.so``; builds it on demand with the
in-image g++ when missing.  All callers fall back to the pure-Python path if
neither works, and the test suite asserts Python/C++ agreement.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

from ..utils.log import get_logger

logger = get_logger("metrics.native")

_LIB_PATH = Path(__file__).resolve().parent.parent / "_native" / "libvqa_eval.so"
_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as e:
        logger.warning("native vqa_eval build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.licv_normalize_answer.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.licv_normalize_answer.restype = ctypes.c_int
        lib.licv_vqa_consensus.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.licv_vqa_consensus.restype = None
        _lib = lib
    except OSError as e:
        logger.warning("native vqa_eval load failed: %s", e)
        _load_failed = True
    return _lib


def normalize_answer_native(text: str) -> Optional[str]:
    lib = get_lib()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(4 * len(text.encode()) + 16)
    lib.licv_normalize_answer(text.encode(), buf, len(buf))
    return buf.value.decode()


def consensus_native(
    preds: Sequence[str], gt_lists: Sequence[Sequence[str]]
) -> Optional[list[float]]:
    """Per-question consensus accuracies, or None if native path unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nq = len(preds)
    c_preds = (ctypes.c_char_p * nq)(*[p.encode() for p in preds])
    flat: list[bytes] = []
    offsets = [0]
    for gts in gt_lists:
        flat.extend(g.encode() for g in gts)
        offsets.append(len(flat))
    c_gts = (ctypes.c_char_p * len(flat))(*flat)
    c_off = (ctypes.c_int * (nq + 1))(*offsets)
    out = (ctypes.c_double * nq)()
    lib.licv_vqa_consensus(c_preds, c_gts, c_off, nq, out)
    return list(out)
