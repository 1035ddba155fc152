"""ctypes wrapper + lazy builder for the C++ shard reader
(``native/trialtar.cpp``).

Gives the dataset an off-GIL, ordered, bounded-readahead stream of whole tar
blobs; Python parses members from memory. Falls back gracefully when a C++
toolchain is unavailable (callers check :func:`native_available`).
"""

from __future__ import annotations

import ctypes
import io
import subprocess
import tarfile
from pathlib import Path
from typing import Iterator, Optional, Sequence, Tuple

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "trialtar.cpp"
_LIB = _REPO / "native" / "build" / "libtrialtar.so"

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if not _LIB.exists() or _SRC.stat().st_mtime > _LIB.stat().st_mtime:
            _LIB.parent.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 str(_SRC), "-o", str(_LIB)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB))
        lib.vst_reader_create.restype = ctypes.c_void_p
        lib.vst_reader_create.argtypes = [ctypes.c_char_p, ctypes.c_char,
                                          ctypes.c_int, ctypes.c_int]
        lib.vst_reader_next_size.restype = ctypes.c_int64
        lib.vst_reader_next_size.argtypes = [ctypes.c_void_p,
                                             ctypes.POINTER(ctypes.c_int)]
        lib.vst_reader_next_copy.restype = ctypes.c_int
        lib.vst_reader_next_copy.argtypes = [ctypes.c_void_p,
                                             ctypes.c_char_p]
        lib.vst_reader_reset.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                         ctypes.c_char]
        lib.vst_reader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib
    except Exception:
        _build_failed = True
        return None


def native_available() -> bool:
    return _build() is not None


class NativeShardReader:
    """Ordered, threaded whole-tar blob stream over a list of shard paths."""

    SEP = "\n"

    def __init__(self, paths: Sequence[str], n_workers: int = 4,
                 capacity: int = 8):
        lib = _build()
        if lib is None:
            raise RuntimeError("native reader unavailable (g++ build failed)")
        self._lib = lib
        self._paths = list(paths)
        joined = self.SEP.join(self._paths).encode()
        self._handle = lib.vst_reader_create(
            joined, self.SEP.encode(), n_workers, capacity)
        if not self._handle:
            raise RuntimeError("vst_reader_create failed")
        self._closed = False

    def __iter__(self) -> Iterator[Tuple[str, bytes]]:
        lib = self._lib
        idx = ctypes.c_int(0)
        while True:
            size = lib.vst_reader_next_size(self._handle, ctypes.byref(idx))
            if size == 0:
                return
            if size < 0:
                # the C++ side marks unreadable/empty shards distinctly so a
                # deleted file mid-epoch raises here instead of silently
                # truncating the epoch at that position
                raise IOError(
                    f"native reader failed to read shard "
                    f"{self._paths[idx.value]!r}")
            buf = ctypes.create_string_buffer(size)
            rc = lib.vst_reader_next_copy(self._handle, buf)
            if rc != 0:
                return
            yield self._paths[idx.value], buf.raw

    def reset(self, paths: Sequence[str]) -> None:
        """Start a new epoch over (possibly reshuffled) paths."""
        self._paths = list(paths)
        joined = self.SEP.join(self._paths).encode()
        self._lib.vst_reader_reset(self._handle, joined, self.SEP.encode())

    def close(self) -> None:
        if not self._closed and self._handle:
            self._lib.vst_reader_destroy(self._handle)
            self._closed = True

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def parse_tar_blob(blob: bytes) -> dict:
    """Decode an in-memory trial tar blob into the sample dict
    (same contract as :func:`video_spike_tpu.data.tar_io.read_trial_tar`)."""
    import json
    import pickle

    import numpy as np

    out: dict = {}
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r") as tar:
        for member in tar.getmembers():
            if not member.isfile():
                continue
            data = tar.extractfile(member).read()
            parts = member.name.split(".")
            ext, mod = parts[-1], parts[-2] if len(parts) >= 2 else member.name
            out.setdefault("__key__", ".".join(parts[:-2]))
            if ext == "pyd":
                out[mod] = pickle.loads(data)
            elif ext == "json":
                out["meta"] = json.loads(data)
            elif ext == "npy":
                vid = np.load(io.BytesIO(data))
                out[mod] = vid[:, None, :, :]          # uint8 end-to-end
            elif ext == "mp4":
                from video_spike_tpu.data.tar_io import decode_mp4
                vid = decode_mp4(data)
                out[mod] = vid[:, None, :, :]
    if "__key__" in out:
        out["eid"] = out["__key__"].split("_")[0]
    return out
