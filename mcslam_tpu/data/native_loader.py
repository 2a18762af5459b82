"""ctypes bindings for the native C++ image loader (native/loader.cpp).

The native runtime half of the data pipeline: decode threads + bounded
in-order prefetch ring, mirroring the reference's C++ reader/producer
threads (RosbagParser producer + per-camera capture threads). Falls back to
the pure-Python readers when the shared library is missing; `build()`
compiles it with g++ if a toolchain is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent.parent / "native" / "libmcloader.so"
_SRC_DIR = Path(__file__).parent.parent.parent / "native"


def build(force: bool = False) -> bool:
    """Compile the native loader from source. Returns availability.

    The .so is NOT committed; `make` owns the staleness check (rebuilds
    whenever loader.cpp is newer than the library), so source edits are
    always picked up. An existing library is only trusted when no
    toolchain/source is available to rebuild it.
    """
    src = _SRC_DIR / "loader.cpp"
    if not src.exists():
        return _LIB_PATH.exists()
    try:
        cmd = ["make", "-C", str(_SRC_DIR)]
        if force:
            cmd.insert(1, "-B")
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return _LIB_PATH.exists() and not force
    return _LIB_PATH.exists()


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not build():
        raise OSError("native loader unavailable (libmcloader.so missing)")
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_next.restype = ctypes.c_long
    lib.loader_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float)]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.probe_image.restype = ctypes.c_int
    lib.probe_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mcraw_write.restype = ctypes.c_int
    lib.mcraw_write.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.mcraw_open.restype = ctypes.c_void_p
    lib.mcraw_open.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mcraw_read.restype = ctypes.c_int
    lib.mcraw_read.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
    ]
    lib.mcraw_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def probe_image(path) -> tuple[int, int]:
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.probe_image(str(path).encode(), ctypes.byref(w), ctypes.byref(h)):
        raise IOError(f"cannot decode {path}")
    return w.value, h.value


class NativePrefetchReader:
    """Reader with the DatasetReaderBase contract backed by the C++ decode
    ring. `rows` is a list of (timestamp, [paths per camera])."""

    def __init__(self, rows, depth: int = 4, threads: int = 2):
        if not rows:
            raise ValueError("empty dataset")
        self.rows = rows
        self.n_cams = len(rows[0][1])
        w, h = probe_image(rows[0][1][0])
        self.width, self.height = w, h
        lib = _load()
        flat = []
        for _, group in rows:
            flat.extend(str(p).encode() for p in group)
        arr = (ctypes.c_char_p * len(flat))(*flat)
        self._keepalive = (arr, flat)
        self._h = lib.loader_create(
            arr, len(rows), self.n_cams, w, h, depth, threads
        )
        self._lib = lib
        self._buf = np.empty((self.n_cams, h, w), np.float32)
        self._done = False

    def __len__(self):
        return len(self.rows)

    def get_next(self):
        if self._done:
            return None
        idx = self._lib.loader_next(
            self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if idx < 0:
            self._done = True
            if idx == -2:
                raise IOError("native decode failure")
            return None
        return self._buf.copy(), float(self.rows[idx][0])

    def close(self):
        if self._h:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 - interpreter shutdown
            pass


def folder_reader(root, cam_dirs=None, depth: int = 4, threads: int = 2):
    """Build a NativePrefetchReader from an image-folder dataset (same
    layout rules as readers.ImageFolderReader)."""
    from mcslam_tpu.data.readers import ImageFolderReader

    idx = ImageFolderReader(root, cam_dirs)
    return NativePrefetchReader(idx.rows, depth=depth, threads=threads)


# ---- MCRAW: decode-free mmap replay container ------------------------------


def mcraw_write(path, frames: np.ndarray, timestamps=None) -> None:
    """Write an MCRAW container. frames: (F, C, H, W) uint8 (or float in
    [0, 1], quantized). Timestamps (seconds) go to a <path>.ts.npy sidecar."""
    lib = _load()
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = np.clip(frames * 255.0 + 0.5, 0, 255).astype(np.uint8)
    frames = np.ascontiguousarray(frames)
    F, C, H, W = frames.shape
    rc = lib.mcraw_write(
        str(path).encode(), F, C, H, W,
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"mcraw_write failed for {path}")
    if timestamps is not None:
        np.save(str(path) + ".ts.npy", np.asarray(timestamps, np.float64))


class McrawReader:
    """DatasetReaderBase-contract reader over an MCRAW container: the
    session's frames mmap'd as raw bytes — replay pays a u8->f32 convert,
    never a PNG/JPEG decode. Timestamps come from the <path>.ts.npy
    sidecar when present, else `fps`."""

    def __init__(self, path, fps: float = 20.0):
        lib = _load()
        nf = ctypes.c_long()
        nc = ctypes.c_int()
        h = ctypes.c_int()
        w = ctypes.c_int()
        self._h = lib.mcraw_open(
            str(path).encode(), ctypes.byref(nf), ctypes.byref(nc),
            ctypes.byref(h), ctypes.byref(w),
        )
        if not self._h:
            raise IOError(f"cannot open MCRAW container {path}")
        self._lib = lib
        self.n_frames = int(nf.value)
        self.n_cams = int(nc.value)
        self.height, self.width = int(h.value), int(w.value)
        import os

        ts_path = str(path) + ".ts.npy"
        self.timestamps = (
            np.load(ts_path) if os.path.exists(ts_path)
            else np.arange(self.n_frames) / fps
        )
        self._buf = np.empty((self.n_cams, self.height, self.width),
                             np.float32)
        self._idx = 0

    def __len__(self):
        return self.n_frames

    def get_next(self):
        if self._idx >= self.n_frames:
            return None
        rc = self._lib.mcraw_read(
            self._h, self._idx,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"mcraw_read({self._idx}) failed")
        t = float(self.timestamps[self._idx])
        self._idx += 1
        return self._buf.copy(), t

    def close(self):
        if self._h:
            self._lib.mcraw_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 - interpreter shutdown
            pass
