"""ctypes bindings for the native IO library (native/vox_io.cc).

The training feeder's hot path -- seek into an ark, decode an FM/CM matrix
-- runs in C++ with the GIL released; pure-Python kaldi_io remains the
fallback (and the reference implementation for tests).  The library is
built on first use if a compiler is available (`make -C native/`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvox_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        # serialize across processes: cli.launch starts N ranks that all
        # reach get_lib() at once, and concurrent `make` runs would link
        # the same .so non-atomically (one rank could dlopen a half-written
        # file).  flock on a sidecar lets the first builder win and the
        # rest see the finished library.
        import fcntl

        lock_path = os.path.join(_NATIVE_DIR, ".build.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        return os.path.exists(_LIB_PATH)
    except Exception as e:
        if os.path.exists(_LIB_PATH):  # stale lib beats no lib -- but say so
            import warnings

            warnings.warn(
                f"native build failed ({e!r}); loading the existing "
                f"libvox_io.so, which may predate the current sources/ABI")
            return True
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable.

    make always runs (mtime-based, a no-op when fresh): a prebuilt .so
    older than the sources would otherwise silently present an old C ABI
    -- e.g. a pre-cmvn vox_feeder_create ignoring the two cmvn pointer
    args and training without global CMVN."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vox_read_mat.restype = ctypes.c_int
        lib.vox_read_mat.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.vox_read_vec.restype = ctypes.c_int
        lib.vox_read_vec.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.vox_read_wav.restype = ctypes.c_int
        lib.vox_read_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.vox_free.restype = None
        lib.vox_free.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "vox_render_spec"):
            lib.vox_render_spec.restype = ctypes.c_int
            lib.vox_render_spec.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
            ]
        if hasattr(lib, "vox_raw_feeder_create"):
            lib.vox_raw_feeder_create.restype = ctypes.c_void_p
            lib.vox_raw_feeder_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_uint64, ctypes.c_int32,
            ]
            lib.vox_raw_feeder_next.restype = ctypes.c_int
            lib.vox_raw_feeder_next.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.vox_raw_feeder_errors.restype = ctypes.c_int64
            lib.vox_raw_feeder_errors.argtypes = [ctypes.c_void_p]
            lib.vox_raw_feeder_dead_workers.restype = ctypes.c_int32
            lib.vox_raw_feeder_dead_workers.argtypes = [ctypes.c_void_p]
            lib.vox_raw_feeder_stop.restype = None
            lib.vox_raw_feeder_stop.argtypes = [ctypes.c_void_p]
            lib.vox_raw_feeder_destroy.restype = None
            lib.vox_raw_feeder_destroy.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "vox_feeder_create"):
            lib.vox_feeder_create.restype = ctypes.c_void_p
            lib.vox_feeder_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),   # cmvn_mean (nullable)
                ctypes.POINTER(ctypes.c_float),   # cmvn_std (nullable)
            ]
            lib.vox_feeder_next.restype = ctypes.c_int
            lib.vox_feeder_next.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.vox_feeder_errors.restype = ctypes.c_int64
            lib.vox_feeder_errors.argtypes = [ctypes.c_void_p]
            if hasattr(lib, "vox_feeder_dead_workers"):
                lib.vox_feeder_dead_workers.restype = ctypes.c_int32
                lib.vox_feeder_dead_workers.argtypes = [ctypes.c_void_p]
            lib.vox_feeder_stop.restype = None
            lib.vox_feeder_stop.argtypes = [ctypes.c_void_p]
            lib.vox_feeder_destroy.restype = None
            lib.vox_feeder_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _take(lib, ptr, shape) -> np.ndarray:
    """Copy a malloc'd C buffer into numpy and free it."""
    n = int(np.prod(shape))
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).reshape(shape).copy()
    lib.vox_free(ptr)
    return arr


def read_mat(path: str, offset: int = 0) -> np.ndarray:
    """Binary FM/DM/CM matrix at an ark byte offset -> (rows, cols) float32."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    out = ctypes.POINTER(ctypes.c_float)()
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    rc = lib.vox_read_mat(path.encode(), offset,
                          ctypes.byref(out), ctypes.byref(rows),
                          ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"vox_read_mat({path}:{offset}) failed: {rc}")
    return _take(lib, out, (rows.value, cols.value))


def read_vec(path: str, offset: int = 0) -> np.ndarray:
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int32()
    rc = lib.vox_read_vec(path.encode(), offset, ctypes.byref(out),
                          ctypes.byref(n))
    if rc != 0:
        raise IOError(f"vox_read_vec({path}:{offset}) failed: {rc}")
    return _take(lib, out, (n.value,))


class _NativeFeederBase:
    """Shared Python lifecycle for the C feeder handles (both feeders use
    the same feeder_core.h protocol): serialized next/destroy via
    ``_io_lock``, stop-outside-the-lock close, iterator protocol, health
    getters.  Subclasses set ``_prefix`` (the C symbol family) and
    implement ``_alloc() -> (c_args, result)``."""

    _prefix: str

    def _init_handle(self, lib, handle):
        assert handle, f"{self._prefix}_create failed"
        self._lib = lib
        self._handle = handle
        # serializes in-flight get() against close(): destroy must never
        # free the C++ object while another thread (e.g. the training
        # loop's device_prefetch worker) is blocked inside _next
        self._io_lock = threading.Lock()

    def _fn(self, name):
        return getattr(self._lib, f"{self._prefix}_{name}")

    def start(self):
        return self  # workers start in the C create call

    def get(self, timeout=None):
        c_args, result = self._alloc()
        with self._io_lock:
            if self._handle is None:
                raise StopIteration
            rc = self._fn("next")(self._handle, *c_args)
            if rc == -2:  # every worker's shard is dead -- fail loudly
                n = int(self._fn("errors")(self._handle))
                raise IOError(
                    f"native feeder: every shard failed to decode "
                    f"({n} errors) -- {self._dead_hint}")
        if rc != 0:
            raise StopIteration
        return result

    def __iter__(self):
        while True:
            try:
                yield self.get()
            except StopIteration:
                return

    def decode_errors(self) -> int:
        if self._handle is None:  # after close(): no handle to query
            return 0
        return int(self._fn("errors")(self._handle))

    def dead_shards(self) -> int:
        """Worker shards that produced zero samples over a full pass (one
        corrupt shard = that fraction of the data silently gone).  The
        training loop fails loudly on a non-zero value."""
        if self._handle is None or not hasattr(
                self._lib, f"{self._prefix}_dead_workers"):
            return 0
        return int(self._fn("dead_workers")(self._handle))

    def stop(self):
        if self._handle:
            self._fn("stop")(self._handle)

    def close(self):
        if self._handle:
            # stop OUTSIDE the lock: it unblocks any get() waiting inside
            # the C next call, which then releases _io_lock for us
            self._fn("stop")(self._handle)
            with self._io_lock:
                if self._handle:
                    self._fn("destroy")(self._handle)
                    self._handle = None

    def __del__(self):
        # swallow-everything is deliberate and scoped to finalization:
        # __del__ runs during interpreter teardown where modules/ctypes may
        # already be gone, and raising there aborts with an unraisable
        # warning.  Explicit close()/stop() calls raise normally.
        try:
            self.close()
        except Exception:
            pass


class NativeBatchFeeder(_NativeFeederBase):
    """Whole-hot-loop C++ feeder (native/vox_feeder.cc): ark decode, sliding
    CMN, crop/pad, batch assembly, and bf16 wire quantization all run in a
    native thread pool; each ``next()`` is ONE ctypes call (GIL released)
    that fills caller-owned numpy buffers.

    Drop-in for ``data.dataset.BatchFeeder`` over precomputed-feature scp
    shards (the semantics it mirrors live in dataset.py and are the Python
    reference implementation for the parity tests).  The reference gets the
    same effect from 4 feeder *processes* per rank
    (ref tf_train_tdnn.py:151-164); here threads suffice because no Python
    runs per utterance.
    """

    _prefix = "vox_feeder"
    _dead_hint = "feat_dim mismatch or corrupt arks?"

    def __init__(
        self,
        scp_paths,
        utt2id,
        feat_dim: int,
        feat_length: int,
        batch_size: int,
        num_accumulation_steps: int = 1,
        num_threads: Optional[int] = None,
        seed: int = 0,
        sliding_cmn: bool = True,
        cmn_window: int = 300,
        skip_percent: int = 10,
        wire_bf16: bool = False,
        cmvn_pkl: Optional[str] = None,
    ):
        lib = get_lib()
        assert lib is not None and hasattr(lib, "vox_feeder_create"), \
            "native feeder unavailable (build native/libvox_io.so)"
        from . import kaldi_io

        if isinstance(scp_paths, str):
            scp_paths = [scp_paths]
        paths, offsets, labels = [], [], []
        for scp in scp_paths:
            for key, rxfile in kaldi_io._iter_scp(scp):
                split = kaldi_io._split_rxfile(rxfile)
                if split is None:
                    raise ValueError(
                        f"native feeder needs plain path:offset scp entries, "
                        f"got {rxfile!r} (use the Python BatchFeeder for "
                        f"piped rspecs)")
                paths.append(split[0].encode())
                offsets.append(split[1])
                labels.append(int(utt2id[key]) if utt2id else 0)
        n = len(paths)
        assert n > 0, "empty scp"
        c_paths = (ctypes.c_char_p * n)(*paths)
        c_offs = (ctypes.c_int64 * n)(*offsets)
        c_labels = (ctypes.c_int32 * n)(*labels)
        self._lib = lib
        self.a, self.b = num_accumulation_steps, batch_size
        self.t, self.f = feat_length, feat_dim
        self.wire_bf16 = wire_bf16
        if wire_bf16:
            import ml_dtypes

            self._out_dtype = np.dtype(ml_dtypes.bfloat16)
        else:
            self._out_dtype = np.dtype(np.float32)
        c_mean = c_std = None
        if cmvn_pkl:
            # ABI guard: a stale prebuilt .so without the cmvn args would
            # silently ignore the trailing pointers (x86-64 calling
            # convention) and train WITHOUT global CMVN.  dead_workers
            # shipped in the same revision as the cmvn ABI.
            assert hasattr(lib, "vox_feeder_dead_workers"), \
                "native library predates the cmvn ABI; rebuild native/"
            # global CMVN pickle (ref tf_train_tdnn.py:91, tf_data.py:80-81):
            # (mean, std) applied after sliding CMN, like FeatureShardDataset
            import pickle

            with open(cmvn_pkl, "rb") as f:
                mean, std = pickle.load(f)

            def as_row(x, what):
                # accept (F,), (1, F) keepdims, or scalar, like the Python
                # path's broadcasting `(feat - mean) / std`
                x = np.asarray(x, np.float32).reshape(-1)
                if x.size == 1:
                    x = np.full(feat_dim, x[0], np.float32)
                assert x.size == feat_dim, \
                    f"cmvn {what} has {x.size} dims, features have {feat_dim}"
                return np.ascontiguousarray(x)

            mean, std = as_row(mean, "mean"), as_row(std, "std")
            self._cmvn_arrays = (mean, std)  # keep alive past create
            as_fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            c_mean, c_std = as_fp(mean), as_fp(std)
        from ..utils import resolve_num_workers
        num_threads = resolve_num_workers(num_threads)
        self._init_handle(lib, lib.vox_feeder_create(
            c_paths, c_offs, c_labels, n, feat_dim, feat_length,
            batch_size, num_accumulation_steps, num_threads, seed,
            cmn_window if sliding_cmn else 0, skip_percent,
            1 if wire_bf16 else 0, c_mean, c_std))

    def _alloc(self):
        # fresh buffers per batch: the training loop's device prefetch may
        # still hold the previous batch
        feats = np.empty((self.a, self.b, self.t, self.f), self._out_dtype)
        labels = np.empty((self.a, self.b), np.int32)
        return ((feats.ctypes.data_as(ctypes.c_void_p),
                 labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))),
                (feats, labels))


def render_spec(rxwav: str) -> Tuple[np.ndarray, int]:
    """Render one wav.scp value (plain path or JSON augmentation spec) via
    the C++ implementation (native/vox_raw.cc) -- the native counterpart of
    data.augment.load_utterance, parity-tested against it."""
    lib = get_lib()
    assert lib is not None and hasattr(lib, "vox_render_spec"), \
        "native raw renderer unavailable"
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.vox_render_spec(rxwav.encode(), ctypes.byref(out),
                             ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        raise IOError(f"vox_render_spec failed ({rc}): {rxwav[:120]!r}")
    return _take(lib, out, (n.value,)), sr.value


class NativeRawBatchFeeder(_NativeFeederBase):
    """Whole raw-audio host hot loop in C++ (native/vox_raw.cc): wav decode,
    online augmentation-spec rendering (FFT reverb + SNR mixing), int16
    crop with CMVN context, batch assembly -- one ctypes call per optimizer
    step (GIL released).  Drop-in for BatchFeeder over RawAudioShardDataset
    sources (data/raw_dataset.py, the Python reference implementation);
    batches come out as the ((waves, num_samples, target_offset, pad_shift),
    labels) tuple ops/pipeline.py:waveform_to_features consumes."""

    _prefix = "vox_raw_feeder"
    _dead_hint = "bad wav paths or malformed specs?"

    def __init__(
        self,
        wav_scp,
        utt2id,
        feat_length: int,
        batch_size: int,
        num_accumulation_steps: int = 1,
        *,
        cfg=None,
        context: int = 150,
        num_threads: Optional[int] = None,
        seed: int = 0,
        skip_percent: int = 10,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        lib = get_lib()
        assert lib is not None and hasattr(lib, "vox_raw_feeder_create"), \
            "native raw feeder unavailable (build native/libvox_io.so)"
        from ..ops.fbank import FbankConfig
        from ..ops.pipeline import max_crop_samples
        from ..utils import datadir

        cfg = cfg or FbankConfig()
        entries = list(datadir.read_two_column(wav_scp).items())
        entries = entries[shard_index::num_shards]
        assert entries, (wav_scp, shard_index, num_shards)
        rxwavs = [v.encode() for _, v in entries]
        labels = [int(utt2id[k]) if utt2id else 0 for k, _ in entries]
        n = len(entries)
        c_rx = (ctypes.c_char_p * n)(*rxwavs)
        c_labels = (ctypes.c_int32 * n)(*labels)
        self.a, self.b = num_accumulation_steps, batch_size
        self.max_samples = max_crop_samples(feat_length, context, cfg)
        from ..utils import resolve_num_workers
        num_threads = resolve_num_workers(num_threads)
        self._init_handle(lib, lib.vox_raw_feeder_create(
            c_rx, c_labels, n, feat_length, context,
            cfg.frame_shift, cfg.frame_length,
            batch_size, num_accumulation_steps, num_threads, seed,
            skip_percent))

    def _alloc(self):
        a, b, s = self.a, self.b, self.max_samples
        waves = np.empty((a, b, s), np.int16)
        ns = np.empty((a, b), np.int32)
        off = np.empty((a, b), np.int32)
        shift = np.empty((a, b), np.int32)
        labels = np.empty((a, b), np.int32)
        as_i32 = lambda x: x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        return ((waves.ctypes.data_as(ctypes.c_void_p),
                 as_i32(ns), as_i32(off), as_i32(shift), as_i32(labels)),
                ((waves, ns, off, shift), labels))


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """16-bit PCM wav -> (float32 samples in int16 scale, sample_rate)."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.vox_read_wav(path.encode(), ctypes.byref(out), ctypes.byref(n),
                          ctypes.byref(sr))
    if rc != 0:
        raise IOError(f"vox_read_wav({path}) failed: {rc}")
    return _take(lib, out, (n.value,)), sr.value
