"""ctypes bindings for the native host-sampling library.

Auto-builds `libopenrec_sampler.so` from sampler.cpp with g++ on first use
(cached next to the source). Everything degrades to the numpy paths when a
compiler isn't available or OPENREC_TPU_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sampler.cpp")
_LIB_PATH = os.path.join(_HERE, "libopenrec_sampler.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    # -march=native when the toolchain supports it (portability: some
    # compilers/targets reject it — retry generic before giving up).
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(base[:2] + ["-march=native"] + base[2:],
                       check=True, capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(base, check=True, capture_output=True)


def load():
    """Returns the ctypes library or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("OPENREC_TPU_NO_NATIVE") == "1":
            return None
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH)
                    < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            return None

        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

        lib.is_positive_batch.argtypes = [
            i64p, ctypes.c_int64, i64p, i64p, ctypes.c_int64,
            ctypes.c_int64, u8p]
        lib.sample_negatives.argtypes = [
            i64p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int32, i32p]
        lib.pairwise_join_and_negatives.argtypes = [
            i64p, ctypes.c_int64, i32p, i32p, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_int32,
            i32p, i32p, i32p]
        lib.build_hash_table.argtypes = [
            i64p, ctypes.c_int64, i64p, ctypes.c_int64]
        lib.sample_negatives_hash.argtypes = [
            i64p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int32, i32p]
        lib.pairwise_join_and_negatives_hash.argtypes = [
            i64p, ctypes.c_int64, i32p, i32p, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_int32,
            i32p, i32p, i32p]
        lib.pairwise_join_and_negatives_hash_mt.argtypes = [
            i64p, ctypes.c_int64, i32p, i32p, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_int32,
            ctypes.c_int32, i32p, i32p, i32p]
        lib.shuffle_pairs.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_uint64]
        lib.pairwise_negatives_seq.argtypes = [
            i64p, ctypes.c_int64, i32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int32, ctypes.c_int32, i32p]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.stratified_pointwise_hash.argtypes = [
            i64p, ctypes.c_int64, i32p, i32p, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int32, i32p, i32p, f32p]
        _lib = lib
        return _lib


def build_hash_table(pos_keys: np.ndarray) -> np.ndarray:
    """Open-addressing table (int64, EMPTY=-1) for O(1) membership."""
    lib = load()
    assert lib is not None
    n = len(pos_keys)
    capacity = 1
    while capacity < max(2 * n, 8):
        capacity <<= 1
    table = np.full(capacity, -1, dtype=np.int64)
    lib.build_hash_table(np.ascontiguousarray(pos_keys, np.int64), n,
                         table, capacity)
    return table


def available() -> bool:
    return load() is not None


def sample_negatives(pos_keys: np.ndarray, users: np.ndarray,
                     total_items: int, seed: int,
                     max_rounds: int = 64) -> np.ndarray:
    lib = load()
    assert lib is not None
    users = np.ascontiguousarray(users, dtype=np.int64)
    out = np.empty(len(users), dtype=np.int32)
    lib.sample_negatives(pos_keys, len(pos_keys), users, len(users),
                         total_items, seed & (2 ** 64 - 1), max_rounds,
                         out)
    return out


def is_positive(pos_keys: np.ndarray, users: np.ndarray,
                items: np.ndarray, total_items: int) -> np.ndarray:
    lib = load()
    assert lib is not None
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    out = np.empty(len(users), dtype=np.uint8)
    lib.is_positive_batch(pos_keys, len(pos_keys), users, items,
                          len(users), total_items, out)
    return out.astype(bool)


def pairwise_batch(pos_keys: np.ndarray, rec_users: np.ndarray,
                   rec_items: np.ndarray, record_idx: np.ndarray,
                   total_items: int, seed: int,
                   max_rounds: int = 64):
    lib = load()
    assert lib is not None
    b = len(record_idx)
    record_idx = np.ascontiguousarray(record_idx, dtype=np.int64)
    out_u = np.empty(b, dtype=np.int32)
    out_p = np.empty(b, dtype=np.int32)
    out_n = np.empty(b, dtype=np.int32)
    lib.pairwise_join_and_negatives(
        pos_keys, len(pos_keys), rec_users, rec_items, record_idx, b,
        total_items, seed & (2 ** 64 - 1), max_rounds, out_u, out_p, out_n)
    return out_u, out_p, out_n


def stratified_pointwise_batch_hash(
        hash_table: np.ndarray, rec_users: np.ndarray,
        rec_items: np.ndarray, record_idx: np.ndarray, n_neg: int,
        total_users: int, total_items: int, seed: int,
        max_rounds: int = 64):
    """Single-pass stratified pointwise batch: len(record_idx) positives
    followed by n_neg rejected uniform negatives."""
    lib = load()
    assert lib is not None
    n_pos = len(record_idx)
    b = n_pos + int(n_neg)
    record_idx = np.ascontiguousarray(record_idx, dtype=np.int64)
    out_u = np.empty(b, dtype=np.int32)
    out_i = np.empty(b, dtype=np.int32)
    out_l = np.empty(b, dtype=np.float32)
    lib.stratified_pointwise_hash(
        hash_table, len(hash_table), rec_users, rec_items, record_idx,
        n_pos, int(n_neg), total_users, total_items, seed & (2 ** 64 - 1),
        max_rounds, out_u, out_i, out_l)
    return out_u, out_i, out_l


def shuffle_pairs(users: np.ndarray, items: np.ndarray, seed: int):
    """In-place Fisher-Yates co-shuffle of aligned int32 arrays (the
    epoch permutation, applied to the records themselves so batch windows
    read sequentially)."""
    lib = load()
    assert lib is not None
    assert users.flags.c_contiguous and items.flags.c_contiguous
    lib.shuffle_pairs(users, items, len(users), seed & (2 ** 64 - 1))


def pairwise_negatives_seq(hash_table: np.ndarray, users: np.ndarray,
                           total_items: int, seed: int,
                           max_rounds: int = 64,
                           threads: int = None) -> np.ndarray:
    """One rejected uniform negative per user of a SEQUENTIAL window —
    the block-prefetched fast path (sampler.cpp negatives_seq_range)."""
    if threads is None:
        threads = int(os.environ.get("OPENREC_TPU_SAMPLER_THREADS", "1"))
    lib = load()
    assert lib is not None
    users = np.ascontiguousarray(users, dtype=np.int32)
    out = np.empty(len(users), dtype=np.int32)
    lib.pairwise_negatives_seq(hash_table, len(hash_table), users,
                               len(users), total_items,
                               seed & (2 ** 64 - 1), max_rounds, threads,
                               out)
    return out


def pairwise_batch_hash(hash_table: np.ndarray, rec_users: np.ndarray,
                        rec_items: np.ndarray, record_idx: np.ndarray,
                        total_items: int, seed: int,
                        max_rounds: int = 64, threads: int = None):
    """threads=None: single-threaded (the Prefetcher's worker threads are
    the parallelism level on small hosts); set OPENREC_TPU_SAMPLER_THREADS
    or pass explicitly on many-core hosts."""
    if threads is None:
        threads = int(os.environ.get("OPENREC_TPU_SAMPLER_THREADS", "1"))
    lib = load()
    assert lib is not None
    b = len(record_idx)
    record_idx = np.ascontiguousarray(record_idx, dtype=np.int64)
    out_u = np.empty(b, dtype=np.int32)
    out_p = np.empty(b, dtype=np.int32)
    out_n = np.empty(b, dtype=np.int32)
    lib.pairwise_join_and_negatives_hash_mt(
        hash_table, len(hash_table), rec_users, rec_items, record_idx, b,
        total_items, seed & (2 ** 64 - 1), max_rounds, threads,
        out_u, out_p, out_n)
    return out_u, out_p, out_n
