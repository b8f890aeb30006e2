'''
Native (C++) host-preprocessing kernels, loaded via ctypes with lazy in-tree compilation.

The library is built on first use with g++ (cached next to the source); set TCOW_NO_NATIVE=1
to force the pure-numpy fallbacks in tcow_tpu.data.data_utils.
'''

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_SRC_DIR, 'preprocess.cpp')
_LIB = os.path.join(_SRC_DIR, 'libtcow_preprocess.so')
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _LIB + '.tmp']
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB + '.tmp', _LIB)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    '''Returns the loaded library, building it if needed; None when unavailable.'''
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if os.environ.get('TCOW_NO_NATIVE', '') == '1':
            _failed = True
            return None
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        i64 = ctypes.c_int64
        p = ctypes.POINTER
        lib.scene_overlap_stats.restype = ctypes.c_int
        lib.scene_overlap_stats.argtypes = [
            p(ctypes.c_int32), p(ctypes.c_uint8), i64, i64, i64, i64,
            p(ctypes.c_int64), p(ctypes.c_int64), p(ctypes.c_int64), p(ctypes.c_int64)]
        lib.paint_recon_segm.restype = None
        lib.paint_recon_segm.argtypes = [
            p(ctypes.c_uint8), p(ctypes.c_int32), i64, i64, i64, i64, p(ctypes.c_int32)]
        _lib = lib
        return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def scene_overlap_stats(segm: np.ndarray, div: np.ndarray):
    '''(T,H,W) int32 segm + (T,H,W,K) uint8 div ->
    (vis_cnt (T,K), tot_cnt (T,K), dd (T,K,K), dv (T,K,K)) int64, or None if unavailable.'''
    lib = get_lib()
    if lib is None:
        return None
    T, H, W, K = div.shape
    segm = np.ascontiguousarray(segm, np.int32)
    div = np.ascontiguousarray(div, np.uint8)
    vis = np.zeros((T, K), np.int64)
    tot = np.zeros((T, K), np.int64)
    dd = np.zeros((T, K, K), np.int64)
    dv = np.zeros((T, K, K), np.int64)
    rc = lib.scene_overlap_stats(
        _ptr(segm, ctypes.c_int32), _ptr(div, ctypes.c_uint8), T, H, W, K,
        _ptr(vis, ctypes.c_int64), _ptr(tot, ctypes.c_int64),
        _ptr(dd, ctypes.c_int64), _ptr(dv, ctypes.c_int64))
    if rc != 0:
        return None
    return vis, tot, dd, dv


def paint_recon_segm(div: np.ndarray, order: np.ndarray):
    '''(T,H,W,K) uint8 div + (T,K) int32 back-to-front order -> (T,H,W) int32, or None.'''
    lib = get_lib()
    if lib is None:
        return None
    T, H, W, K = div.shape
    div = np.ascontiguousarray(div, np.uint8)
    order = np.ascontiguousarray(order, np.int32)
    recon = np.zeros((T, H, W), np.int32)
    lib.paint_recon_segm(_ptr(div, ctypes.c_uint8), _ptr(order, ctypes.c_int32),
                         T, H, W, K, _ptr(recon, ctypes.c_int32))
    return recon
