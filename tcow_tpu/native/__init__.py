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
        lib.gather_div_bits.restype = None
        lib.gather_div_bits.argtypes = [
            p(ctypes.c_uint8), i64, i64, i64, i64, i64,
            p(i64), p(i64), p(i64), i64, i64, i64,
            p(ctypes.c_uint8), p(ctypes.c_uint8), p(ctypes.c_uint8), p(i64)]
        lib.gather_segm_i16.restype = None
        lib.gather_segm_i16.argtypes = [
            p(ctypes.c_int16), i64, i64, i64,
            p(i64), p(i64), p(i64), i64, i64, i64, p(ctypes.c_int32)]
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


def gather_div_bits(packed: np.ndarray, K: int, t_map: np.ndarray, y_map: np.ndarray,
                    x_map: np.ndarray, want_kthw: bool = True, want_thwk: bool = False,
                    want_packw: bool = False, want_delta: bool = False):
    '''Fused frame-select/flip/crop/nearest-resize gather over bit-packed amodal masks.

    :param packed (Tv, H, W, KB) uint8: np.packbits(div, axis=-1) of the (Tv,H,W,K) masks.
    :param t_map/y_map/x_map int64 index maps (len Tc/h/w) composing the augmentation.
    :return (kthw (K,Tc,h,w) u8 | None, thwk (Tc,h,w,K) u8 | None,
             packw (K,Tc,h,w//8) u8 | None, delta (K,Tc) i64 | None) per the want_*
             flags, or None if the native library is unavailable (callers fall back to
             the numpy chain). delta[:, t] counts pixels differing between consecutive
             output frames (column 0 = 0); requires want_kthw.
    '''
    lib = get_lib()
    if lib is None:
        return None
    Tv, H, W, KB = packed.shape
    assert K <= KB * 8
    assert not (want_delta and not want_kthw)
    Tc, h, w = len(t_map), len(y_map), len(x_map)
    packed = np.ascontiguousarray(packed)
    t_map = np.ascontiguousarray(t_map, np.int64)
    y_map = np.ascontiguousarray(y_map, np.int64)
    x_map = np.ascontiguousarray(x_map, np.int64)
    kthw = np.empty((K, Tc, h, w), np.uint8) if want_kthw else None
    thwk = np.empty((Tc, h, w, K), np.uint8) if want_thwk else None
    packw = None
    if want_packw:
        assert w % 8 == 0, w
        packw = np.zeros((K, Tc, h, w // 8), np.uint8)  # kernel ORs set bits in
    delta = np.zeros((K, Tc), np.int64) if want_delta else None
    null = ctypes.POINTER(ctypes.c_uint8)()
    lib.gather_div_bits(
        _ptr(packed, ctypes.c_uint8), Tv, H, W, KB, K,
        _ptr(t_map, ctypes.c_int64), _ptr(y_map, ctypes.c_int64),
        _ptr(x_map, ctypes.c_int64), Tc, h, w,
        _ptr(kthw, ctypes.c_uint8) if kthw is not None else null,
        _ptr(thwk, ctypes.c_uint8) if thwk is not None else null,
        _ptr(packw, ctypes.c_uint8) if packw is not None else null,
        _ptr(delta, ctypes.c_int64) if delta is not None
        else ctypes.POINTER(ctypes.c_int64)())
    return kthw, thwk, packw, delta


def gather_segm_i16(segm: np.ndarray, t_map: np.ndarray, y_map: np.ndarray,
                    x_map: np.ndarray):
    '''(Tv,H,W) int16 visible-id map -> (Tc,h,w) int32 via the composed index maps,
    or None if unavailable.'''
    lib = get_lib()
    if lib is None:
        return None
    Tv, H, W = segm.shape
    segm = np.ascontiguousarray(segm, np.int16)
    t_map = np.ascontiguousarray(t_map, np.int64)
    y_map = np.ascontiguousarray(y_map, np.int64)
    x_map = np.ascontiguousarray(x_map, np.int64)
    out = np.empty((len(t_map), len(y_map), len(x_map)), np.int32)
    lib.gather_segm_i16(_ptr(segm, ctypes.c_int16), Tv, H, W,
                        _ptr(t_map, ctypes.c_int64), _ptr(y_map, ctypes.c_int64),
                        _ptr(x_map, ctypes.c_int64),
                        out.shape[0], out.shape[1], out.shape[2],
                        _ptr(out, ctypes.c_int32))
    return out


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
