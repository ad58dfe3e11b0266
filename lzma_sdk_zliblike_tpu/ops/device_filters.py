"""Batched branch/delta filters as device (XLA) ops.

The reference applies its branch converters one buffer at a time on the
CPU (``Bra.c``, ``Delta.c``); in the TPU pipeline whole *batches* of
folder outputs leave the decode kernel device-resident, so the
fixed-alignment converters run as vectorized lane ops before the D2H
fetch instead of as a host pass after it.

Implemented on device (bit-exact vs ``ops/filters.py``):

* ``arm``    — word-aligned BL rewrite (``Bra.c:6-31``)
* ``armt``   — Thumb BL pairs (``Bra.c:33-67``); the pair masks make
  consecutive candidates mutually exclusive, so it is exactly parallel
* ``ppc``    — BE bl rewrite (``Bra.c:69-97``)
* ``sparc``  — call rewrite (``Bra.c:99-133``)
* ``ia64``   — brl slot rewrite (``BraIA64.c:14-67``); slots are bitwise
  disjoint, u64 windows emulated with u32 pairs
* ``delta``  — distance-D byte delta (``Delta.c:20-62``): decode is a
  per-residue-class prefix sum (mod 256), encode a shifted subtract

Host-side only (position-sequential state the VPU cannot profitably
chase): x86 BCJ's 3-bit mask heuristic (``Bra86.c:11-85``) whose
mask/skip chain is a per-byte FSM, and BCJ2 (range coded).  The
scheduler routes those through ``ops/filters.py``.

All entry points take ``[S, L]`` uint8 batches with per-lane ``valid``
lengths and stream offsets ``ip``; lanes are independent streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


def _words_be(b):
    """[S, W, 4] uint8 -> [S, W] uint32 big-endian words."""
    b = b.astype(_U32)
    return (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]


def _unwords_be(w):
    return jnp.stack([(w >> 24) & 0xFF, (w >> 16) & 0xFF,
                      (w >> 8) & 0xFF, w & 0xFF], axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("encoding",))
def arm_convert_batch(data, valid, ip, *, encoding: bool):
    """ARM BL over [S, L] lanes (L % 4 == 0)."""
    S, L = data.shape
    w = data.reshape(S, L // 4, 4).astype(_U32)
    hit = w[..., 3] == 0xEB
    pos_in = jnp.arange(L // 4, dtype=_U32) << 2
    inword = (pos_in[None, :] + 4 <= valid[:, None].astype(_U32))
    hit = hit & inword
    dest = ((w[..., 2] << 16) | (w[..., 1] << 8) | w[..., 0]) << 2
    pos = pos_in[None, :] + ip[:, None].astype(_U32) + 8
    conv = jnp.where(encoding, dest + pos, dest - pos) >> 2
    out = jnp.where(hit[..., None],
                    jnp.stack([conv & 0xFF, (conv >> 8) & 0xFF,
                               (conv >> 16) & 0xFF, w[..., 3]], axis=-1),
                    w)
    return out.astype(jnp.uint8).reshape(S, L)


@functools.partial(jax.jit, static_argnames=("encoding",))
def ppc_convert_batch(data, valid, ip, *, encoding: bool):
    """PPC bl over [S, L] lanes (L % 4 == 0)."""
    S, L = data.shape
    b = data.reshape(S, L // 4, 4)
    w = _words_be(b)
    pos_in = jnp.arange(L // 4, dtype=_U32) << 2
    hit = (((b[..., 0] & 0xFC) == 0x48) & ((b[..., 3] & 0x3) == 1)
           & (pos_in[None, :] + 4 <= valid[:, None].astype(_U32)))
    dest = w & jnp.uint32(0x03FFFFFC)
    pos = pos_in[None, :] + ip[:, None].astype(_U32)
    conv = jnp.where(encoding, dest + pos, dest - pos)
    neww = (jnp.uint32(0x48000000) | (conv & 0x03FFFFFC)
            | (w & jnp.uint32(0x00000003)))
    out = _unwords_be(jnp.where(hit, neww, w))
    return out.reshape(S, L)


@functools.partial(jax.jit, static_argnames=("encoding",))
def sparc_convert_batch(data, valid, ip, *, encoding: bool):
    """SPARC call over [S, L] lanes (L % 4 == 0)."""
    S, L = data.shape
    b = data.reshape(S, L // 4, 4)
    w = _words_be(b)
    pos_in = jnp.arange(L // 4, dtype=_U32) << 2
    hit = ((((b[..., 0] == 0x40) & ((b[..., 1] & 0xC0) == 0))
            | ((b[..., 0] == 0x7F) & ((b[..., 1] & 0xC0) == 0xC0)))
           & (pos_in[None, :] + 4 <= valid[:, None].astype(_U32)))
    dest = w << 2
    pos = pos_in[None, :] + ip[:, None].astype(_U32)
    conv = jnp.where(encoding, dest + pos, dest - pos) >> 2
    # Bra.c:124 sign-replicates bit 22 over bits 22-29; only bits 0-21 survive
    conv = ((conv & jnp.uint32(0x003FFFFF)) | jnp.uint32(0x40000000)
            | jnp.where((conv & jnp.uint32(0x400000)) != 0,
                        jnp.uint32(0x3FC00000), jnp.uint32(0)))
    out = _unwords_be(jnp.where(hit, conv, w))
    return out.reshape(S, L)


@functools.partial(jax.jit, static_argnames=("encoding",))
def armt_convert_batch(data, valid, ip, *, encoding: bool):
    """ARM Thumb BL pairs over [S, L] lanes (Bra.c:33-67).

    Exactly parallel: a candidate halfword pair needs
    ``(b[2h+1] & 0xF8) == 0xF0`` and ``(b[2h+3] & 0xF8) == 0xF8`` — the
    same byte cannot satisfy both masks, so consecutive candidates are
    mutually exclusive and the reference's ``i += 2`` skip never fires;
    every candidate converts independently (and the rewritten bytes
    preserve the 0xF0/0xF8 marker bits, so the candidate set is
    write-stable).
    """
    S, L = data.shape
    H = L // 2
    hw = data[:, :H * 2].reshape(S, H, 2).astype(_U32)
    a0 = hw[:, :, 0]                # halfword low bytes
    a1 = hw[:, :, 1]                # halfword high bytes
    b0, b1 = a0[:, :-1], a1[:, :-1]     # hw h
    b2, b3 = a0[:, 1:], a1[:, 1:]       # hw h+1
    pos_in = jnp.arange(H - 1, dtype=_U32) << 1
    hit = (((b1 & 0xF8) == 0xF0) & ((b3 & 0xF8) == 0xF8)
           & (pos_in[None, :] + 4 <= valid[:, None].astype(_U32)))
    src = (((b1 & 0x7) << 19) | (b0 << 11) | ((b3 & 0x7) << 8) | b2) << 1
    pos = pos_in[None, :] + ip[:, None].astype(_U32) + 4
    dest = jnp.where(encoding, pos + src, src - pos) >> 1
    # hit[h] and hit[h+1] are disjoint, so the two write planes never
    # touch the same halfword column
    out0, out1 = a0, a1
    out0 = out0.at[:, :-1].set(jnp.where(hit, (dest >> 11) & 0xFF,
                                         out0[:, :-1]))
    out1 = out1.at[:, :-1].set(jnp.where(hit, 0xF0 | ((dest >> 19) & 0x7),
                                         out1[:, :-1]))
    out0 = out0.at[:, 1:].set(jnp.where(hit, dest & 0xFF, out0[:, 1:]))
    out1 = out1.at[:, 1:].set(jnp.where(hit, 0xF8 | ((dest >> 8) & 0x7),
                                        out1[:, 1:]))
    out = jnp.stack([out0, out1], axis=-1).astype(jnp.uint8)
    return out.reshape(S, H * 2)


# IA64 brl slot table: template -> 3-bit slot mask (BraIA64.c:5-12)
_IA64_BR_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     4, 4, 6, 6, 0, 0, 7, 7, 4, 4, 0, 0, 4, 4, 0, 0], np.int32)


@functools.partial(jax.jit, static_argnames=("encoding",))
def ia64_convert_batch(data, valid, ip, *, encoding: bool):
    """IA64 brl rewrite over [S, L] lanes (BraIA64.c:14-67).

    Stateless per 16-byte bundle; the three 41-bit slots are bitwise
    disjoint (the slot rewrite preserves bits outside its field), so
    bundles AND slots are fully parallel.  64-bit instruction windows are
    emulated with u32 pairs (lo32 of bytes 0-3, hi16 of bytes 4-5) since
    the device path runs without x64.
    """
    S, L = data.shape
    NB = L // 16
    b = data[:, :NB * 16].reshape(S, NB, 16).astype(_U32)
    tmpl_mask = jnp.take(jnp.asarray(_IA64_BR_TABLE), b[..., 0] & 0x1F)
    bundle_ok = ((jnp.arange(NB, dtype=_U32)[None, :] * 16 + 16)
                 <= valid[:, None].astype(_U32))
    pos = (jnp.arange(NB, dtype=_U32)[None, :] * 16
           + ip[:, None].astype(_U32))
    out = b
    for slot in range(3):
        bit_pos = 5 + slot * 41
        bp = bit_pos >> 3
        br = bit_pos & 7
        lo32 = (out[..., bp] | (out[..., bp + 1] << 8)
                | (out[..., bp + 2] << 16) | (out[..., bp + 3] << 24))
        hi16 = out[..., bp + 4] | (out[..., bp + 5] << 8)
        norm_lo = (lo32 >> br) | (hi16 << (32 - br))
        norm_hi = hi16 >> br
        is_brl = ((((norm_hi >> 5) & 0xF) == 0x5)
                  & (((norm_lo >> 9) & 0x7) == 0))
        hit = (((tmpl_mask >> slot) & 1) == 1) & is_brl & bundle_ok
        src = (((norm_lo >> 13) | (norm_hi << 19)) & 0xFFFFF) \
            | (((norm_hi >> 4) & 1) << 20)
        src = src << 4
        dest = jnp.where(encoding, pos + src, src - pos) >> 4
        nlo = (norm_lo & jnp.uint32(~np.uint32(0x7FFFF << 13))) \
            | ((dest & 0x7FFFF) << 13)
        nhi = (norm_hi & jnp.uint32(~np.uint32(0x11))) \
            | ((dest >> 19) & 1) | (((dest >> 20) & 1) << 4)
        new_lo32 = (lo32 & ((1 << br) - 1)) | (nlo << br)
        new_hi16 = ((nlo >> (32 - br)) | (nhi << br)) & 0xFFFF
        for j, val in ((0, new_lo32 & 0xFF), (1, (new_lo32 >> 8) & 0xFF),
                       (2, (new_lo32 >> 16) & 0xFF),
                       (3, (new_lo32 >> 24) & 0xFF),
                       (4, new_hi16 & 0xFF), (5, (new_hi16 >> 8) & 0xFF)):
            out = out.at[..., bp + j].set(
                jnp.where(hit, val, out[..., bp + j]))
    out = out.astype(jnp.uint8).reshape(S, NB * 16)
    if NB * 16 < L:
        out = jnp.concatenate([out, data[:, NB * 16:]], axis=1)
    return out


@functools.partial(jax.jit, static_argnames=("dist", "encoding"))
def delta_batch(data, valid, *, dist: int, encoding: bool):
    """Distance-``dist`` byte delta over [S, L] lanes.

    Decode (the hot direction): ``out[i] = data[i] + out[i - dist]`` is a
    prefix sum per residue class mod ``dist`` — reshape to
    ``[S, ceil(L/dist), dist]`` and cumsum along the middle axis (mod 256
    via uint8 wraparound).  Encode is the shifted subtract.
    """
    S, L = data.shape
    pad = (-L) % dist
    d = jnp.pad(data, ((0, 0), (0, pad)))
    cols = d.reshape(S, (L + pad) // dist, dist)
    if encoding:
        prev = jnp.pad(cols, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
        out = (cols - prev).astype(jnp.uint8)
    else:
        out = jnp.cumsum(cols, axis=1, dtype=jnp.uint32).astype(jnp.uint8)
    out = out.reshape(S, L + pad)[:, :L]
    # bytes at/after each lane's valid length are left untouched
    idx = jnp.arange(L)
    return jnp.where(idx[None, :] < valid[:, None], out, data)


# host-convenience single-buffer wrappers used by tests/benches ----------

_BATCHED = {"arm": arm_convert_batch, "armt": armt_convert_batch,
            "ppc": ppc_convert_batch, "sparc": sparc_convert_batch,
            "ia64": ia64_convert_batch}


def convert_batch(name: str, data: np.ndarray, valid: np.ndarray,
                  ip: np.ndarray, *, encoding: bool) -> np.ndarray:
    """Dispatch a named branch filter over an [S, L] batch (L padded %4)."""
    fn = _BATCHED[name]
    return np.asarray(fn(jnp.asarray(data), jnp.asarray(valid),
                         jnp.asarray(ip), encoding=encoding))
