"""Batched branch/delta filters as device (XLA) ops.

The reference applies its branch converters one buffer at a time on the
CPU (``Bra.c``, ``Delta.c``); in the TPU pipeline whole *batches* of
folder outputs leave the decode kernel device-resident, so the
fixed-alignment converters run as vectorized lane ops before the D2H
fetch instead of as a host pass after it.

Implemented on device (bit-exact vs ``ops/filters.py``):

* ``arm``    — word-aligned BL rewrite (``Bra.c:6-31``)
* ``ppc``    — BE bl rewrite (``Bra.c:69-97``)
* ``sparc``  — call rewrite (``Bra.c:99-133``)
* ``delta``  — distance-D byte delta (``Delta.c:20-62``): decode is a
  per-residue-class prefix sum (mod 256), encode a shifted subtract

Host-side only (position-sequential state the VPU cannot profitably
chase): x86 BCJ's 3-bit mask heuristic (``Bra86.c:11-85``), ARMT's
4-byte pair consume rule, IA64's 48-bit slot fields, and BCJ2 (range
coded).  The scheduler routes those through ``ops/filters.py``.

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

_BATCHED = {"arm": arm_convert_batch, "ppc": ppc_convert_batch,
            "sparc": sparc_convert_batch}


def convert_batch(name: str, data: np.ndarray, valid: np.ndarray,
                  ip: np.ndarray, *, encoding: bool) -> np.ndarray:
    """Dispatch a named branch filter over an [S, L] batch (L padded %4)."""
    fn = _BATCHED[name]
    return np.asarray(fn(jnp.asarray(data), jnp.asarray(valid),
                         jnp.asarray(ip), encoding=encoding))
