"""Vectorized (NumPy) MD5 over N variable-length byte spans.

Kernel for the MinHash signature pass (operators/dedup.py,
guide §4.2 "do the heavy lifting in native code inside the UDF"): the
per-(doc, shingle) md5 digests are the measured critical-path cost of
``dedup_minhash_lsh`` (r15 stage decomposition: the +signatures stage was
7.36 s of the 11.26 s sf1 wall). This module computes the SAME digests —
md5 is md5, so bit-exactness is by definition of the algorithm, pinned
against hashlib in tests/test_portable_properties.py — but batched:
the 64-round MD5 compression runs as ~500 NumPy array ops over ALL
messages of a batch at once instead of one JVM expression call per row.
Measured single-thread throughput ~1.9M digests/s vs ~0.4M/s for a
hashlib-per-row loop (loaded box; ratios stable).

The public entry point hashes *spans of a shared byte buffer* (start/end
offset arrays), because the callers' messages — shingles — are byte
spans of the original document text: n consecutive tokens joined by
single spaces are exactly the bytes between the first token's start and
the last token's end (split on a literal single space reproduces the
document bytes, empty tokens included; 0x20 never occurs inside a
multi-byte UTF-8 sequence, so byte positions == character positions for
the space delimiter). No message is ever materialized as a Python
string.

Lane extraction matches functions/portable.py::portable_hash64_lane:
  lane0 = int(md5_hex[0:15], 16)  == big-endian uint64(digest[0:8])  >> 4
  lane1 = int(md5_hex[16:31], 16) == big-endian uint64(digest[8:16]) >> 4
Both are 60-bit non-negative values — exact in int64.

Memory bounds: the padded block buffer is built in sub-chunks of at most
``_CHUNK_PAD_BYTES`` (per message: its padded MD5 length, i.e.
len+prefix+9 rounded up to 64), and messages needing more than
``_SMALL_MAX_BLOCKS`` blocks are processed in their own sub-pass so one
long token cannot inflate the (rows x max_blocks) buffer of its
neighbors. State updates per extra block are masked, so multi-block and
single-block messages mix correctly within a pass.
"""

from __future__ import annotations

import numpy as np

# --- MD5 constants (RFC 1321) ---------------------------------------------
_K = np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * (2.0**32)).astype(
    np.uint64
).astype(np.uint32)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.int64,
)
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)
_INIT_A = np.uint32(0x67452301)
_INIT_B = np.uint32(0xEFCDAB89)
_INIT_C = np.uint32(0x98BADCFE)
_INIT_D = np.uint32(0x10325476)

# A message of B padded blocks costs B*64 bytes of buffer; cap one
# compression pass at ~32 MB of buffer and keep the common single-block
# path from sharing a buffer with rare long messages.
_CHUNK_PAD_BYTES = 32 * 1024 * 1024
_SMALL_MAX_BLOCKS = 4


def _md5_core(buf: np.ndarray, nblocks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """MD5 of each row of a padded block buffer -> (lane0, lane1) int64.

    buf: (n, maxb*64) uint8, each row MD5-padded within its own first
    ``nblocks[row]`` blocks; trailing blocks are ignored via masking.
    """
    n = buf.shape[0]
    maxb = buf.shape[1] // 64
    words = buf.reshape(n, maxb, 16, 4)
    # little-endian uint32 message words
    m_all = (
        words[..., 0].astype(np.uint32)
        | (words[..., 1].astype(np.uint32) << np.uint32(8))
        | (words[..., 2].astype(np.uint32) << np.uint32(16))
        | (words[..., 3].astype(np.uint32) << np.uint32(24))
    )
    A = np.full(n, _INIT_A, dtype=np.uint32)
    B = np.full(n, _INIT_B, dtype=np.uint32)
    C = np.full(n, _INIT_C, dtype=np.uint32)
    D = np.full(n, _INIT_D, dtype=np.uint32)
    for blk in range(maxb):
        m = m_all[:, blk, :]
        a, b, c, d = A.copy(), B.copy(), C.copy(), D.copy()
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
            elif i < 32:
                f = (d & b) | (~d & c)
            elif i < 48:
                f = b ^ c ^ d
            else:
                f = c ^ (b | ~d)
            f = f + a + _K[i] + m[:, _G[i]]
            a = d
            d = c
            c = b
            s = int(_S[i])
            b = b + ((f << np.uint32(s)) | (f >> np.uint32(32 - s)))
        if maxb > 1:
            active = blk < nblocks
            A = np.where(active, A + a, A)
            B = np.where(active, B + b, B)
            C = np.where(active, C + c, C)
            D = np.where(active, D + d, D)
        else:
            A, B, C, D = A + a, B + b, C + c, D + d

    def _swap(x: np.ndarray) -> np.ndarray:  # uint32 byte swap (LE -> BE)
        return (
            ((x & np.uint32(0xFF)) << np.uint32(24))
            | (((x >> np.uint32(8)) & np.uint32(0xFF)) << np.uint32(16))
            | (((x >> np.uint32(16)) & np.uint32(0xFF)) << np.uint32(8))
            | (x >> np.uint32(24))
        )

    lane0 = (
        (_swap(A).astype(np.uint64) << np.uint64(32)) | _swap(B).astype(np.uint64)
    ) >> np.uint64(4)
    lane1 = (
        (_swap(C).astype(np.uint64) << np.uint64(32)) | _swap(D).astype(np.uint64)
    ) >> np.uint64(4)
    return lane0.astype(np.int64), lane1.astype(np.int64)


def _pad_gather(
    data: np.ndarray,
    starts: np.ndarray,
    lens: np.ndarray,
    prefix: bytes,
) -> tuple[np.ndarray, np.ndarray]:
    """Gather ``data[starts[i] : starts[i]+lens[i]]`` into an MD5-padded
    block buffer with ``prefix`` prepended to every message.

    Returns (buf, nblocks) for :func:`_md5_core`.
    """
    plen = len(prefix)
    n = len(starts)
    msg_lens = lens + plen
    nblocks = (msg_lens + 8) // 64 + 1
    maxb = int(nblocks.max()) if n else 1
    stride = maxb * 64
    buf = np.zeros((n, stride), dtype=np.uint8)
    flat = buf.reshape(-1)
    if plen:
        buf[:, 0:plen] = np.frombuffer(prefix, dtype=np.uint8)
    total = int(lens.sum())
    if total:
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        ends_cum = np.cumsum(lens)
        starts_cum = ends_cum - lens
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts_cum, lens)
        flat[row_of * stride + plen + pos] = data[np.repeat(starts, lens) + pos]
    rows = np.arange(n, dtype=np.int64)
    flat[rows * stride + msg_lens] = 0x80
    bitlen = msg_lens.astype(np.uint64) * np.uint64(8)
    end = rows * stride + nblocks * 64 - 8
    for b in range(8):
        flat[end + b] = ((bitlen >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.uint8)
    return buf, nblocks


def md5_lanes_spans_multi(
    data: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    prefixes: list[bytes],
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Per-prefix (lane0, lane1) int64 arrays for md5(prefix + span).

    ``data`` is a flat uint8 buffer; spans may overlap and appear in any
    order. All prefixes must have the same length (the minhash seed
    prefixes 's0|'..'s9|' do): the padded block buffer — the expensive
    part of the pipeline, measured ~40% of a pass — is then built ONCE
    per chunk and only its first ``len(prefix)`` bytes are rewritten
    between compression passes. Processing is internally chunked (see
    module docstring) so peak buffer memory stays ~ _CHUNK_PAD_BYTES
    regardless of input size.
    """
    plen = len(prefixes[0])
    assert all(len(p) == plen for p in prefixes), "prefixes must share a length"
    n = len(starts)
    out = [
        (np.empty(n, dtype=np.int64), np.empty(n, dtype=np.int64)) for _ in prefixes
    ]
    if n == 0:
        return out
    starts = starts.astype(np.int64, copy=False)
    lens = ends.astype(np.int64, copy=False) - starts
    nblocks = (lens + plen + 8) // 64 + 1
    small = nblocks <= _SMALL_MAX_BLOCKS
    for mask in (small, ~small):
        idx = np.flatnonzero(mask)
        if len(idx) == 0:
            continue
        pad_bytes = nblocks[idx] * 64
        # greedy sub-chunks under the buffer cap (a single over-cap message
        # still forms its own chunk)
        cum = np.cumsum(pad_bytes)
        lo = 0
        while lo < len(idx):
            budget = int(cum[lo] - pad_bytes[lo]) + _CHUNK_PAD_BYTES
            hi = int(np.searchsorted(cum, budget, side="right"))
            hi = max(hi, lo + 1)
            sel = idx[lo:hi]
            buf, nb = _pad_gather(data, starts[sel], lens[sel], prefixes[0])
            for p, prefix in enumerate(prefixes):
                if p:
                    buf[:, 0:plen] = np.frombuffer(prefix, dtype=np.uint8)
                l0, l1 = _md5_core(buf, nb)
                out[p][0][sel] = l0
                out[p][1][sel] = l1
            lo = hi
    return out


def md5_lanes_spans(
    data: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    prefix: bytes,
) -> tuple[np.ndarray, np.ndarray]:
    """(lane0, lane1) int64 arrays for md5(prefix + data[starts:ends])."""
    return md5_lanes_spans_multi(data, starts, ends, [prefix])[0]
