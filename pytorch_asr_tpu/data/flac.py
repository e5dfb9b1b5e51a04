"""From-scratch FLAC codec (pure Python).

The reference genre reads LibriSpeech FLAC via torchaudio/sox (C++); this
environment has no FLAC library at all (no libFLAC, soundfile, ffmpeg — see
SURVEY.md §7.1), so the framework carries its own decoder:

  * ``read_flac`` — complete FLAC subset decoder: CONSTANT / VERBATIM /
    FIXED(0-4) / LPC(1-32) subframes, RICE + RICE2 partitioned residuals with
    escape codes, wasted bits, all four channel assignments (independent,
    left/side, right/side, mid/side), 8/12/16/20/24-bit samples, fixed and
    variable blocking, CRC-8/CRC-16 verification.  This is the hot-path
    oracle; ``native/asr_native.cc::asr_read_flac`` is the threaded C++
    equivalent used by the data pipeline (SURVEY.md §2.2 torchaudio/sox row).
  * ``write_flac`` — encoder used to build test fixtures and to round-trip
    the decoders (FLAC is lossless, so decode(encode(x)) == x exactly).
    Supports constant/verbatim/fixed/LPC subframes and stereo decorrelation
    so every decoder path has an encodable test vector.

Format reference: the public FLAC format spec (RFC 9639).  No reference-repo
code involved (reference absent, SURVEY.md §0).
"""

from __future__ import annotations

import os
import struct

import numpy as np

FIXED_COEFFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))

_BLOCKSIZE_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                   256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                   8192: 13, 16384: 14, 32768: 15}
_SAMPLE_RATE_CODE = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                     22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                     96000: 11}
_SAMPLE_SIZE_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class FlacError(ValueError):
    pass


# ---------------------------------------------------------------- bit reader
class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos      # byte offset
        self.bit = 0         # bits consumed in current byte (0..7)

    def read(self, n: int) -> int:
        """Read n bits, MSB-first, unsigned."""
        out = 0
        while n > 0:
            if self.byte >= len(self.data):
                raise FlacError("unexpected end of FLAC stream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            n -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1

    def read_utf8_number(self) -> int:
        """FLAC's extended UTF-8 coded frame/sample number."""
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        n = 0
        mask = 0x80
        while b0 & mask:
            n += 1
            mask >>= 1
        if n < 2 or n > 7:
            raise FlacError("invalid UTF-8 coded number")
        v = b0 & (0xFF >> (n + 1))
        for _ in range(n - 1):
            c = self.read(8)
            if (c & 0xC0) != 0x80:
                raise FlacError("invalid UTF-8 continuation")
            v = (v << 6) | (c & 0x3F)
        return v


# ------------------------------------------------------------------- decoder
def _decode_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise FlacError(f"reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts or (po > 0 and (blocksize >> po) <= order) \
            or (blocksize >> po) < order:
        raise FlacError(
            f"invalid partition order {po} for blocksize {blocksize}, "
            f"predictor order {order}")
    res: list[int] = []
    for p in range(nparts):
        count = (blocksize >> po) - (order if p == 0 else 0)
        if count < 0:
            raise FlacError("invalid residual partition order")
        param = br.read(plen)
        if param == escape:
            bits = br.read(5)
            for _ in range(count):
                res.append(br.read_signed(bits) if bits else 0)
        else:
            for _ in range(count):
                q = br.read_unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                res.append((v >> 1) ^ -(v & 1))       # zigzag
    return res


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise FlacError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if eff <= 0:
        raise FlacError(f"wasted bits {wasted} >= sample size {bps}")
    if t == 0:                                         # CONSTANT
        v = br.read_signed(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif t == 1:                                       # VERBATIM
        out = np.fromiter((br.read_signed(eff) for _ in range(blocksize)),
                          dtype=np.int64, count=blocksize)
    elif 8 <= t <= 12:                                 # FIXED order 0-4
        order = t - 8
        samples = [br.read_signed(eff) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        coefs = FIXED_COEFFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[i - 1 - j]
            samples.append(res[i - order] + pred)
        out = np.asarray(samples, dtype=np.int64)
    elif t >= 32:                                      # LPC order 1-32
        order = t - 31
        samples = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise FlacError("invalid LPC precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        for i in range(order, blocksize):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[i - 1 - j]
            samples.append(res[i - order] + (acc >> shift))
        out = np.asarray(samples, dtype=np.int64)
    else:
        raise FlacError(f"reserved subframe type {t}")
    return out << wasted if wasted else out


_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
               7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def _decode_frame(br: _BitReader, info: dict) -> np.ndarray:
    """One frame -> (blocksize, channels) int64.  br must be byte-aligned at a
    frame boundary."""
    start = br.byte
    sync = br.read(14)
    if sync != 0x3FFE:
        raise FlacError(f"bad frame sync 0x{sync:x} at byte {start}")
    if br.read(1):
        raise FlacError("frame reserved bit set")
    br.read(1)                                        # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise FlacError("frame reserved bit 2 set")
    br.read_utf8_number()
    if bs_code == 0:
        raise FlacError("reserved blocksize code 0")
    elif bs_code == 1:
        blocksize = 192
    elif bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)
    if sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    elif sr_code == 15:
        raise FlacError("invalid sample rate code")
    ss_map = {0: info["bps"], 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
    if ss_code not in ss_map:
        raise FlacError(f"reserved sample size code {ss_code}")
    bps = ss_map[ss_code]
    br.align()
    # CRC-8 covers the header bytes up to (not incl.) the CRC byte itself.
    hdr = br.data[start:br.byte]
    crc8 = br.read(8)
    if _crc8(hdr) != crc8:
        raise FlacError("frame header CRC-8 mismatch")

    nch = ch_code + 1 if ch_code <= 7 else 2
    if nch != info["channels"]:
        raise FlacError(f"frame channel count {nch} != STREAMINFO "
                        f"{info['channels']}")
    if ch_code <= 7:
        chans = [_decode_subframe(br, blocksize, bps) for _ in range(nch)]
    elif ch_code == 8:                                 # left/side
        left = _decode_subframe(br, blocksize, bps)
        side = _decode_subframe(br, blocksize, bps + 1)
        chans = [left, left - side]
    elif ch_code == 9:                                 # right/side
        side = _decode_subframe(br, blocksize, bps + 1)
        right = _decode_subframe(br, blocksize, bps)
        chans = [side + right, right]
    elif ch_code == 10:                                # mid/side
        mid = _decode_subframe(br, blocksize, bps)
        side = _decode_subframe(br, blocksize, bps + 1)
        m2 = (mid.astype(np.int64) << 1) | (side & 1)
        chans = [(m2 + side) >> 1, (m2 - side) >> 1]
    else:
        raise FlacError(f"reserved channel assignment {ch_code}")
    br.align()
    frame_bytes = br.data[start:br.byte]
    crc16 = br.read(16)
    if _crc16(frame_bytes) != crc16:
        raise FlacError("frame CRC-16 mismatch")
    return np.stack(chans, axis=1)


def decode_flac_full(data: bytes) -> tuple[np.ndarray, int, dict]:
    """Full FLAC stream -> (int32 samples (N, channels), sample_rate, info)."""
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + length]
        if btype == 0:
            if length < 34:
                raise FlacError("short STREAMINFO")
            br = _BitReader(body)
            br.read(16); br.read(16)                   # min/max blocksize
            br.read(24); br.read(24)                   # min/max framesize
            sr = br.read(20)
            nch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = {"sr": sr, "channels": nch, "bps": bps, "total": total}
        pos += 4 + length
        if last:
            break
    if info is None:
        raise FlacError("missing STREAMINFO")
    br = _BitReader(data, pos)
    frames = []
    got = 0
    while (info["total"] == 0 or got < info["total"]) and br.byte < len(data):
        f = _decode_frame(br, info)
        frames.append(f)
        got += f.shape[0]
    out = np.concatenate(frames, axis=0) if frames else np.zeros((0, info["channels"]))
    if info["total"]:
        out = out[: info["total"]]
    return out.astype(np.int32), info["sr"], info


def flac_info(path: str) -> dict:
    """Header-only STREAMINFO read -> {sr, channels, bps, total}.

    Reads just the metadata blocks (typically < 8 KB), never the frames: the
    lazy data pipeline uses this for duration-capped pseudo-splits, bucket
    optimization, and SortaGrad ordering over 960 h of audio without decoding
    anything (SURVEY.md §2.1 data-pipeline row)."""
    with open(path, "rb") as fh:
        head = fh.read(4)
        if head != b"fLaC":
            raise FlacError("not a FLAC stream (missing fLaC marker)")
        info = None
        while True:
            hdr = fh.read(4)
            if len(hdr) < 4:
                raise FlacError("truncated metadata")
            last = hdr[0] & 0x80
            btype = hdr[0] & 0x7F
            length = int.from_bytes(hdr[1:4], "big")
            if btype == 0:
                body = fh.read(length)
                if len(body) < 34:
                    raise FlacError("short STREAMINFO")
                br = _BitReader(body)
                br.read(16); br.read(16)               # min/max blocksize
                br.read(24); br.read(24)               # min/max framesize
                sr = br.read(20)
                nch = br.read(3) + 1
                bps = br.read(5) + 1
                total = br.read(36)
                info = {"sr": sr, "channels": nch, "bps": bps, "total": total}
            else:
                fh.seek(length, 1)
            if last:
                break
    if info is None:
        raise FlacError("missing STREAMINFO")
    return info


def decode_flac_bytes(data: bytes) -> tuple[np.ndarray, int]:
    """Full FLAC stream -> (int32 samples (N, channels), sample_rate)."""
    pcm, sr, _ = decode_flac_full(data)
    return pcm, sr


def read_flac(path: str) -> tuple[np.ndarray, int]:
    """Decode a FLAC file -> (float32 mono waveform in [-1, 1], sample_rate)."""
    with open(path, "rb") as fh:
        data = fh.read()
    # scaling uses the SAME STREAMINFO the decoder found (STREAMINFO need not
    # be the first metadata block)
    pcm, sr, info = decode_flac_full(data)
    x = pcm.astype(np.float32) / float(1 << (info["bps"] - 1))
    if x.ndim > 1 and x.shape[1] > 1:
        x = x.mean(axis=1)
    return x.reshape(-1), sr


# ------------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    out.append((0xFF << (8 - nbytes) & 0xFF) | (n >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _best_rice_param(res: list[int], plen: int) -> int:
    if not res:
        return 0
    mean = sum((v << 1) ^ (v >> 63) if v < 0 else (v << 1) for v in res) / len(res)
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < (1 << plen) - 2:
        p += 1
    return p


def _write_residual(bw: _BitWriter, res: list[int], order: int,
                    blocksize: int, partition_order: int = 0,
                    escape: bool = False) -> None:
    bw.write(0, 2)                                     # RICE (4-bit params)
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    idx = 0
    for p in range(nparts):
        count = (blocksize >> partition_order) - (order if p == 0 else 0)
        part = res[idx:idx + count]
        idx += count
        if escape:
            bits = max((abs(v).bit_length() + 1 for v in part), default=1)
            bw.write(0xF, 4)
            bw.write(bits, 5)
            for v in part:
                bw.write_signed(v, bits)
        else:
            param = _best_rice_param(part, 4)
            bw.write(param, 4)
            for v in part:
                u = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
                bw.write_unary(u >> param)
                bw.write(u & ((1 << param) - 1), param)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int, kind: str,
                     order: int = 2, partition_order: int = 0,
                     escape: bool = False, lpc_coefs=None, lpc_shift: int = 5,
                     wasted: int = 0) -> None:
    x = [int(v) for v in x]
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in x)
        x = [v >> wasted for v in x]
    eff = bps - wasted
    bw.write(0, 1)                                     # padding
    if kind == "constant":
        bw.write(0, 6)
    elif kind == "verbatim":
        bw.write(1, 6)
    elif kind == "fixed":
        bw.write(8 + order, 6)
    elif kind == "lpc":
        bw.write(32 + order - 1, 6)
    else:
        raise ValueError(kind)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)
    if kind == "constant":
        assert all(v == x[0] for v in x)
        bw.write_signed(x[0], eff)
        return
    if kind == "verbatim":
        for v in x:
            bw.write_signed(v, eff)
        return
    n = len(x)
    if kind == "fixed":
        coefs = FIXED_COEFFS[order]
        for v in x[:order]:
            bw.write_signed(v, eff)
        res = []
        for i in range(order, n):
            pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
            res.append(x[i] - pred)
        _write_residual(bw, res, order, n, partition_order, escape)
        return
    # lpc
    coefs = list(lpc_coefs if lpc_coefs is not None else [1] * order)
    assert len(coefs) == order
    prec = max(max(abs(c).bit_length() + 1 for c in coefs), 2)
    for v in x[:order]:
        bw.write_signed(v, eff)
    bw.write(prec - 1, 4)
    bw.write_signed(lpc_shift, 5)
    for c in coefs:
        bw.write_signed(c, prec)
    res = []
    for i in range(order, n):
        acc = sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
        res.append(x[i] - (acc >> lpc_shift))
    _write_residual(bw, res, order, n, partition_order, escape)


def write_flac(path: str, pcm: np.ndarray, sample_rate: int, bps: int = 16,
               blocksize: int = 4096, subframe: str = "fixed",
               order: int = 2, partition_order: int = 0, escape: bool = False,
               stereo_mode: str = "independent", lpc_coefs=None,
               lpc_shift: int = 5, wasted: int = 0) -> None:
    """Encode int PCM (N,) or (N, channels) to a FLAC file (test fixtures).

    ``subframe``: constant | verbatim | fixed | lpc (applied to every
    subframe; 'constant' requires constant input).  ``stereo_mode``:
    independent | left_side | right_side | mid_side (2-channel input only).
    """
    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, nch = pcm.shape
    lim = 1 << (bps - 1)
    if pcm.min() < -lim or pcm.max() >= lim:
        raise ValueError(f"PCM exceeds {bps}-bit range")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)                                 # md5 unset
    body = si.bytes()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    sr_code = _SAMPLE_RATE_CODE.get(sample_rate, 13)
    ss_code = _SAMPLE_SIZE_CODE[bps]
    frame_no = 0
    for start in range(0, n, blocksize):
        blk = pcm[start:start + blocksize]
        bsz = blk.shape[0]
        bs_code = _BLOCKSIZE_CODE.get(bsz, 7)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)                                 # fixed blocksize strategy
        bw.write(bs_code, 4)
        bw.write(sr_code, 4)
        if stereo_mode == "independent":
            ch_code = nch - 1
        else:
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
            assert nch == 2
        bw.write(ch_code, 4)
        bw.write(ss_code, 3)
        bw.write(0, 1)
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        if bs_code == 7:
            bw.write(bsz - 1, 16)
        if sr_code == 13:
            bw.write(sample_rate, 16)
        bw.align()
        hdr = bw.bytes()
        bw2 = _BitWriter()
        for b in hdr:
            bw2.write(b, 8)
        bw2.write(_crc8(hdr), 8)

        # A short final block may not satisfy the partitioning rules
        # (blocksize divisible by 2^po, blocksize>>po > order); fall back to
        # a single partition there so the frame stays decodable.
        po = partition_order
        if bsz % (1 << po) or (po > 0 and (bsz >> po) <= order):
            po = 0

        def enc(x, b):
            _encode_subframe(bw2, x, b, subframe, order=order,
                             partition_order=po, escape=escape,
                             lpc_coefs=lpc_coefs, lpc_shift=lpc_shift,
                             wasted=wasted)

        if stereo_mode == "independent":
            for c in range(nch):
                enc(blk[:, c], bps)
        else:
            L, R = blk[:, 0], blk[:, 1]
            side = L - R
            if stereo_mode == "left_side":
                enc(L, bps); enc(side, bps + 1)
            elif stereo_mode == "right_side":
                enc(side, bps + 1); enc(R, bps)
            else:
                enc((L + R) >> 1, bps); enc(side, bps + 1)
        bw2.align()
        frame = bw2.bytes()
        bw3 = _BitWriter()
        for b in frame:
            bw3.write(b, 8)
        bw3.write(_crc16(frame), 16)
        out += bw3.bytes()
        frame_no += 1

    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(bytes(out))
    os.replace(tmp, path)
