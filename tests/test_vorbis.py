"""Ogg Vorbis decoder tests (native/src/vorbis.cpp).

Strategy mirrors the MP3/DCS oracle tests: real-world Vorbis streams are
produced at test time by the REFERENCE encoder (libnyquist's vendored
libvorbis, compiled out-of-tree), then decoded by the repo's from-scratch
decoder AND by the reference decoder (vorbisfile), and the PCM is
compared.  Also re-verifies the committed vorbis_tables.h and the fast
IMDCT against the direct spec formula.
"""

import ctypes as C
import os
import subprocess

import numpy as np
import pytest

from dcsexplorer_tpu import native

THIRD = "/root/reference/libnyquist/third_party"
BUILD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "build")
TABLES_H = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "dcsexplorer_tpu", "native", "src",
    "vorbis_tables.h")

_have_ref = os.path.isdir(os.path.join(THIRD, "libvorbis"))


def test_tables_header_matches_reference():
    """The committed vorbis_tables.h must equal a fresh extraction."""
    if not _have_ref:
        pytest.skip("reference tree not available")
    from dcsexplorer_tpu.native import gen_vorbis_tables
    fresh = gen_vorbis_tables.generate()
    committed = open(TABLES_H).read()
    assert fresh == committed, "vorbis_tables.h is stale — re-run generator"


@pytest.mark.parametrize("n", [64, 256, 512, 2048, 8192])
def test_imdct_fast_matches_direct(n):
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(n)
    X = rng.standard_normal(n // 2).astype(np.float32)
    yf = np.zeros(n, np.float32)
    yd = np.zeros(n, np.float32)
    err = lib.vorbis_imdct_selftest(
        n, X.ctypes.data_as(C.c_void_p), yf.ctypes.data_as(C.c_void_p),
        yd.ctypes.data_as(C.c_void_p))
    scale = float(np.abs(yd).max())
    assert err <= 1e-4 * max(scale, 1.0)


# ----------------------------------------------------------------------
# libvorbis oracle (encoder + vorbisfile decoder), compiled out-of-tree

_SHIM = r"""
#include <stdlib.h>
#include <string.h>
#include <vorbis/vorbisenc.h>
#include <vorbis/vorbisfile.h>

extern "C" {

// Encode interleaved float PCM to an in-memory Ogg Vorbis stream.
// Returns bytes written, or -1.
long oracle_encode(const float* pcm, long frames, int ch, long rate,
                   float quality, unsigned char* out, long cap) {
    vorbis_info vi;
    vorbis_info_init(&vi);
    if (vorbis_encode_init_vbr(&vi, ch, rate, quality)) return -1;
    vorbis_comment vc;
    vorbis_comment_init(&vc);
    vorbis_dsp_state vd;
    vorbis_block vb;
    vorbis_analysis_init(&vd, &vi);
    vorbis_block_init(&vd, &vb);
    ogg_stream_state os;
    ogg_stream_init(&os, 12345);
    long w = 0;
    ogg_packet hdr, hdr_comm, hdr_code;
    vorbis_analysis_headerout(&vd, &vc, &hdr, &hdr_comm, &hdr_code);
    ogg_stream_packetin(&os, &hdr);
    ogg_stream_packetin(&os, &hdr_comm);
    ogg_stream_packetin(&os, &hdr_code);
    ogg_page og;
    while (ogg_stream_flush(&os, &og)) {
        if (w + og.header_len + og.body_len > cap) return -1;
        memcpy(out + w, og.header, og.header_len); w += og.header_len;
        memcpy(out + w, og.body, og.body_len); w += og.body_len;
    }
    long done = 0;
    int eos = 0;
    while (!eos) {
        long chunk = frames - done < 1024 ? frames - done : 1024;
        if (chunk > 0) {
            float** buf = vorbis_analysis_buffer(&vd, (int)chunk);
            for (long i = 0; i < chunk; i++)
                for (int c = 0; c < ch; c++)
                    buf[c][i] = pcm[(done + i) * ch + c];
        }
        vorbis_analysis_wrote(&vd, (int)(chunk > 0 ? chunk : 0));
        done += chunk > 0 ? chunk : 0;
        while (vorbis_analysis_blockout(&vd, &vb) == 1) {
            vorbis_analysis(&vb, NULL);
            vorbis_bitrate_addblock(&vb);
            ogg_packet op;
            while (vorbis_bitrate_flushpacket(&vd, &op)) {
                ogg_stream_packetin(&os, &op);
                while (ogg_stream_pageout(&os, &og)) {
                    if (w + og.header_len + og.body_len > cap) return -1;
                    memcpy(out + w, og.header, og.header_len);
                    w += og.header_len;
                    memcpy(out + w, og.body, og.body_len);
                    w += og.body_len;
                }
            }
        }
        if (chunk <= 0) eos = 1;
    }
    while (ogg_stream_flush(&os, &og)) {
        if (w + og.header_len + og.body_len > cap) return -1;
        memcpy(out + w, og.header, og.header_len); w += og.header_len;
        memcpy(out + w, og.body, og.body_len); w += og.body_len;
    }
    ogg_stream_clear(&os);
    vorbis_block_clear(&vb);
    vorbis_dsp_clear(&vd);
    vorbis_comment_clear(&vc);
    vorbis_info_clear(&vi);
    return w;
}

struct MemSrc { const unsigned char* d; long len; long pos; };

static size_t mem_read(void* p, size_t sz, size_t n, void* src) {
    MemSrc* m = (MemSrc*)src;
    long want = (long)(sz * n);
    if (want > m->len - m->pos) want = m->len - m->pos;
    if (want < 0) want = 0;
    memcpy(p, m->d + m->pos, (size_t)want);
    m->pos += want;
    return (size_t)want;
}
static int mem_seek(void* src, ogg_int64_t off, int whence) {
    MemSrc* m = (MemSrc*)src;
    long p = whence == SEEK_SET ? (long)off
           : whence == SEEK_CUR ? m->pos + (long)off : m->len + (long)off;
    if (p < 0 || p > m->len) return -1;
    m->pos = p;
    return 0;
}
static long mem_tell(void* src) { return ((MemSrc*)src)->pos; }

// Decode with vorbisfile.  meta = [rate, channels].  Returns per-channel
// frame count, or -1.  If out is null, only counts.
long oracle_decode(const unsigned char* ogg, long len, float* out,
                   long cap, int* meta) {
    MemSrc m = {ogg, len, 0};
    ov_callbacks cb = {mem_read, mem_seek, NULL, mem_tell};
    OggVorbis_File vf;
    if (ov_open_callbacks(&m, &vf, NULL, 0, cb) < 0) return -1;
    vorbis_info* vi = ov_info(&vf, -1);
    meta[0] = (int)vi->rate;
    meta[1] = vi->channels;
    int ch = vi->channels;
    long total = 0;
    while (1) {
        float** pcm;
        int sec;
        long got = ov_read_float(&vf, &pcm, 4096, &sec);
        if (got <= 0) break;
        if (out != NULL) {
            for (long i = 0; i < got && total + i < cap; i++)
                for (int c = 0; c < ch; c++)
                    out[(total + i) * ch + c] = pcm[c][i];
        }
        total += got;
    }
    ov_clear(&vf);
    return total;
}

}  // extern "C"
"""

_VORBIS_SRCS = [
    "analysis.c", "bitrate.c", "block.c", "codebook.c", "envelope.c",
    "floor0.c", "floor1.c", "info.c", "lookup.c", "lpc.c", "lsp.c",
    "mapping0.c", "mdct.c", "psy.c", "registry.c", "res0.c",
    "sharedbook.c", "smallft.c", "synthesis.c", "vorbisenc.c",
    "vorbisfile.c", "window.c",
]

_lib_cache = [None, False]


def _oracle():
    if _lib_cache[1]:
        return _lib_cache[0]
    _lib_cache[1] = True
    if not _have_ref:
        return None
    os.makedirs(BUILD, exist_ok=True)
    shim = os.path.join(BUILD, "vorbis_oracle_shim.cpp")
    with open(shim, "w") as f:
        f.write(_SHIM)
    lib_path = os.path.join(BUILD, "libvorbisoracle.so")
    srcs = [shim]
    srcs += [os.path.join(THIRD, "libvorbis", "src", s)
             for s in _VORBIS_SRCS]
    srcs += [os.path.join(THIRD, "libogg", "src", s)
             for s in ("framing.c", "bitwise.c")]
    inc = [f"-I{THIRD}/libvorbis/include", f"-I{THIRD}/libvorbis/src",
           f"-I{THIRD}/libogg/include"]
    try:
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(__file__)):
            objs = []
            for src in srcs:
                if os.path.basename(src) == "sharedbook.c":
                    # the vendored sharedbook.c has its static bitreverse
                    # commented out (libnyquist patch); prepend one
                    wrap = os.path.join(BUILD, "vorbis_oracle_sb_wrap.c")
                    with open(wrap, "w") as f:
                        f.write(
                            '#include <ogg/ogg.h>\n'
                            'static ogg_uint32_t bitreverse(ogg_uint32_t '
                            'v){\n'
                            '  ogg_uint32_t r = 0;\n'
                            '  for (int i = 0; i < 32; i++) {\n'
                            '    r = (r << 1) | (v & 1); v >>= 1;\n'
                            '  }\n'
                            '  return r;\n'
                            '}\n'
                            f'#include "{src}"\n')
                    src = wrap
                if os.path.basename(src) == "psy.c":
                    # the vendored psy.c has its FLOOR1_fromdB_LOOKUP
                    # commented out (libnyquist patch); supply the table
                    # from the committed spec header via a wrapper TU
                    hdr = os.path.join(
                        os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__))),
                        "dcsexplorer_tpu", "native", "src",
                        "vorbis_tables.h")
                    wrap = os.path.join(BUILD, "vorbis_oracle_psy_wrap.c")
                    with open(wrap, "w") as f:
                        f.write(f'#define kFloor1FromDb '
                                f'FLOOR1_fromdB_LOOKUP\n'
                                f'#include "{hdr}"\n'
                                f'#undef kFloor1FromDb\n'
                                f'#include "{src}"\n')
                    src = wrap
                obj = os.path.join(
                    BUILD, "vorbis_oracle_" + os.path.basename(src) + ".o")
                cc = ["g++", "-std=c++17"] if src.endswith(".cpp") \
                    else ["gcc"]
                subprocess.run(
                    [*cc, "-O2", "-fPIC", "-w", "-c", *inc, src, "-o", obj],
                    check=True, capture_output=True, text=True)
                objs.append(obj)
            subprocess.run(
                ["g++", "-shared", *objs, "-o", lib_path, "-lm"],
                check=True, capture_output=True, text=True)
        lib = C.CDLL(lib_path)
    except (subprocess.CalledProcessError, OSError):
        return None
    lib.oracle_encode.restype = C.c_long
    lib.oracle_encode.argtypes = [C.c_void_p, C.c_long, C.c_int, C.c_long,
                                  C.c_float, C.c_void_p, C.c_long]
    lib.oracle_decode.restype = C.c_long
    lib.oracle_decode.argtypes = [C.c_void_p, C.c_long, C.c_void_p,
                                  C.c_long, C.c_void_p]
    _lib_cache[0] = lib
    return lib


def _music(frames, ch, rate, seed):
    """Synthesize music-like material (chords + onsets + noise floor)."""
    rng = np.random.default_rng(seed)
    t = np.arange(frames) / rate
    out = np.zeros((frames, ch), np.float32)
    for c in range(ch):
        x = np.zeros(frames)
        for f0 in (220.0, 277.2, 329.6, 440.0):
            f = f0 * (1 + 0.002 * c)
            x += 0.15 * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 1.7 * t + c)
        x *= env
        x += 0.01 * rng.standard_normal(frames)
        out[:, c] = x.astype(np.float32)
    peak = np.abs(out).max()
    return (out / max(peak * 1.1, 1e-9)).astype(np.float32)


def _encode(pcm, rate, quality):
    lib = _oracle()
    if lib is None:
        pytest.skip("libvorbis oracle unavailable")
    frames, ch = pcm.shape
    cap = frames * ch * 8 + (1 << 16)
    out = np.zeros(cap, np.uint8)
    n = lib.oracle_encode(pcm.ctypes.data_as(C.c_void_p), frames, ch, rate,
                          quality, out.ctypes.data_as(C.c_void_p), cap)
    assert n > 0
    return bytes(out[:n].tobytes())


def _oracle_decode(ogg):
    lib = _oracle()
    meta = np.zeros(2, np.int32)
    total = lib.oracle_decode(ogg, len(ogg), None, 0,
                              meta.ctypes.data_as(C.c_void_p))
    assert total >= 0
    ch = int(meta[1])
    out = np.zeros(int(total) * ch, np.float32)
    n = lib.oracle_decode(ogg, len(ogg), out.ctypes.data_as(C.c_void_p),
                          total, meta.ctypes.data_as(C.c_void_p))
    return out[:int(n) * ch].reshape(-1, ch), int(meta[0])


@pytest.mark.parametrize("ch,rate,quality,seed", [
    (1, 44100, 0.4, 1),
    (2, 44100, 0.4, 2),      # stereo: residue type 2 + coupling
    (2, 48000, 0.1, 3),      # low quality: different codebook set
    (1, 22050, 0.7, 4),
])
def test_vorbis_decoder_matches_reference(ch, rate, quality, seed):
    if native.get_lib() is None:
        pytest.skip("native runtime unavailable")
    pcm = _music(rate // 2, ch, rate, seed)       # ~0.5 s
    ogg = _encode(pcm, rate, quality)

    want, wrate = _oracle_decode(ogg)
    got, grate = native.vorbis_decode(ogg)
    assert grate == wrate == rate
    assert got.shape[1] == ch
    # identical sample counts, near-identical samples (both decoders run
    # float DSP with different FFT orders; tolerance covers rounding)
    assert got.shape[0] == want.shape[0], (got.shape, want.shape)
    err = np.abs(got - want).max()
    assert err < 5e-5, f"max deviation {err}"


def test_vorbis_via_read_audio():
    if native.get_lib() is None:
        pytest.skip("native runtime unavailable")
    rate = 31250
    pcm = _music(rate // 2, 2, rate, 9)
    ogg = _encode(pcm, rate, 0.4)
    from dcsexplorer_tpu.utils import audioio
    mono, r = audioio.read_audio(ogg)
    assert r == rate
    want, _ = _oracle_decode(ogg)
    assert np.abs(mono - want.mean(axis=1)).max() < 5e-5


def test_vorbis_malformed_inputs():
    if native.get_lib() is None:
        pytest.skip("native runtime unavailable")
    with pytest.raises(ValueError):
        native.vorbis_decode(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError):
        native.vorbis_decode(b"not an ogg stream at all")
    # truncated real stream must not crash
    pcm = _music(8000, 1, 44100, 5)
    ogg = _encode(pcm, 44100, 0.4)
    for cut in (len(ogg) // 3, len(ogg) // 2):
        try:
            native.vorbis_decode(ogg[:cut])
        except ValueError:
            pass
    # bit-flip fuzz over a valid stream: any outcome but a crash is fine
    rng = np.random.default_rng(0)
    raw = np.frombuffer(ogg, dtype=np.uint8).copy()
    for _ in range(60):
        mut = raw.copy()
        for _ in range(rng.integers(1, 8)):
            mut[rng.integers(0, len(mut))] ^= 1 << rng.integers(0, 8)
        try:
            native.vorbis_decode(mut.tobytes())
        except ValueError:
            pass
    # pure random garbage with an Ogg magic
    for seed in range(10):
        junk = np.random.default_rng(seed).integers(
            0, 256, size=4096, dtype=np.uint8).tobytes()
        try:
            native.vorbis_decode(b"OggS" + junk)
        except ValueError:
            pass


# ----------------------------------------------------------------------
# floor type 0 (LSP): no modern encoder emits it, so the test hand-builds
# a spec-valid floor0 stream and validates our decode against the
# reference decoder (which still supports floor0)

class _LsbWriter:
    def __init__(self):
        self.bits = []

    def w(self, value, n):
        for i in range(n):
            self.bits.append((int(value) >> i) & 1)

    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _ogg_crc(data):
    crc = 0
    for byte in data:
        crc ^= byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if (crc & 0x80000000) \
                else (crc << 1)
            crc &= 0xFFFFFFFF
    return crc


def _ogg_page(packets, serial, seq, granule, flags):
    lacing = []
    body = b""
    for i, p in enumerate(packets):
        body += p
        n = len(p)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
    import struct
    hdr = (b"OggS" + bytes([0, flags]) + struct.pack("<q", granule)
           + struct.pack("<I", serial) + struct.pack("<I", seq)
           + b"\x00\x00\x00\x00" + bytes([len(lacing)]) + bytes(lacing))
    crc = _ogg_crc(hdr + body)
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + body


def _build_floor0_stream(n_packets=24, seed=3):
    """A complete spec-valid mono Vorbis stream using floor type 0."""
    rng = np.random.default_rng(seed)
    rate, bs = 8000, 256
    n2 = bs // 2

    ident = b"\x01vorbis" + b"\x00" * 4 + bytes([1]) + \
        (rate).to_bytes(4, "little") + b"\x00" * 12 + bytes([0x88, 0x01])
    comment = b"\x03vorbis" + b"\x00" * 8 + b"\x01"

    w = _LsbWriter()
    for ch in b"\x05vorbis":
        w.w(ch, 8)
    # --- codebooks (3) ---
    w.w(2, 8)                                # count - 1
    # book0: floor0 coefficients. dims=2, entries=16, len 4, lookup 1
    w.w(0x564342, 24)
    w.w(2, 16)
    w.w(16, 24)
    w.w(0, 1)                                # unordered
    w.w(0, 1)                                # not sparse
    for _ in range(16):
        w.w(3, 5)                            # length-1 = 3 → 4 bits
    w.w(1, 4)                                # lookup type 1
    # float32: 0.11 min, 0.17 delta — packed vorbis floats

    def vf(x):
        import math
        s = 0
        if x < 0:
            s = 1
            x = -x
        if x == 0:
            return 0
        e = math.floor(math.log2(x)) - 20
        m = int(round(x / (2.0 ** e)))
        while m >= (1 << 21):
            m >>= 1
            e += 1
        return (s << 31) | ((e + 788) << 21) | m
    w.w(vf(0.11), 32)                        # minimum
    w.w(vf(0.17), 32)                        # delta
    w.w(1, 4)                                # value_bits - 1 → 2 bits
    w.w(0, 1)                                # no sequence_p
    for mult in (0, 1, 2, 3):                # lookup_values = 4 (4^2 <= 16)
        w.w(mult, 2)
    # book1: residue classbook. dims=2, entries=4, len 2, lookup 0
    w.w(0x564342, 24)
    w.w(2, 16)
    w.w(4, 24)
    w.w(0, 1)
    w.w(0, 1)
    for _ in range(4):
        w.w(1, 5)                            # length 2
    w.w(0, 4)
    # book2: residue values. dims=2, entries=8, len 3, lookup 1
    w.w(0x564342, 24)
    w.w(2, 16)
    w.w(8, 24)
    w.w(0, 1)
    w.w(0, 1)
    for _ in range(8):
        w.w(2, 5)                            # length 3
    w.w(1, 4)
    w.w(vf(-0.35), 32)
    w.w(vf(0.25), 32)
    w.w(1, 4)                                # 2 bits per multiplicand
    w.w(0, 1)
    for mult in (0, 1, 2):                   # lookup_values = 2... needs 2
        pass
    # lookup_values for entries=8, dims=2 → largest v with v^2<=8 = 2
    for mult in (0, 2):
        w.w(mult, 2)
    # --- times ---
    w.w(0, 6)
    w.w(0, 16)
    # --- floors: one, type 0 ---
    w.w(0, 6)
    w.w(0, 16)                               # floor type 0
    w.w(4, 8)                                # order
    w.w(rate, 16)
    w.w(64, 16)                              # bark_map_size
    w.w(6, 6)                                # amplitude bits
    w.w(140, 8)                              # amplitude offset (dB)
    w.w(0, 4)                                # num books - 1
    w.w(0, 8)                                # book 0
    # --- residues: one, type 0 ---
    w.w(0, 6)
    w.w(0, 16)
    w.w(0, 24)                               # begin
    w.w(n2, 24)                              # end
    w.w(15, 24)                              # partition size - 1 → 16
    w.w(1, 6)                                # classifications - 1 → 2
    w.w(1, 8)                                # classbook = book1
    for _ in range(2):                       # per class cascade: pass 0
        w.w(1, 3)
        w.w(0, 1)
    for _ in range(2):                       # per class, per set bit: book
        w.w(2, 8)
    # --- mappings: one, type 0 ---
    w.w(0, 6)
    w.w(0, 16)
    w.w(0, 1)                                # 1 submap
    w.w(0, 1)                                # no coupling
    w.w(0, 2)                                # reserved
    w.w(0, 8)                                # time
    w.w(0, 8)                                # floor
    w.w(0, 8)                                # residue
    # --- modes: one ---
    w.w(0, 6)
    w.w(0, 1)                                # blockflag 0
    w.w(0, 16)
    w.w(0, 16)
    w.w(0, 8)
    w.w(1, 1)                                # framing
    setup = w.bytes()

    # pre-screen coefficient codeword pairs: the LSP envelope peaks at
    # amp/sqrt(p+q), and codewords whose roots sit on bark-grid points
    # overflow exp() into inf (NaN after the residue product) — real
    # encoders guarantee boundedness via LPC, so the generator must too
    # lookup type 1: dim 0 multiplicand index = e % 4, dim 1 = (e//4) % 4
    vq = np.array([[0.11 + 0.17 * (e % 4), 0.11 + 0.17 * ((e // 4) % 4)]
                   for e in range(16)])
    amp_hi = 1 / 63.0 * 140.0
    w_grid = 2.0 * np.cos(np.pi * np.arange(64) / 64.0)
    allowed = []
    for e0 in range(16):
        for e1 in range(16):
            c = [vq[e0][0], vq[e0][1]]
            last = c[1]
            c += [vq[e1][0] + last, vq[e1][1] + last]
            lc = 2.0 * np.cos(np.array(c))
            q = 0.5 * (w_grid - lc[0]) * (w_grid - lc[2])
            p = 0.5 * (w_grid - lc[1]) * (w_grid - lc[3])
            pq = (p * p * (2.0 - w_grid)) + (q * q * (2.0 + w_grid))
            peak = amp_hi / np.sqrt(max(float(pq.min()), 1e-30)) - 140.0
            if peak * 0.11512925 < 5.0:      # envelope peak stays < ~150
                allowed.append((e0, e1))
    assert allowed, "no bounded coefficient pairs (adjust book)"

    packets = []
    for _ in range(n_packets):
        a = _LsbWriter()
        a.w(0, 1)                            # audio packet
        # mode bits: ilog(0) = 0 → none; blockflag 0 → no window flags
        a.w(1, 6)                            # floor0 amplitude (nonzero)
        a.w(0, 1)                            # book number (1 book → 1 bit)
        e0, e1 = allowed[int(rng.integers(0, len(allowed)))]
        for e in (e0, e1):                   # order 4 / dims 2 = 2 words
            # all codewords are 4 bits, so entry i's canonical codeword is
            # i MSB-first; the packer emits LSB-first -> bit-reverse
            a.w(int(f"{e:04b}"[::-1], 2), 4)
        # residue: 8 partitions, classwords=2 → alternate classification
        # words and 2 partitions each
        for _ in range(4):
            a.w(int(rng.integers(0, 4)), 2)  # classbook codeword
            for _ in range(2):               # 2 partitions
                for _ in range(8):           # step = 16/2 = 8 codewords
                    a.w(int(rng.integers(0, 8)), 3)
        packets.append(a.bytes())

    serial = 0x1234
    pages = [_ogg_page([ident], serial, 0, 0, 0x02),
             _ogg_page([comment, setup], serial, 1, 0, 0x00)]
    granule = (n_packets - 1) * (bs // 2)
    pages.append(_ogg_page(packets, serial, 2, granule, 0x04))
    return b"".join(pages), granule


def test_vorbis_floor0_matches_reference():
    """Hand-built floor0 stream: our decode == vorbisfile's decode."""
    if native.get_lib() is None:
        pytest.skip("native runtime unavailable")
    ogg, granule = _build_floor0_stream()
    want, wrate = _oracle_decode(ogg)
    got, grate = native.vorbis_decode(ogg)
    assert grate == wrate == 8000
    assert want.shape[0] == granule, "oracle rejected the synthetic stream"
    assert got.shape[0] == want.shape[0]
    err = np.abs(got - want).max()
    scale = max(float(np.abs(want).max()), 1e-9)
    # the reference evaluates the LSP envelope in float32, ours in double;
    # resonance peaks amplify that rounding, hence the looser bound
    assert err < 1e-3 * scale, f"max deviation {err} (scale {scale})"
    assert scale > 1e-6, "stream decoded to silence (weak test)"
