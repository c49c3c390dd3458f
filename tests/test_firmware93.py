"""Unit harnesses for the OS93b decoding firmware (compiler/firmware93.py).

Each routine runs on the bare ADSP-2105 core against the refdec scalar
implementation it mirrors (the 93 decompressor's subtype state machine and
rounding anomaly, and the 93 transform's sqrt fixup + 7-iteration IFFT);
reference anchors: DCSDecoderNative.cpp:2293-2615, :614-813."""

import numpy as np

from dcsexplorer_tpu.compiler import firmware93 as FW93
from dcsexplorer_tpu.compiler import firmware94 as FW
from dcsexplorer_tpu.emu.adsp2105 import ADSP2105
from dcsexplorer_tpu.refdec.bitreader import BitReader, PaddedView

TRAP_ADDR = 0x700


class Harness93:
    """Bare-core firmware harness with the DCS-93 ROM window stubbed."""

    def __init__(self, rom=b""):
        boot, overlay, syms = FW93.build_decoder_firmware()
        self.syms = syms
        self.rom = bytearray(rom)
        self.bank = 0
        cpu = ADSP2105(read_dm=self._rd, write_dm=self._wr)
        cpu.pm[:len(boot)] = boot
        cpu.pm[FW93.OVERLAY_PM:FW93.OVERLAY_PM + len(overlay)] = overlay
        cpu.pm[TRAP_ADDR] = 0x010000
        for k, w in enumerate(FW93.TABLE_WORDS):
            cpu.dm[FW93.TAB93 + k] = w
        for k, v in ((0, 0), (1, 1), (2, -1), (3, 0), (4, 0), (5, 0),
                     (6, 1), (7, 0)):
            cpu.m[k] = v
        cpu.i[5] = 0x3000
        cpu.dm[FW.SYM["CURBANK"]] = 0xFFFF
        self.cpu = cpu

    def _rd(self, addr):
        addr &= 0x3FFF
        if 0x2000 <= addr <= 0x2FFF:
            p = (self.bank << 12) + (addr - 0x2000)
            return self.rom[p] if p < len(self.rom) else 0xFF
        return self.cpu.dm[addr]

    def _wr(self, addr, data):
        addr &= 0x3FFF
        self.cpu.dm[addr] = data & 0xFFFF
        if addr == 0x3000:
            self.bank = data

    def call(self, label, max_steps=4_000_000):
        cpu = self.cpu
        cpu.pc_stack[0] = TRAP_ADDR
        cpu.pc_sp = 1
        cpu.pc = self.syms[label]
        cpu.run(max_steps)
        assert cpu.stopped, f"{label} did not return"


def test_transform93_matches_refdec():
    from dcsexplorer_tpu.refdec.transform import transform_frame_93

    rng = np.random.default_rng(11)
    for trial in range(4):
        h = Harness93()
        fb = [int(v) for v in rng.integers(0, 0x10000, 512, dtype=np.int64)]
        overlap = [int(v) for v in rng.integers(0, 0x10000, 16,
                                                dtype=np.int64)]
        vol_shift = int(rng.integers(0, 9))
        for i, v in enumerate(fb):
            h.cpu.dm[FW.FB + i] = v
        for i, v in enumerate(overlap):
            h.cpu.dm[FW.OVLB + i] = v
        h.cpu.dm[FW.SYM["VSHIFT"]] = vol_shift
        h.cpu.dm[FW.SYM["WPTR"]] = FW.BUF
        h.call("transform")

        ref_fb = list(fb)
        ref_ov = list(overlap)
        out = [0] * 240
        transform_frame_93(ref_fb, ref_ov, out, vol_shift)
        got_out = [h.cpu.dm[FW.BUF + i] for i in range(240)]
        got_ov = [h.cpu.dm[FW.OVLB + i] for i in range(16)]
        assert got_out == out, f"trial {trial}: PCM mismatch"
        assert got_ov == ref_ov, f"trial {trial}: overlap mismatch"


def _tone_pcm(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    pcm = (6000 * np.sin(2 * np.pi * 440 * t / 31250)
           + 2500 * np.sin(2 * np.pi * 1730 * t / 31250)
           + rng.normal(0, 400, n))
    return pcm.astype(np.float32)


def test_decode93_frames_match_refdec():
    """Both 93 stream format types, frame by frame, against refdec."""
    from dcsexplorer_tpu.encoder.encoder import CompressionParams, encode_pcm
    from dcsexplorer_tpu.refdec.decoder import OS93B
    from dcsexplorer_tpu.refdec.frames import (StreamState,
                                               decompress_frame_93)

    for fmt in (0, 1):
        stream, n_frames = encode_pcm(
            _tone_pcm(seed=fmt), CompressionParams(stream_format_type=fmt),
            os_version=OS93B)
        rom_base = 0x0F80                # header crosses the bank boundary
        rom = bytearray(rom_base) + bytearray(stream)
        h = Harness93(bytes(rom))
        ch = 2
        mix = 0xE10C
        stb = FW.ST + ch * 64
        dm = h.cpu.dm
        hdr = rom_base + 2
        srt = hdr + 16
        dm[stb + FW.S_PLAY] = 1
        dm[stb + FW.S_HDRHI] = hdr >> 16
        dm[stb + FW.S_HDRLO] = hdr & 0xFFFF
        dm[stb + FW.S_SRTHI] = srt >> 16
        dm[stb + FW.S_SRTLO] = srt & 0xFFFF
        dm[stb + FW.S_CURHI] = srt >> 16
        dm[stb + FW.S_CURLO] = srt & 0xFFFF
        dm[stb + FW.S_WHI] = dm[stb + FW.S_WLO] = dm[stb + FW.S_NB] = 0
        dm[stb + FW.S_FCTR] = n_frames
        dm[stb + FW.S_NFRM] = n_frames
        dm[stb + FW.S_LCTR] = 1
        dm[stb + FW.S_NEEDI] = 1
        dm[FW.CH + ch * 64 + FW.C_MMULT] = mix

        st = StreamState()
        mem = PaddedView(bytes(stream))
        st.mem = mem
        st.header_pos = 2
        st.header_len = 16
        st.start_pos = 18
        st.bit = BitReader(mem, 18)
        st.num_frames = n_frames
        st.frame_counter = n_frames
        st.loop_counter = 1

        for frame in range(n_frames):
            if st.bit.pos == st.start_pos and st.bit.nbits == 0:
                st.header = [int(mem[st.header_pos + i]) for i in range(16)]
                st.band_type = [0] * 16
            fb_ref = [0] * 512
            assert decompress_frame_93(st, fb_ref, mix)

            for i in range(512):
                dm[FW.FB + i] = 0
            dm[FW.SYM["DCH"]] = ch
            h.call("decode_one")
            got = [dm[FW.FB + i] for i in range(512)]
            assert got == fb_ref, (
                f"fmt {fmt} frame {frame}: first diff at "
                f"{next(i for i in range(512) if got[i] != fb_ref[i])}")
            bt = [dm[stb + FW.S_BT + i] for i in range(16)]
            assert bt == st.band_type, (fmt, frame)
        # stream ended: loop counter 1 → playback stops
        assert dm[stb + FW.S_PLAY] == 0


class Harness93a(Harness93):
    """Harness for the OS93a firmware variant (Type-1 decompressor, pair
    table in ROM at FW93.PAIR_ROM_ADDR_93A)."""

    def __init__(self, rom=b""):
        boot, overlay, syms = FW93.build_decoder_firmware(os93a=True)
        self.syms = syms
        self.rom = bytearray(rom)
        self.bank = 0
        from dcsexplorer_tpu.emu.adsp2105 import ADSP2105
        cpu = ADSP2105(read_dm=self._rd, write_dm=self._wr)
        cpu.pm[:len(boot)] = boot
        cpu.pm[FW93.OVERLAY_PM:FW93.OVERLAY_PM + len(overlay)] = overlay
        cpu.pm[TRAP_ADDR] = 0x010000
        for k, w in enumerate(FW93.TABLE_WORDS_93A):
            cpu.dm[FW93.TAB93 + k] = w
        for k, v in ((0, 0), (1, 1), (2, -1), (3, 0), (4, 0), (5, 0),
                     (6, 1), (7, 0)):
            cpu.m[k] = v
        cpu.i[5] = 0x3000
        cpu.dm[FW.SYM["CURBANK"]] = 0xFFFF
        self.cpu = cpu


def test_decode93a_type1_frames_match_refdec():
    """The OS93a Type-1 decompressor (selector-grouped band-bits prefix
    codebooks, two-level scale codebook, ROM-resident pair table), frame
    by frame against refdec — all four selector groups.  Also guards the
    counter-stack discipline: a CNTR load without its DO UNTIL leaks a
    slot per frame and corrupts downstream hardware loops (reference:
    DCSDecoderNative.cpp:2687-2781)."""
    from dcsexplorer_tpu.refdec.frames import (StreamState,
                                               decompress_frame_93a_type1)
    from .test_format93 import build_stream93a_type1

    for selector in range(4):
        n_frames = 8
        stream = build_stream93a_type1(n_frames=n_frames, n_bands=12,
                                       selector=selector, seed=3 + selector)
        rom_base = 0x0FF0                # header crosses the bank boundary
        rom = bytearray(max(FW93.FW_RESERVE_93A[1], rom_base + len(stream)))
        rom[rom_base:rom_base + len(stream)] = stream
        blob = FW93.table_blob_93a()
        rom[FW93.TABLES_ROM_ADDR:FW93.TABLES_ROM_ADDR + len(blob)] = blob
        h = Harness93a(bytes(rom))
        ch = 3
        mix = 0xB21C if selector & 1 else 0x51F8
        stb = FW.ST + ch * 64
        dm = h.cpu.dm
        hdr = rom_base + 2
        srt = hdr + 1                    # 1-byte Type-1 header
        dm[stb + FW.S_PLAY] = 1
        dm[stb + FW.S_HDRHI] = hdr >> 16
        dm[stb + FW.S_HDRLO] = hdr & 0xFFFF
        dm[stb + FW.S_SRTHI] = srt >> 16
        dm[stb + FW.S_SRTLO] = srt & 0xFFFF
        dm[stb + FW.S_CURHI] = srt >> 16
        dm[stb + FW.S_CURLO] = srt & 0xFFFF
        dm[stb + FW.S_WHI] = dm[stb + FW.S_WLO] = dm[stb + FW.S_NB] = 0
        dm[stb + FW.S_FCTR] = n_frames
        dm[stb + FW.S_NFRM] = n_frames
        dm[stb + FW.S_LCTR] = 1
        dm[stb + FW.S_NEEDI] = 1
        dm[FW.CH + ch * 64 + FW.C_MMULT] = mix

        st = StreamState()
        mem = PaddedView(bytes(stream))
        st.mem = mem
        st.header_pos = 2
        st.header_len = 1
        st.start_pos = 3
        st.bit = BitReader(mem, 3)
        st.num_frames = n_frames
        st.frame_counter = n_frames
        st.loop_counter = 1

        for frame in range(n_frames):
            if st.bit.pos == st.start_pos and st.bit.nbits == 0:
                st.header = [int(mem[st.header_pos]) if i == 0 else 0
                             for i in range(16)]
                st.band_type = [0] * 16
            fb_ref = [0] * 512
            assert decompress_frame_93a_type1(st, fb_ref, mix)

            for i in range(512):
                dm[FW.FB + i] = 0
            dm[FW.SYM["DCH"]] = ch
            h.call("decode_one")
            got = [dm[FW.FB + i] for i in range(512)]
            assert got == fb_ref, (
                f"selector {selector} frame {frame}: first diff at "
                f"{next(i for i in range(512) if got[i] != fb_ref[i])}")
        assert h.cpu.cntr_sp == 0, "counter stack leaked"
        assert dm[stb + FW.S_PLAY] == 0
