"""Original-ROM emulator surfaces on firmware they were NOT co-designed with.

The fast-mode detector carries signatures for ORIGINAL DCS ROM programs
(emu/speedup.py ORIG94/ORIG93; reference: DCSDecoderEmu.cpp:296-321), and
the trap patcher keys on opcode shapes that are properties of those
programs (emu/board.py; reference: DCSDecoderEmu.cpp:143-285).  Since
original commercial ROMs are not redistributable, this suite assembles a
"reference-shaped" firmware fixture: a DCS-boardable program whose
transform region is laid out the ORIGINAL way — the three-word 1994
prologue signature, the volume operand at sig+$43, buffers at the
early-layout DM $0700/$3800 geometry, exit at sig+$49 — and whose body is
NOT the builder's canonical firmware94 layout (different buffer addresses,
volume MULTIPLY instead of the synth firmware's volume shift, an LCG frame
source instead of the DCS codec).  The strict interpreter executes real
ADSP code implementing the ORIG94 region semantics; fast mode replaces it
with the native handler — so detection, trap patching, autobuffer capture
and the ORIG94 accelerator are all exercised end-to-end in lockstep on
geometry none of them was built against.
"""

import numpy as np
import pytest

from dcsexplorer_tpu.compiler import romgen
from dcsexplorer_tpu.compiler.asm import (
    ADD, AF, AR, AX0, AX1, AY0, AY1, CNTR, EQ, I0, I1, I2, I3, I5, I6, I7,
    ICNTL, IMASK, L0, L1, L2, L3, L4, L5, L6, L7, LSHIFT_LO, LT, M0, M1, M2,
    M3, M4, M5, M6, M7, MAC_RND, MR, MR0, MR1, MSUB_RND, MUL_SS, MUL_UU,
    MX0, MX1, MY0, MY1, NE, RSUB, SI, SR0, SR1, SUB, XOR, Y_DEC, Asm)
from dcsexplorer_tpu.emu import speedup
from dcsexplorer_tpu.emu.board import EmulatedDecoder
from dcsexplorer_tpu.format import tables as T
from dcsexplorer_tpu.refdec import decoder as rd
from dcsexplorer_tpu.rom import zipload

# early-layout ORIG94 geometry (derived by the detector from the signature
# address alone: sig+4 <= $2000 => ram1=$0700, ram2=$3800)
RAM1 = 0x0700
RAM2 = 0x3800
VOL_NOM = 0x0F00        # found via the master-volume routine signature
VOL_MULT = 0x0F01       # the region's multiplier (landmark op at sig+$43)
SEED = 0x0F02
WPTR = 0x0F03
NPART = 0x0F04
PSIZE = 0x0F05
HALF = 0x0F06
LVL = 0x0F07
BUF = 0x3A00
BUF_MID = BUF + 0x0F0   # 480-word autobuffer, 240 samples per half


def build_origshape_boot():
    """Assemble the reference-shaped fixture firmware (boot block words)."""
    a = Asm()
    c16 = lambda r, v: a.imm(r, v & 0xFFFF)

    # vectors
    a.jump("init")                      # RESET
    a.nop(); a.nop(); a.nop()
    a.jump("irq2")                      # IRQ2
    while a.pc < 0x18:
        a.nop()

    # ------------------------------------------------------------- init
    a.label("init")
    for m, v in ((M0, 0), (M1, 1), (M2, -1), (M3, 0),
                 (M4, 0), (M5, 0), (M6, 1), (M7, 0)):
        a.imm(m, v)
    for l in (L0, L1, L2, L3, L4, L5, L6, L7):
        a.imm(l, 0)
    a.imm(I5, 0x3000)                   # sound data port (original board)
    # twiddle tables: csin at RAM1, ccos at RAM1+$80 (the ORIG94 layout)
    coeff = [int(v) & 0xFFFF for v in T.IFFT_COEFF]
    for k in range(64):
        c16(AR, coeff[k])
        a.st(RAM1 + k, AR)
    for k in range(64):
        c16(AR, coeff[128 + k])
        a.st(RAM1 + 0x80 + k, AR)
    c16(AR, 0x1234)
    a.st(SEED, AR)
    # SPORT1 autobuffer: I3=BUF L3=$1E0 M1=+1 (ireg=3, mreg=1)
    a.imm(I3, BUF)
    a.imm(L3, 0x1E0)
    c16(AR, 0x0002 | (3 << 9) | (1 << 7))
    a.st(0x3FEF, AR)
    a.imm(L3, 0)
    a.imm(ICNTL, 0)
    a.imm(IMASK, 0x20)                  # IRQ2 only
    a.jump("top")

    # -------------------------------------------------------- main loop
    # entry signature: 3C1025 3xxxx0 1xxxxE
    a.label("top")
    a.imm(CNTR, 0x102)
    a.imm(I0, RAM2)
    with a.loop_ce():
        a.st_i_imm(I0, M1, 0)
    # frame source: 16-bit LCG fill of the work buffer (integer-mode
    # multiplies so the low product bits survive)
    a.ena_int(True)
    a.imm(I0, RAM2)
    c16(MY0, 25173)
    c16(AY1, 13849)
    a.ld(MX0, SEED)
    with a.loop_ce(n=0x100):
        a.mac(MR, MUL_UU, MX0, MY0)
        a.alu(AR, ADD, MR0, AY1)
        a.st_i(I0, M1, AR)
        a.mov(MX0, AR)
    a.st(SEED, AR)
    a.ena_int(False)
    # volume multiplier from the nominal volume; the routine head is the
    # master-volume signature the board searches for (8xxxxF 2E7FEF 1yyyy0)
    a.ld(SR1, VOL_NOM)
    a.emit(0x2E7FEF)                    # AF = SR1 + 0 (sets flags)
    a.jump("o_vz", EQ)
    a.mov(SI, SR1)
    a.shift_imm(LSHIFT_LO, SI, 7)       # mult = vol << 7  (≤ $7F80)
    a.st(VOL_MULT, SR0)
    a.jump("o_vd")
    a.label("o_vz")
    c16(AR, 0)
    a.st(VOL_MULT, AR)
    a.label("o_vd")

    # ------------------------------------------- ORIG94-shaped region
    # three-word prologue signature (executed: NOP + two mode words that
    # leave bit-reverse off / fractional mode on, as in original ROMs)
    sig = a.pc
    a.emit(0x000000)
    a.emit(0x0C0080)
    a.emit(0x0C2000)
    a.label("o_entry")                  # sig+3: fast mode intercepts here
    a.jump("tf_impl")
    while a.pc < sig + 0x43:
        a.nop()
    a.ld(MY1, VOL_MULT)                 # sig+$43: the volume landmark op
    while a.pc < sig + 0x49:
        a.nop()
    a.label("o_exit")                   # sig+$49

    # PCM out: first 240 work-buffer words into the autobuffer
    a.imm(I0, RAM2)
    a.imm(I1, BUF)
    with a.loop_ce(n=0xF0):
        a.ld_i(AR, I0, M1)
        a.st_i(I1, M1, AR)

    # autobuffer sync wait loop (the trap patcher's target shape:
    # 0D02A3 4xxxx4 26E20F 1yyyy4 / 4xxxxA 9zzzzA ×2 / JUMP top)
    a.label("o_sync")
    a.mov(AR, I7)
    a.imm(AY0, BUF_MID)
    a.alu(AF, SUB, AR, AY0)             # AF = AR - AY0, encodes 26E20F
    a.jump("o_sync", LT)
    c16(AR, BUF)
    a.st(WPTR, AR)
    c16(AR, BUF_MID)
    a.st(WPTR, AR)
    a.jump("top")

    # --------------------------------- strict-mode region implementation
    # exactly apply_orig94's semantics (emu/speedup.py): wrapping butterfly
    # halves, 6-iteration IFFT with per-partition twiddles and the MAC
    # convergent-rounding, volume multiply
    a.label("tf_impl")
    a.imm(I0, RAM2)
    a.imm(I1, RAM2 + 0x80)
    with a.loop_ce(n=0x40):
        a.ld_i(AY0, I0, M1)             # x0
        a.ld_i(AY1, I0, M2)             # x1 (back at p0)
        a.ld_i(AX0, I1, M1)             # y0
        a.ld_i(AX1, I1, M2)             # y1 (back at p1)
        a.alu(AR, ADD, AX0, AY0)
        a.st_i(I0, M1, AR)
        a.alu(AR, ADD, AX1, AY1)
        a.st_i(I0, M1, AR)              # p0 += 2
        a.alu(AR, RSUB, AX0, AY0)       # x0 - y0
        a.st_i(I1, M1, AR)
        a.alu(AR, RSUB, AX1, AY1)
        a.st_i(I1, M1, AR)              # p1 += 2
    c16(AR, 2)
    a.st(NPART, AR)
    c16(AR, 0x40)
    a.st(PSIZE, AR)
    c16(AR, 6)
    a.st(LVL, AR)
    a.label("tf_lvl")
    a.imm(I0, RAM2)
    a.ld(AR, PSIZE)
    a.mov(M3, AR)                       # partition skip
    c16(AY0, RAM2)
    a.alu(AR, ADD, AR, AY0)
    a.mov(I1, AR)                       # p1 = RAM2 + psz
    a.ld(SI, PSIZE)
    a.shift_imm(LSHIFT_LO, SI, -1)
    a.st(HALF, SR0)
    a.imm(I2, RAM1)                     # csin walk
    a.imm(I6, RAM1 + 0x80)              # ccos walk (DAG2)
    a.ld(AR, NPART)
    a.mov(CNTR, AR)
    with a.loop_ce():                   # partitions
        a.ld_i(MY0, I2, M1)             # cs = csin[part]
        a.ld_i(MY1, I6, M6)             # cc = ccos[part]
        a.ld(AR, HALF)
        a.mov(CNTR, AR)
        with a.loop_ce():               # butterflies
            a.ld_i(MX0, I1, M1)         # a_re
            a.ld_i(MX1, I1, M2)         # a_im (back at p1)
            a.mac(MR, MUL_SS, MX0, MY1)     # a_re·cc
            a.mac(MR, MSUB_RND, MX1, MY0)   # − a_im·cs, rounded → t_re
            a.mov(AX0, MR1)
            a.mac(MR, MUL_SS, MX1, MY1)     # a_im·cc
            a.mac(MR, MAC_RND, MX0, MY0)    # + a_re·cs → t_im = MR1
            a.ld_i(AY0, I0, M1)         # u_re
            a.ld_i(AY1, I0, M2)         # u_im (back at p0)
            a.alu(AR, RSUB, AX0, AY0)   # u_re − t_re
            a.st_i(I0, M1, AR)
            a.alu(AR, RSUB, MR1, AY1)   # u_im − t_im
            a.st_i(I0, M1, AR)          # p0 += 2
            a.alu(AR, ADD, AX0, AY0)    # u_re + t_re
            a.st_i(I1, M1, AR)
            a.alu(AR, ADD, MR1, AY1)    # u_im + t_im
            a.st_i(I1, M1, AR)          # p1 += 2
        a.modify(I0, M3)                # skip the partition's p1 half
        a.modify(I1, M3)
    a.ld(SI, PSIZE)
    a.shift_imm(LSHIFT_LO, SI, -1)
    a.st(PSIZE, SR0)
    a.ld(SI, NPART)
    a.shift_imm(LSHIFT_LO, SI, 1)
    a.st(NPART, SR0)
    a.ld(AY0, LVL)
    a.alu(AR, Y_DEC, None, AY0)
    a.st(LVL, AR)
    a.jump("tf_lvl", NE)
    # volume multiply: dm[k] = (s16(dm[k])·vol) >> 15 (MAC SS high word)
    a.ld(MY0, VOL_MULT)
    a.imm(I0, RAM2)
    with a.loop_ce(n=0x100):
        a.ld_i(MX0, I0, M0)
        a.mac(MR, MUL_SS, MX0, MY0)
        a.st_i(I0, M1, MR1)
    a.jump("o_exit")

    # ------------------------------------------------------------- irq2
    # accept a port byte; fold it into the LCG seed so commands perturb
    # the PCM (making the lockstep compare sensitive to port traffic)
    a.label("irq2")
    a.ena_sec_reg()
    a.ld_pm(AX1, I5, M5)                # read the data port
    a.ld(AY0, SEED)
    a.alu(AR, XOR, AX1, AY0)
    a.st(SEED, AR)
    a.rti()

    words = a.assemble()
    return words, a.labels


def build_origshape_zip():
    """A checkable ROM zip whose U2 boot program is the fixture firmware."""
    from dcsexplorer_tpu.compiler import firmware94 as fw94

    boot, labels = build_origshape_boot()
    real = fw94.build_decoder_firmware
    try:
        fw94.build_decoder_firmware = lambda **kw: (boot, [], {})
        spec = romgen.RomSpec(os_version=rd.OS94, num_channels=6)
        spec.streams = {}
        spec.tracks = [romgen.TrackSpec(0, steps=[romgen.op_end()])]
        data = romgen.RomBuilder(spec).build_zip()
    finally:
        fw94.build_decoder_firmware = real
    return data, labels


@pytest.fixture(scope="module")
def origshape():
    data, labels = build_origshape_zip()
    rs, _ = zipload.load_zip_data(data)
    assert rs.check() == 1
    return rs, labels


def _mk(rs, fast):
    dec = EmulatedDecoder(enable_speedup=fast)
    dec.load_rom_set(rs)
    dec.default_volume = 0xB0
    dec.soft_boot()
    assert dec.state == rd.ST_RUNNING, dec.error_message
    return dec


def test_detects_orig94_on_foreign_firmware(origshape):
    rs, labels = origshape
    fast = _mk(rs, fast=True)
    info = fast.speedup_info
    assert info is not None and info.kind == speedup.KIND_ORIG94
    assert info.entry == labels["o_entry"]
    assert info.exit == labels["o_exit"]
    assert info.geom == [RAM1, RAM2, VOL_MULT]


def test_trap_patcher_on_foreign_firmware(origshape):
    """The board's patch-point search (sync loop, main-loop entry, volume
    routine) succeeds on the fixture's layout."""
    rs, labels = origshape
    dec = _mk(rs, fast=False)
    assert dec.main_loop_entry == labels["top"]
    assert dec.master_volume_addr == VOL_NOM
    assert dec.autobuffer.base == BUF
    assert dec.autobuffer.length == 0x1E0
    assert dec.autobuffer.step == 1


def _drive(dec, script, n_frames, volumes=None):
    out = []
    for k in range(n_frames * 240):
        if volumes and k in volumes:
            dec.set_master_volume(volumes[k])
        if k in script:
            for b in script[k]:
                dec.write_data_port(b)
        out.append(dec.get_next_sample())
    return out


def test_orig94_fast_mode_lockstep_bit_exact(origshape):
    """Strict interpretation of the reference-shaped region == the ORIG94
    native handler, sample for sample, through port traffic and master
    volume changes."""
    rs, _ = origshape
    strict = _mk(rs, fast=False)
    fast = _mk(rs, fast=True)
    script = {0: [0x12, 0x34], 1200: [0x56], 2640: [0xAB, 0xCD, 0xEF]}
    volumes = {0: 0xB0, 1680: 0x40, 3120: 0xFF, 3840: 0x01}
    n = 20
    pcm_s = _drive(strict, script, n, volumes)
    pcm_f = _drive(fast, script, n, volumes)
    assert len(set(pcm_s)) > 16, "fixture produced degenerate PCM"
    diff = [i for i, (x, y) in enumerate(zip(pcm_s, pcm_f)) if x != y]
    assert not diff, (
        f"{len(diff)} mismatches, first at {diff[0]} (frame "
        f"{diff[0] // 240}): strict={pcm_s[diff[0]]} fast={pcm_f[diff[0]]}")


def test_orig94_fast_mode_bypasses_region(origshape):
    """Proof the ORIG94 accelerator actually fires on the fixture: corrupt
    the region with TRAPs; fast mode must still match strict."""
    rs, _ = origshape
    strict = _mk(rs, fast=False)
    fast = _mk(rs, fast=True)
    info = fast.speedup_info
    for adr in range(info.entry, info.exit):
        fast.cpu.pm[adr] = 0x010000
    n = 8
    pcm_s = _drive(strict, {0: [0x77]}, n)
    pcm_f = _drive(fast, {0: [0x77]}, n)
    assert pcm_s == pcm_f
